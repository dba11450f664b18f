// vistaf_native: host-side runtime for the acquisition path.
//
// The reference's only non-Python code is the LED-ring Arduino firmware
// (Code/Arduino LED code/WS2812/WS2812.ino); its host counterpart plus the
// frame-IO path live here as a small C library consumed via ctypes:
//
//   * threaded JPEG batch decoder (libjpeg) — feeds the calibration
//     trainers' 280-360-image sweeps without the Python GIL;
//   * V4L2 camera capture with the fixed manual controls from
//     camera_config.gpfl (exposure/white-balance/focus), MJPEG or YUYV;
//   * serial client for the WS2812 LED ring ("on"/"off" protocol,
//     9600 baud — WS2812.ino:12-44).
//
// Build: make -C native   (produces libvistaf_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <termios.h>
#include <unistd.h>
#include <sys/ioctl.h>
#include <sys/mman.h>
#include <linux/videodev2.h>

#include <jpeglib.h>
#include <setjmp.h>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG decoding
// ---------------------------------------------------------------------------

struct VistafJpegErr {
    jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

static void vistaf_jpeg_error_exit(j_common_ptr cinfo) {
    VistafJpegErr* err = reinterpret_cast<VistafJpegErr*>(cinfo->err);
    longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file into a caller-allocated BGR888 buffer of
// height*width*3 bytes.  Returns 0 on success, negative on error; the
// actual dimensions are written to *out_h / *out_w (must match the caller's
// expectation or the caller's buffer must be large enough: pass the
// capacity via buf_capacity).
int vistaf_decode_jpeg(const char* path, uint8_t* out, int64_t buf_capacity,
                       int32_t* out_h, int32_t* out_w) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;

    jpeg_decompress_struct cinfo;
    VistafJpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = vistaf_jpeg_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_EXT_BGR;
    jpeg_start_decompress(&cinfo);

    const int w = cinfo.output_width;
    const int h = cinfo.output_height;
    *out_h = h;
    *out_w = w;
    const int64_t need = (int64_t)h * w * 3;
    if (need > buf_capacity) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -3;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out + (int64_t)cinfo.output_scanline * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

// Decode n JPEG files concurrently with `threads` workers into a contiguous
// (n, h, w, 3) BGR buffer.  Files whose dimensions differ from (h, w) fail.
// Returns the number of successfully decoded images.
int vistaf_decode_jpeg_batch(const char** paths, int32_t n,
                             uint8_t* out, int32_t h, int32_t w,
                             int32_t threads, int32_t* status) {
    if (threads <= 0) threads = (int32_t)std::thread::hardware_concurrency();
    if (threads <= 0) threads = 4;
    std::atomic<int32_t> next(0);
    std::atomic<int32_t> ok(0);
    const int64_t stride = (int64_t)h * w * 3;

    auto worker = [&]() {
        for (;;) {
            int32_t i = next.fetch_add(1);
            if (i >= n) break;
            int32_t dh = 0, dw = 0;
            int rc = vistaf_decode_jpeg(paths[i], out + stride * i, stride, &dh, &dw);
            if (rc == 0 && dh == h && dw == w) {
                status[i] = 0;
                ok.fetch_add(1);
            } else {
                status[i] = rc != 0 ? rc : -4;
            }
        }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
    return ok.load();
}

// ---------------------------------------------------------------------------
// LED ring serial client (WS2812.ino counterpart)
// ---------------------------------------------------------------------------

int vistaf_led_open(const char* device) {
    int fd = open(device, O_RDWR | O_NOCTTY | O_NONBLOCK);
    if (fd < 0) return -1;
    termios tio;
    if (tcgetattr(fd, &tio) != 0) { close(fd); return -2; }
    cfmakeraw(&tio);
    cfsetispeed(&tio, B9600);   // WS2812.ino: Serial.begin(9600)
    cfsetospeed(&tio, B9600);
    tio.c_cflag |= CLOCAL | CREAD;
    if (tcsetattr(fd, TCSANOW, &tio) != 0) { close(fd); return -3; }
    return fd;
}

int vistaf_led_command(int fd, const char* cmd) {
    char buf[32];
    int len = snprintf(buf, sizeof(buf), "%s\n", cmd);
    if (len <= 0) return -1;
    ssize_t wr = write(fd, buf, (size_t)len);
    return wr == len ? 0 : -2;
}

int vistaf_led_close(int fd) { return close(fd); }

// ---------------------------------------------------------------------------
// V4L2 camera capture with fixed manual controls
// ---------------------------------------------------------------------------

struct VistafCam {
    int fd;
    uint32_t pixfmt;
    int32_t width, height;
    int n_bufs;
    void* bufs[8];
    size_t buf_len[8];
};

int vistaf_cam_open(const char* device, int32_t width, int32_t height,
                    uint32_t fourcc, VistafCam** out_cam) {
    int fd = open(device, O_RDWR);
    if (fd < 0) return -1;

    v4l2_format fmt;
    memset(&fmt, 0, sizeof(fmt));
    fmt.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    fmt.fmt.pix.width = width;
    fmt.fmt.pix.height = height;
    fmt.fmt.pix.pixelformat = fourcc;
    fmt.fmt.pix.field = V4L2_FIELD_NONE;
    if (ioctl(fd, VIDIOC_S_FMT, &fmt) < 0) { close(fd); return -2; }

    v4l2_requestbuffers req;
    memset(&req, 0, sizeof(req));
    req.count = 4;
    req.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    req.memory = V4L2_MEMORY_MMAP;
    if (ioctl(fd, VIDIOC_REQBUFS, &req) < 0) { close(fd); return -3; }

    VistafCam* cam = new VistafCam();
    cam->fd = fd;
    cam->pixfmt = fmt.fmt.pix.pixelformat;
    cam->width = fmt.fmt.pix.width;
    cam->height = fmt.fmt.pix.height;
    cam->n_bufs = (int)req.count;
    for (int i = 0; i < cam->n_bufs; ++i) {
        v4l2_buffer buf;
        memset(&buf, 0, sizeof(buf));
        buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
        buf.memory = V4L2_MEMORY_MMAP;
        buf.index = i;
        if (ioctl(fd, VIDIOC_QUERYBUF, &buf) < 0) { delete cam; close(fd); return -4; }
        cam->buf_len[i] = buf.length;
        cam->bufs[i] = mmap(nullptr, buf.length, PROT_READ | PROT_WRITE,
                            MAP_SHARED, fd, buf.m.offset);
        if (cam->bufs[i] == MAP_FAILED) { delete cam; close(fd); return -5; }
        ioctl(fd, VIDIOC_QBUF, &buf);
    }
    v4l2_buf_type type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    if (ioctl(fd, VIDIOC_STREAMON, &type) < 0) { delete cam; close(fd); return -6; }
    *out_cam = cam;
    return 0;
}

// Apply one V4L2 control (ids/values straight from camera_config.gpfl).
int vistaf_cam_set_control(VistafCam* cam, uint32_t id, int32_t value) {
    v4l2_control ctrl;
    ctrl.id = id;
    ctrl.value = value;
    return ioctl(cam->fd, VIDIOC_S_CTRL, &ctrl) < 0 ? -1 : 0;
}

// Grab one frame; for MJPG the raw JPEG bytes are copied to `out` (size to
// *out_len); for YUYV the raw packed bytes are copied.  Caller converts.
int vistaf_cam_grab(VistafCam* cam, uint8_t* out, int64_t capacity,
                    int64_t* out_len, uint32_t* out_fourcc) {
    v4l2_buffer buf;
    memset(&buf, 0, sizeof(buf));
    buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    buf.memory = V4L2_MEMORY_MMAP;
    if (ioctl(cam->fd, VIDIOC_DQBUF, &buf) < 0) return -1;
    int rc = 0;
    if ((int64_t)buf.bytesused <= capacity) {
        memcpy(out, cam->bufs[buf.index], buf.bytesused);
        *out_len = buf.bytesused;
        *out_fourcc = cam->pixfmt;
    } else {
        rc = -2;
    }
    ioctl(cam->fd, VIDIOC_QBUF, &buf);
    return rc;
}

int vistaf_cam_close(VistafCam* cam) {
    v4l2_buf_type type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    ioctl(cam->fd, VIDIOC_STREAMOFF, &type);
    for (int i = 0; i < cam->n_bufs; ++i)
        munmap(cam->bufs[i], cam->buf_len[i]);
    close(cam->fd);
    delete cam;
    return 0;
}

}  // extern "C"
