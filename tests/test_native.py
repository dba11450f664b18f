"""Native runtime library: JPEG decode parity, gpfl parsing."""
import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available
from vistaf_tpu.runner import native


@pytest.mark.skipif(not native.native_available(), reason="native lib unavailable")
@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_native_jpeg_decode_bit_identical_to_cv2():
    import cv2
    p = os.path.join(REFERENCE_ROOT, "Final_demos_images/FINAL_reference.jpg")
    ours = native.decode_jpeg(p)
    ref = cv2.imread(p, cv2.IMREAD_COLOR)
    assert ours is not None
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.skipif(not native.native_available(), reason="native lib unavailable")
@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_native_batch_decode():
    paths = [os.path.join(REFERENCE_ROOT, f"Force/Height_to_force/Loading/sphere-{i}.jpg")
             for i in range(1, 4)]
    stack, status = native.decode_jpeg_batch(paths, 2160, 3840)
    assert (status == 0).all()
    assert stack.shape == (3, 2160, 3840, 3)
    import cv2
    ref = cv2.imread(paths[0], cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(stack[0], ref)


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_parse_gpfl_reference_controls():
    ctrl = native.parse_gpfl(os.path.join(REFERENCE_ROOT, "camera_config.gpfl"))
    d = dict(ctrl)
    assert d[0x009a0902] == 6068      # Exposure Time, Absolute
    assert d[0x0098091a] == 6297      # White Balance Temperature
    assert d[0x009a090c] == 0         # Focus, Automatic Continuous: off
    assert len(ctrl) == 14


def test_iter_images_bgr_matches_cv2(tmp_path):
    """The pipelined decode iterator must yield bit-identical frames to
    cv2.imread in order, on both the native and the fallback path."""
    import cv2
    import numpy as np
    from vistaf_tpu.runner.io import imread_bgr, iter_images_bgr

    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / f"f{i}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 92])
        paths.append(p)
    got = list(iter_images_bgr(paths, chunk=2))
    assert [p for p, _ in got] == paths
    for p, img in got:
        np.testing.assert_array_equal(img, imread_bgr(p))
