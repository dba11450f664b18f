"""Honest per-op device timing on tunneled TPU platforms.

block_until_ready on the axon platform can return before compute finishes;
the only trustworthy clock is a host fetch of real output bytes.  Each op is
enqueued N times (in-order device queue) and the final output is fetched;
(total - fetch_rtt) / N isolates per-execution device time.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np

def honest(name, jf, *args, n=100):
    # fetching an eagerly-computed value can hit backend UNIMPLEMENTED on
    # axon; reduce to a scalar INSIDE the jitted program and fetch that.
    def scalarized(*a):
        out = jf(*a)
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(out)
    js = jax.jit(scalarized)
    _ = float(js(*args))  # compile+warm
    t0 = time.perf_counter()
    out = None
    for _i in range(n):
        out = js(*args)
    s = float(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:32s} {dt:8.3f} ms/exec", flush=True)
    return dt

if __name__ == "__main__":
    # numpy inputs only: eagerly-computed device arrays can poison fetches
    # (UNIMPLEMENTED) on the axon platform; jit transfers np args itself.
    rng = np.random.default_rng(0)
    img = rng.random((236,236)).astype(np.float32)*255
    img2 = rng.random((236,236)).astype(np.float32)*255
    mask = rng.random((236,236))>0.3
    phase = (rng.random((236,236)).astype(np.float32)-0.5)*2
    c428 = (rng.random((428,428))+1j*rng.random((428,428))).astype(np.complex64)

    from vistaf_tpu.ops.percentile import masked_percentile_hist, masked_median
    from vistaf_tpu.ops.inpaint import inpaint_diffusion
    from vistaf_tpu.ops.filters import gaussian_blur, gradient_magnitude, masked_gaussian_smooth
    from vistaf_tpu.ops.morphology import dilate, ellipse_kernel, reconstruct, close as mclose
    from vistaf_tpu.ops.polyfit import robust_polyfit2d
    from vistaf_tpu.ops import fftops
    from vistaf_tpu.ops.distance import distance_transform_edt
    from vistaf_tpu.ops.unwrap import unwrap_wls
    from vistaf_tpu.ops.registration import ecc_align

    honest("noop", jax.jit(lambda x: x+1.0), img)
    honest("pctl_hist x1", jax.jit(lambda z,m: masked_percentile_hist(z,m,25.0)), img, mask)
    honest("pctl_hist x3 (separate)", jax.jit(lambda z,m: masked_percentile_hist(z,m,25.0)+masked_percentile_hist(z,m,95.0)+masked_percentile_hist(z,m,98.0)), img, mask)
    honest("masked_median sort", jax.jit(lambda z,m: masked_median(z,m)), img, mask)
    honest("inpaint 64", jax.jit(lambda z,m: inpaint_diffusion(z,m,iters=64)), img, mask)
    honest("inpaint 16", jax.jit(lambda z,m: inpaint_diffusion(z,m,iters=16)), img, mask)
    honest("blur s45", jax.jit(lambda z: gaussian_blur(z,45.0)), img)
    honest("blur s1.5", jax.jit(lambda z: gaussian_blur(z,1.5)), img)
    honest("blur s6", jax.jit(lambda z: gaussian_blur(z,6.0)), img)
    honest("gradmag", jax.jit(gradient_magnitude), img)
    honest("dilate e5", jax.jit(lambda m: dilate(m, ellipse_kernel(5,5)).astype(jnp.float32)), mask)
    honest("fft2 428 c64", jax.jit(lambda c: jnp.abs(jnp.fft.fft2(c))), c428)
    honest("fft2 432 c64", jax.jit(lambda c: jnp.abs(jnp.fft.fft2(c,(432,432)))), c428)
    honest("fft2 512 c64", jax.jit(lambda c: jnp.abs(jnp.fft.fft2(c,(512,512)))), c428)
    honest("topk12 428^2", jax.jit(lambda c: jax.lax.top_k(jnp.abs(c).ravel(), 12)[0]), c428)
    honest("polyfit o2 hist", jax.jit(lambda z,m: robust_polyfit2d(z,m,order=2,percentile_method='hist')[1]), phase, mask)
    honest("polyfit o1 hist", jax.jit(lambda z,m: robust_polyfit2d(z,m,order=1,percentile_method='hist')[1]), phase, mask)
    honest("unwrap cg30", jax.jit(lambda w,m: unwrap_wls(w,m,cg_iters=30)), phase, mask)
    honest("unwrap cg12", jax.jit(lambda w,m: unwrap_wls(w,m,cg_iters=12)), phase, mask)
    honest("edt", jax.jit(lambda m: distance_transform_edt(m)), mask)
    honest("edt md26", jax.jit(lambda m: distance_transform_edt(m, max_dist=26)), mask)
    seed = mask & (img > 240)
    honest("reconstruct", jax.jit(lambda s,m: reconstruct(s,m).astype(jnp.float32)), seed, mask)
    honest("masked_smooth s2.5", jax.jit(lambda z,m: masked_gaussian_smooth(z,m,2.5)), phase, mask)
    honest("ecc 300it str2", jax.jit(lambda t,i,m: ecc_align(t,i,m,max_iters=300,stride=2)[0]), img/255., img2/255., mask)
    honest("morph close k7", jax.jit(lambda m: mclose(m, ellipse_kernel(7,7)).astype(jnp.float32)), mask)
