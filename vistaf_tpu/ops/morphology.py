"""Binary/grayscale morphology as windowed max/min reductions.

Footprints (OpenCV-style ellipse/rect structuring elements) are static
constants; dilation decomposes into one horizontal max-pool per footprint row
plus a vertical shift-max — O(k) reduce_windows instead of O(k^2) shifts,
all fully vectorized on the VPU.

Reference usages: ``shape_ftp.py:641-647`` (bad-pixel dilate),
``shape_ftp.py:755-761`` (reliable close), ``shape_ftp.py:1734-1736``
(contact dilate), ``temperature_sensor.py:378-405`` (saturation/stripe masks).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np  # noqa: F401  (kernel constructors)

_NEG = -3.0e38
_POS = 3.0e38


def ellipse_kernel(kh: int, kw: int) -> np.ndarray:
    """OpenCV cv2.getStructuringElement(MORPH_ELLIPSE, (kw, kh)) footprint.

    Reimplements OpenCV's discrete inscribed-ellipse rule so the footprint is
    bit-identical without calling into cv2.
    """
    r = kh // 2
    c = kw // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    el = np.zeros((kh, kw), dtype=bool)
    for i in range(kh):
        j1, j2 = 0, 0
        dy = i - r
        if abs(dy) <= r:
            if r == 0:
                dx = c
            else:
                dx = int(round(c * np.sqrt(max(0.0, (r * r - dy * dy) * inv_r2))))
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, kw)
            el[i, j1:j2] = True
    return el


def rect_kernel(kh: int, kw: int) -> np.ndarray:
    return np.ones((kh, kw), dtype=bool)


def _row_segments(footprint: np.ndarray) -> Tuple[Tuple[int, int, int], ...]:
    """Decompose a footprint into (dy, c0, c1) horizontal segments relative to
    the anchor (center).  Requires each row to be a single contiguous run
    (true for ellipse and rect kernels)."""
    kh, kw = footprint.shape
    ay, ax = kh // 2, kw // 2
    segs = []
    for i in range(kh):
        cols = np.where(footprint[i])[0]
        if cols.size == 0:
            continue
        c0, c1 = int(cols.min()), int(cols.max())
        if not footprint[i, c0:c1 + 1].all():
            raise ValueError("footprint rows must be contiguous runs")
        segs.append((i - ay, c0 - ax, c1 - ax))
    return tuple(segs)


def _hshift(x: jnp.ndarray, d: int, fill: float) -> jnp.ndarray:
    """out[i, j] = x[i, j + d] (d may be negative), vacated slots = fill."""
    if d == 0:
        return x
    w = x.shape[1]
    if d > 0:
        return jnp.concatenate(
            [x[:, d:], jnp.full(x.shape[:1] + (d,), fill, x.dtype)], axis=1)
    return jnp.concatenate(
        [jnp.full(x.shape[:1] + (-d,), fill, x.dtype), x[:, :d]], axis=1)


def _hmax(x: jnp.ndarray, c0: int, c1: int, init: float) -> jnp.ndarray:
    """out[i, j] = reduce over x[i, j+c0 .. j+c1].

    Evaluated as a doubling shift-max ladder (the Kogge-Stone idiom the
    boolean sweeps already use): a width-W window costs ceil(log2 W) + 1
    shift+select passes instead of reduce_window's W compares per output.
    max/min are associative and idempotent, so overlapping the doubled
    spans is EXACT — bit-same as reduce_window for bool and float alike
    (measured 2.2 -> sub-ms on the 31-wide segmentation kernels at the 4K
    crop scale, docs/PERF.md r05)."""
    red = jnp.maximum if init == _NEG else jnp.minimum
    W = c1 - c0 + 1
    h, w = x.shape
    # pad to w + W - 1 like reduce_window's init padding, so border windows
    # clip exactly; the ladder then never reads past the padded edges
    lp, rp = max(0, -c0), max(0, c1)
    parts = []
    if lp:
        parts.append(jnp.full((h, lp), init, x.dtype))
    parts.append(x)
    if rp:
        parts.append(jnp.full((h, rp), init, x.dtype))
    out = jnp.concatenate(parts, axis=1) if len(parts) > 1 else x
    span = 1                   # out[m] covers padded[m .. m+span-1]
    while 2 * span <= W:
        out = red(out, _hshift(out, span, init))
        span *= 2
    if span < W:
        out = red(out, _hshift(out, W - span, init))
    s = c0 + lp
    return out[:, s:s + w]


def _vshift(x: jnp.ndarray, dy: int, fill: float) -> jnp.ndarray:
    """Shift rows so out[i] = x[i + dy], padding with fill."""
    h = x.shape[0]
    if dy == 0:
        return x
    if dy > 0:
        return jnp.concatenate([x[dy:], jnp.full((dy,) + x.shape[1:], fill, x.dtype)], axis=0)
    return jnp.concatenate([jnp.full((-dy,) + x.shape[1:], fill, x.dtype), x[:dy]], axis=0)


def _morph(x: jnp.ndarray, footprint: np.ndarray, is_dilate: bool) -> jnp.ndarray:
    init = _NEG if is_dilate else _POS
    red = jnp.maximum if is_dilate else jnp.minimum
    xf = x.astype(jnp.float32)
    segs = _row_segments(footprint)
    out = jnp.full_like(xf, init)
    for dy, c0, c1 in segs:
        h = _hmax(xf, c0, c1, init)
        out = red(out, _vshift(h, dy, init))
    return out


def dilate(mask: jnp.ndarray, footprint: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    """cv2.dilate on a boolean mask (default border: ignores outside)."""
    x = mask.astype(jnp.float32)
    for _ in range(iterations):
        x = _morph(x, footprint, True)
    return x > 0.5


def erode(mask: jnp.ndarray, footprint: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    x = mask.astype(jnp.float32)
    for _ in range(iterations):
        x = _morph(x, footprint, False)
    return x > 0.5


def close(mask: jnp.ndarray, footprint: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    """cv2.morphologyEx(MORPH_CLOSE): iterations means (dilate^n then erode^n)."""
    m = dilate(mask, footprint, iterations)
    return erode(m, footprint, iterations)

def open_(mask: jnp.ndarray, footprint: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    m = erode(mask, footprint, iterations)
    return dilate(m, footprint, iterations)


def gray_dilate(x: jnp.ndarray, footprint: np.ndarray) -> jnp.ndarray:
    return _morph(x, footprint, True)


def gray_erode(x: jnp.ndarray, footprint: np.ndarray) -> jnp.ndarray:
    return _morph(x, footprint, False)


def _shift_fill(x: jnp.ndarray, k: int, axis: int, fill: bool) -> jnp.ndarray:
    """Bring element ``i-k`` to position ``i`` along ``axis`` (k may be
    negative), filling vacated slots with ``fill`` — one aligned pad+slice,
    the shift primitive TPUs like (same pattern as the Paeth shear passes)."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    sl = [slice(None)] * x.ndim
    if k >= 0:
        pad[axis] = (k, 0)
        sl[axis] = slice(0, n)
    else:
        pad[axis] = (0, -k)
        sl[axis] = slice(-k, -k + n)
    return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]


def _sweep(s: jnp.ndarray, m: jnp.ndarray, axis: int,
           reverse: bool) -> jnp.ndarray:
    """Propagate seed ``s`` along ``axis`` through True-runs of ``m`` in one
    log-depth pass.  Per-pixel transition is ``x -> (x & m) | s``; that
    function class is closed under composition with representation
    ``(a, b): x -> (x & a) | b`` and associative combine
    ``(a1,b1) then (a2,b2) = (a1 & a2, (b1 & a2) | b2)`` — a first-order
    boolean recurrence, evaluated here as a Kogge-Stone doubling ladder of
    aligned whole-array shifts (monoid identity ``(True, False)`` as fill).

    Why not ``lax.associative_scan``: same math, but its odd/even
    decimation lowers to strided slice/concat trees that XLA:TPU schedules
    pathologically when two scans chain across axes — measured 2.3 ms per
    axis switch at 1182^2 (deps in docs/PERF.md), vs 0.31 ms for the whole
    four-sweep chain in this formulation (27x on full reconstruct)."""
    n = s.shape[axis]
    A, B = m, s
    k = 1
    while k < n:
        kk = -k if reverse else k
        As = _shift_fill(A, kk, axis, True)
        Bs = _shift_fill(B, kk, axis, False)
        B = (Bs & A) | B
        A = As & A
        k *= 2
    return B


_SWEEP_MIN_PX = 1_000_000  # route choice only; both bodies share the fixed point


def reconstruct(seed: jnp.ndarray, mask: jnp.ndarray,
                max_iters: int = 4096) -> jnp.ndarray:
    """Morphological reconstruction by dilation: grow ``seed`` inside
    ``mask`` (8-connectivity) to a fixed point — i.e., select exactly the
    connected components of ``mask`` that contain a seed pixel.

    Each round does four log-depth associative-scan sweeps (seed runs fill
    whole rows/columns at once — the bulk transport) plus one true 3x3
    dilation (crosses 8-connectivity corner-only links the axis sweeps
    cannot see), then checks the fixed point.  The sweeps only ever add
    pixels reachable inside ``mask``, and any state stable under
    dilate-and-mask that contains the seed IS the full component, so the
    fixed point — and hence the output — is exactly the naive per-pixel
    dilation's.  Convex-ish blobs converge in ~2 rounds instead of
    O(geodesic radius): at the native-4K reliable-mask scale (~870 px
    blob radius) this is the difference between ~5 and ~110 sequential
    rounds.  Replaces per-component labeling for "keep blobs containing X"
    queries like the contact-blob peak filter (``shape_ftp.py:1215-1271``).
    """
    fp = np.ones((3, 3), dtype=bool)
    s = (seed & mask)
    # Below ~1 Mpx the graph is launch-bound and geodesic radii are small
    # (contact blobs), so the cheap 9-op dilation round beats the sweep
    # round; above it (native-4K reliable mask, ~870 px radius) the sweeps
    # win — 0.60 ms full reconstruct at 1182^2 with the Kogge-Stone sweep
    # (round 4; was 16.2 ms under associative_scan, 107 ms pure dilation).
    # Same fixed point either way.
    use_sweeps = mask.shape[0] * mask.shape[1] >= _SWEEP_MIN_PX

    def body(state):
        s, _ = state
        if use_sweeps:
            t = _sweep(s, mask, axis=1, reverse=False)
            t = _sweep(t, mask, axis=1, reverse=True)
            t = _sweep(t, mask, axis=0, reverse=False)
            t = _sweep(t, mask, axis=0, reverse=True)
            t = dilate(t, fp) & mask
        else:
            t = s
            for _ in range(8):  # 8 dilation steps per convergence check
                t = dilate(t, fp) & mask
        return t, jnp.any(t != s)

    def cond(state):
        return state[1]

    out, _ = jax.lax.while_loop(cond, body, (s, jnp.bool_(True)))
    return out


def dilate_disk_px(mask: jnp.ndarray, px: int) -> jnp.ndarray:
    """Reference's ``dilate_mask`` helper: ellipse kernel of size 2*px+1
    (``shape_ftp.py:729-736``)."""
    if px is None or px <= 0:
        return mask
    ksz = int(max(3, 2 * int(px) + 1))
    return dilate(mask, ellipse_kernel(ksz, ksz))
