import numpy as np
import cv2
import jax.numpy as jnp

from vistaf_tpu.ops import components


def _random_blobs(rng, shape=(64, 64), n=6, rmax=8):
    mask = np.zeros(shape, dtype=bool)
    for _ in range(n):
        cy, cx = rng.integers(0, shape[0]), rng.integers(0, shape[1])
        r = rng.integers(2, rmax)
        yy, xx = np.ogrid[:shape[0], :shape[1]]
        mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    return mask


def test_label_component_partition(rng):
    mask = _random_blobs(rng)
    ours = np.asarray(components.label(jnp.asarray(mask)))
    n_ref, ref = cv2.connectedComponents(mask.astype(np.uint8), connectivity=8)
    # same partition: map our root ids to cv2 labels bijectively
    assert (ours >= 0).sum() == (ref > 0).sum()
    for lab in np.unique(ours[ours >= 0]):
        sel = ours == lab
        assert len(np.unique(ref[sel])) == 1
    for lab in range(1, n_ref):
        sel = ref == lab
        assert len(np.unique(ours[sel])) == 1


def test_largest_component_matches_cv2(rng):
    for _ in range(3):
        mask = _random_blobs(rng)
        ours = np.asarray(components.largest_component(jnp.asarray(mask)))
        num, labels, stats, _ = cv2.connectedComponentsWithStats(mask.astype(np.uint8), connectivity=8)
        areas = stats[1:, cv2.CC_STAT_AREA]
        best = 1 + int(np.argmax(areas))
        ref = labels == best
        # ties in area may legitimately pick different components
        if sorted(areas)[-1] != (sorted(areas)[-2] if len(areas) > 1 else -1):
            np.testing.assert_array_equal(ours, ref)


def test_dominant_component_picks_big_blob():
    mask = np.zeros((48, 64), dtype=bool)
    mask[8:40, 8:40] = True     # dominant blob
    mask[4:7, 50:60] = True     # speck
    out = np.asarray(components.dominant_component(jnp.asarray(mask)))
    ref = np.asarray(components.largest_component(jnp.asarray(mask)))
    np.testing.assert_array_equal(out, ref)


def test_filter_components_by_peak(rng):
    mask = np.zeros((32, 48), dtype=bool)
    mask[4:10, 4:10] = True     # blob A
    mask[20:28, 30:40] = True   # blob B
    vals = np.zeros((32, 48), np.float32)
    vals[6, 6] = 0.5            # A peak 0.5
    vals[24, 34] = 2.0          # B peak 2.0
    keep = np.asarray(components.filter_components_by_peak(
        jnp.asarray(mask), jnp.asarray(vals), jnp.float32(1.0)))
    assert not keep[6, 6]
    assert keep[24, 34]
    assert keep[20:28, 30:40].all()
    assert not keep[4:10, 4:10].any()


def test_blob_candidate_eps_pins_razor_bridge_topology():
    """Regression pin for FTPConfig.contact_blob_cand_eps_mm (VERDICT r2 #9).

    The reference's literal candidate rule is strict depth > 0
    (shape_ftp.py:1234), which makes blob topology depend on um-deep bridge
    pixels: a 1-px bridge of float-dust depth connects a shallow lobe to a
    deep blob, so the lobe survives the peak filter.  With the candidate
    floor at the contact threshold (eps=1e-2 mm) the bridge is cut and the
    lobe is dropped.  Measured on TPU at 4K (r3): eps=0 reproduces the
    razor-bridge sensitivity on FINAL_F (+9.26% force vs the committed
    golden); eps=1e-2 lands at -0.02% -- which is why eps=1e-2 stays the
    default despite deviating from the literal rule."""
    import jax.numpy as jnp
    from vistaf_tpu.ops.components import filter_components_by_peak

    depth = np.zeros((32, 48), np.float32)
    depth[8:24, 4:16] = 1.0          # deep blob, peak 1.0 mm
    depth[15, 16:30] = 5e-3          # razor bridge, 5 um deep
    depth[8:24, 30:42] = 0.05        # shallow lobe, peak 0.05 mm
    thr = 0.1                        # contact_blob_min_peak_mm

    def run(eps):
        cand = jnp.asarray(depth > eps)
        kept = filter_components_by_peak(cand, jnp.asarray(depth), jnp.float32(thr))
        return np.asarray(kept)

    kept0 = run(0.0)       # literal reference rule: bridge connects -> lobe kept
    assert kept0[16, 36] and kept0[15, 20]
    kept_eps = run(1e-2)   # pinned topology: bridge cut -> lobe dropped
    assert kept_eps[16, 8] and not kept_eps[16, 36]


def test_dominant_component_seed_pool_matches_fullres():
    """The pooled-EDT seed picks the same component as the full-res seed on
    blob-shaped masks, and degenerate masks (no interior at pooled scale)
    fall back to the full-res seed path."""
    import numpy as np
    import jax.numpy as jnp
    from vistaf_tpu.ops.components import dominant_component

    h, w = 160, 200
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((yy - 80) ** 2 + (xx - 120) ** 2 < 45 ** 2)
    mask[5:15, 5:15] = True          # distractor blob
    m = jnp.asarray(mask)
    full = np.asarray(dominant_component(m))
    pooled = np.asarray(dominant_component(m, seed_pool=4))
    np.testing.assert_array_equal(full, pooled)

    # a 1-px-wide mask has no all-true 4x4 block: the fallback must still
    # return the dominant thin component, not an empty mask
    thin = np.zeros((64, 64), bool)
    thin[10, 4:60] = True            # long line (dominant)
    thin[40, 8:12] = True            # short line
    out = np.asarray(dominant_component(jnp.asarray(thin), seed_pool=4))
    assert out[10, 30] and not out[40, 9]

    # empty mask passes through
    empty = np.zeros((64, 64), bool)
    out_e = np.asarray(dominant_component(jnp.asarray(empty), seed_pool=4))
    assert not out_e.any()
