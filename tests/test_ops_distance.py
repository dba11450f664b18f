import numpy as np
import jax.numpy as jnp
from scipy.ndimage import distance_transform_edt as scipy_edt

from vistaf_tpu.ops import distance


def test_edt_matches_scipy(rng):
    mask = rng.random((64, 80)) > 0.3
    mask[0, :] = False  # ensure at least one seed
    ours = np.asarray(distance.distance_transform_edt(jnp.asarray(mask)))
    ref = scipy_edt(mask)
    # JFA is near-exact; allow tiny deviations on rare pixels
    err = np.abs(ours - ref)
    assert err.max() < 0.5, err.max()
    assert (err > 1e-3).mean() < 0.01


def test_edt_all_true_returns_large():
    mask = np.ones((16, 16), dtype=bool)
    out = np.asarray(distance.distance_transform_edt(jnp.asarray(mask)))
    assert np.all(out > 10)  # no seeds: effectively infinite distance


def test_edt_max_dist_exact_below_cap(rng):
    mask = rng.random((80, 96)) > 0.35
    mask[0, :] = False
    full = np.asarray(distance.distance_transform_edt(jnp.asarray(mask)))
    capped = np.asarray(distance.distance_transform_edt(jnp.asarray(mask), max_dist=8))
    sel = full <= 8.0
    err = np.abs(capped[sel] - full[sel])
    assert err.max() < 0.5
    # beyond the cap values may only be >= the cap region's truth
    assert (capped[~sel] >= 8.0 - 1e-3).all()


def test_erode_by_distance(rng):
    mask = np.zeros((40, 40), dtype=bool)
    mask[5:35, 5:35] = True
    out = np.asarray(distance.erode_by_distance(jnp.asarray(mask), 6))
    ref = scipy_edt(mask) > 6.0
    assert (out == (ref & mask)).mean() > 0.99


def test_chamfer3_matches_cv2_dist_l2_3x3(rng):
    import cv2
    import jax.numpy as jnp
    from vistaf_tpu.ops.distance import distance_transform_chamfer3
    mask = rng.random((80, 100)) > 0.12
    mask[0, 0] = False  # ensure a zero exists
    gold = cv2.distanceTransform(mask.astype(np.uint8), cv2.DIST_L2, 3)
    ours = np.asarray(distance_transform_chamfer3(jnp.asarray(mask)))
    np.testing.assert_allclose(ours, gold, atol=2e-3)
