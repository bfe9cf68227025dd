"""Native permutohedral lattice: build + accuracy vs brute-force Gaussian
filtering, and the exact dense CRF."""
import numpy as np
import pytest

from awesome_tpu.ops import permutohedral as ph

pytestmark = pytest.mark.skipif(
    not ph.available(), reason="native lib not buildable"
)


def brute_force_filter(features, values):
    d2 = ((features[:, None, :] - features[None, :, :]) ** 2).sum(-1)
    k = np.exp(-d2 / 2.0)
    return k @ values


def test_ph_filter_close_to_brute_force(rng):
    n = 200
    features = rng.uniform(0, 4, size=(n, 3)).astype(np.float32)
    values = rng.uniform(size=(n, 2)).astype(np.float32)
    exact = brute_force_filter(features, values)
    approx = ph.ph_filter(features, values)
    # permutohedral is an approximation with an arbitrary global gain (the
    # CRF use is scale-invariant via symmetric normalization); check strong
    # proportionality: high correlation + consistent per-point gain
    for c in range(2):
        r = np.corrcoef(exact[:, c], approx[:, c])[0, 1]
        assert r > 0.99, r
    gain = approx / np.maximum(exact, 1e-6)
    rel_spread = gain.std() / gain.mean()
    assert rel_spread < 0.2, rel_spread


def test_ph_filter_constant_preserved(rng):
    """Filtering a constant must stay (approximately) proportional to the
    kernel density — ones in, ones-density out, no NaNs."""
    n = 100
    features = rng.uniform(0, 3, size=(n, 5)).astype(np.float32)
    ones = np.ones((n, 1), np.float32)
    out = ph.ph_filter(features, ones)
    assert np.isfinite(out).all()
    assert (out > 0).all()


def test_exact_dense_crf_denoises(rng):
    h = w = 40
    img = np.zeros((h, w, 3), np.float32) + 0.1
    obj = np.zeros((h, w), bool)
    obj[10:30, 10:30] = True
    img[obj] = 0.9
    probs2 = np.where(obj, 0.9, 0.1).astype(np.float32)
    noise = rng.random(obj.shape) < 0.1
    probs2 = np.where(noise, 1.0 - probs2, probs2)
    probs = np.stack([probs2, 1 - probs2], axis=-1)
    out = ph.dense_crf_exact(
        img, probs, gaussian_sdims=(3, 3), bilateral_sdims=(10, 10),
        iterations=5,
    )
    refined = out[..., 0] > 0.5
    base_err = ((probs2 > 0.5) != obj).mean()
    err = (refined != obj).mean()
    assert err < base_err
    assert err < 0.02


def test_xla_crf_agrees_with_native(rng):
    """The on-device bilateral-grid CRF should agree with the exact native
    mean field on a clean scene (same labels after refinement)."""
    from awesome_tpu.ops.crf import CRFOptions, dense_crf

    h = w = 40
    img = np.zeros((h, w, 3), np.float32) + 0.1
    obj = np.zeros((h, w), bool)
    obj[10:30, 10:30] = True
    img[obj] = 0.9
    probs2 = np.where(obj, 0.8, 0.2).astype(np.float32)
    noise = rng.random(obj.shape) < 0.08
    probs2 = np.where(noise, 1.0 - probs2, probs2)

    native = ph.dense_crf_exact(
        img, np.stack([probs2, 1 - probs2], -1),
        gaussian_sdims=(3, 3), bilateral_sdims=(10, 10), iterations=5,
    )[..., 0]
    xla = dense_crf(
        img, probs2[..., None],
        options=CRFOptions(max_iterations=5, gaussian_sdims=(3, 3),
                           bilateral_sdims=(10, 10)),
    )[..., 0]
    agree = ((native > 0.5) == (xla > 0.5)).mean()
    assert agree > 0.97, agree
