"""Spectral-matting SSS proxy: matting Laplacian + eigenvector features.

The reference's feature front-end is the TF1 Soft-Semantic-Segmentation
net (`awesome/run/semantic_soft_segmentation_extractor.py:1-261`) whose
embedmaps feed a matting-Laplacian spectral pipeline (Aksoy et al. 2018).
Without TF1 the extractor falls back to the Laplacian alone
(`awesome_tpu/runner/sss_extractor.py`); these tests pin its math and the
segmentation quality of the resulting features.
"""
import numpy as np
import pytest


def _two_region_image(h=96, w=128, noise=0.03, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    img[...] = [0.2, 0.3, 0.8]
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - h // 2) ** 2 / 900 + (xx - w // 2) ** 2 / 1600) < 1.0
    img[blob] = [0.8, 0.5, 0.1]
    img += rng.normal(0, noise, img.shape).astype(np.float32)
    return np.clip(img, 0, 1), blob


def test_matting_laplacian_properties():
    from awesome_tpu.runner.sss_extractor import matting_laplacian

    img, _ = _two_region_image(24, 24)
    L = matting_laplacian(img.astype(np.float64))
    n = L.shape[0]
    assert L.shape == (24 * 24, 24 * 24)
    # constants span the nullspace: L @ 1 = 0
    assert np.abs(L @ np.ones(n)).max() < 1e-10
    # symmetric
    assert abs(L - L.T).max() < 1e-12
    # PSD: Rayleigh quotients of random vectors are non-negative
    rng = np.random.default_rng(1)
    for _ in range(5):
        v = rng.normal(size=n)
        assert v @ (L @ v) >= -1e-9


def test_spectral_features_segment_and_determinism():
    from awesome_tpu.runner.sss_extractor import spectral_soft_segments

    img, blob = _two_region_image()
    f = spectral_soft_segments(img, 2)
    assert f.shape == (96, 128, 2) and f.dtype == np.float32
    assert float(f.min()) >= 0.0 and float(f.max()) <= 1.0
    # deterministic across calls (fixed Lanczos start vector)
    assert np.array_equal(f, spectral_soft_segments(img, 2))
    # the leading soft segment is piecewise-constant per region and
    # thresholds to the true region
    gaps = [
        abs(f[..., c][blob].mean() - f[..., c][~blob].mean())
        for c in range(2)
    ]
    c = int(np.argmax(gaps))
    assert gaps[c] > 0.5
    m = f[..., c] > 0.5
    if m[blob].mean() < 0.5:
        m = ~m
    iou = (m & blob).sum() / (m | blob).sum()
    assert iou > 0.95, iou
    # within-region smoothness: stds far below the cross-region gap
    assert f[..., c][blob].std() < 0.1
    assert f[..., c][~blob].std() < 0.1


def test_spectral_downscale_path_shapes():
    from awesome_tpu.runner.sss_extractor import spectral_soft_segments

    img, blob = _two_region_image(180, 250)  # > max_side: eig on downscale
    f = spectral_soft_segments(img, 2, max_side=96)
    assert f.shape == (180, 250, 2)
    gaps = [
        abs(f[..., c][blob].mean() - f[..., c][~blob].mean())
        for c in range(2)
    ]
    assert max(gaps) > 0.5


def test_extractor_prefers_spectral_and_falls_back(tmp_path):
    from awesome_tpu.runner.sss_extractor import (
        SemanticSoftSegmentationExtractor,
        spectral_soft_segments,
    )

    img, _ = _two_region_image(48, 64)
    ex = SemanticSoftSegmentationExtractor(str(tmp_path))
    f = ex.extract(img, "a")
    np.testing.assert_array_equal(f, spectral_soft_segments(img, 2))
    # pyramid proxy still reachable
    ex2 = SemanticSoftSegmentationExtractor(str(tmp_path), proxy="pyramid")
    f2 = ex2.extract(img, "a")
    assert f2.shape == (48, 64, 2)
    assert not np.array_equal(f, f2)
    # precomputed embedmaps keep priority over any proxy
    emb = np.concatenate([img, img], axis=-1)
    np.save(tmp_path / "b.npy", emb)
    from awesome_tpu.data.image_sample import semantic_features

    np.testing.assert_allclose(
        ex.extract(img, "b"), semantic_features(emb, 2), atol=1e-5
    )


def test_runner_feat_encoding_uses_spectral():
    """The 'feat' xytype fallback (no feature_dir) routes through the
    spectral proxy and caches per image index
    (`runner/runner.py:_encoding_map`)."""
    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.runner import AwesomeRunner

    cfg = AwesomeConfig(
        dataset_args={"xytype": "feat", "n": 2, "h": 24, "w": 32},
        num_epochs=1,
    )
    runner = AwesomeRunner(cfg)
    runner.build_dataset()
    s = runner.samples[0]
    enc = runner._encoding_map(s)
    assert enc.shape == (24, 32, 2), enc.shape
    from awesome_tpu.runner.sss_extractor import spectral_soft_segments

    np.testing.assert_array_equal(enc, spectral_soft_segments(s.image))
    # cached: second call returns the identical object
    assert runner._encoding_map(s) is runner._feat_cache[s.index]


def test_runner_sss_proxy_knob_selects_device_path():
    """`dataset_args['sss_proxy'] = 'spectral_device'` routes the 'feat'
    encoding through the accelerator eigensolve; from_config picks the
    same knob up for the extractor."""
    from awesome_tpu.ops.spectral import spectral_soft_segments_device
    from awesome_tpu.runner.config import AwesomeConfig
    from awesome_tpu.runner.runner import AwesomeRunner
    from awesome_tpu.runner.sss_extractor import (
        SemanticSoftSegmentationExtractor,
    )

    cfg = AwesomeConfig(
        dataset_args={"xytype": "feat", "n": 1, "h": 24, "w": 32,
                      "sss_proxy": "spectral_device"},
        num_epochs=1,
    )
    runner = AwesomeRunner(cfg)
    runner.build_dataset()
    s = runner.samples[0]
    enc = runner._encoding_map(s)
    np.testing.assert_array_equal(
        enc, spectral_soft_segments_device(s.image, 2))
    ex = SemanticSoftSegmentationExtractor.from_config(cfg, "/nonexistent")
    assert ex.proxy == "spectral_device"


def test_device_stencil_matches_scipy_laplacian():
    """The TPU-native stencil operator (`ops/spectral.py`) is the same
    matting Laplacian: L @ x parity against the scipy CSR build."""
    import jax.numpy as jnp

    from awesome_tpu.ops.spectral import matting_stencil, stencil_matvec
    from awesome_tpu.runner.sss_extractor import matting_laplacian

    img, _ = _two_region_image(20, 27)
    L = matting_laplacian(img.astype(np.float64), eps=1e-4)
    st = matting_stencil(jnp.asarray(img, jnp.float32), eps=1e-4)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(20, 27, 2)).astype(np.float32)
    y_ref = (L @ x.reshape(-1, 2)).reshape(20, 27, 2)
    y = np.asarray(stencil_matvec(st, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=5e-4)
    # rows sum to zero (constant nullspace) and the operator is
    # symmetric: stencil[i, d] == stencil[i+d, -d]
    stn = np.asarray(st)
    assert np.abs(stn.sum(axis=(2, 3))).max() < 1e-3
    assert abs(stn[5, 6, 3, 4] - stn[6, 8, 1, 0]) < 1e-5


def test_device_spectral_segments_quality_and_determinism():
    """Device LOBPCG path: same quality gates as the host spectral
    proxy (piecewise-constant per region, thresholds to the true
    region, deterministic)."""
    from awesome_tpu.ops.spectral import spectral_soft_segments_device

    img, blob = _two_region_image()
    f = spectral_soft_segments_device(img, 2)
    assert f.shape == (96, 128, 2) and f.dtype == np.float32
    assert np.array_equal(f, spectral_soft_segments_device(img, 2))
    gaps = [
        abs(f[..., c][blob].mean() - f[..., c][~blob].mean())
        for c in range(2)
    ]
    c = int(np.argmax(gaps))
    assert gaps[c] > 0.5
    m = f[..., c] > 0.5
    if m[blob].mean() < 0.5:
        m = ~m
    iou = (m & blob).sum() / (m | blob).sum()
    assert iou > 0.95, iou
    assert f[..., c][blob].std() < 0.1
    assert f[..., c][~blob].std() < 0.1


def test_extractor_spectral_device_proxy():
    from awesome_tpu.ops.spectral import spectral_soft_segments_device
    from awesome_tpu.runner.sss_extractor import (
        SemanticSoftSegmentationExtractor,
    )

    img, _ = _two_region_image(48, 64)
    ex = SemanticSoftSegmentationExtractor("/nonexistent",
                                           proxy="spectral_device")
    np.testing.assert_array_equal(
        ex.extract(img, "a"), spectral_soft_segments_device(img, 2))


def test_device_eigensolve_rejects_tiny_images():
    """Images below LOBPCG's search_dim*5 < n precondition fail with the
    actual constraint spelled out (the extractor then degrades to the
    host path)."""
    import numpy as np
    import pytest

    from awesome_tpu.ops.spectral import spectral_soft_segments_device

    with pytest.raises(ValueError, match="too small"):
        spectral_soft_segments_device(
            np.random.default_rng(0).random((5, 5, 3)).astype(np.float32))


def _texture_ambiguous_image(h=72, w=96, seed=0):
    """Two regions with the SAME mean color, separated only by texture —
    the case the color-only matting Laplacian cannot resolve and the
    semantic fusion exists for (Aksoy et al. 2018 §3)."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 0.5, np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - h // 2) ** 2 / 500 + (xx - w // 2) ** 2 / 1100) < 1.0
    # fg: high-frequency checkerboard around the same mean
    checker = (((yy // 2) + (xx // 2)) % 2).astype(np.float32) - 0.5
    img[..., :] += (checker * 0.35 * blob)[..., None]
    img += rng.normal(0, 0.015, img.shape).astype(np.float32)
    return np.clip(img, 0, 1), blob


def _best_iou(f, blob):
    best = 0.0
    for c in range(f.shape[-1]):
        m = f[..., c] > 0.5
        if m[blob].mean() < 0.5:
            m = ~m
        denom = (m | blob).sum()
        if denom:
            best = max(best, (m & blob).sum() / denom)
    return best


def test_semantic_affinity_laplacian_properties():
    from awesome_tpu.runner.sss_extractor import (
        semantic_affinity_laplacian,
        semantic_descriptor,
    )

    img, _ = _texture_ambiguous_image(24, 24)
    feats = semantic_descriptor(img)
    assert feats.shape[:2] == (24, 24)
    L = semantic_affinity_laplacian(feats)
    n = L.shape[0]
    assert L.shape == (24 * 24, 24 * 24)
    # graph Laplacian: nullspace contains constants, symmetric, PSD
    assert np.abs(L @ np.ones(n)).max() < 1e-10
    assert abs(L - L.T).max() < 1e-12
    rng = np.random.default_rng(1)
    for _ in range(5):
        v = rng.normal(size=n)
        assert v @ (L @ v) >= -1e-9


def test_sss_fusion_zero_weight_is_pure_spectral():
    from awesome_tpu.runner.sss_extractor import spectral_soft_segments

    img, _ = _two_region_image(48, 64)
    a = spectral_soft_segments(img, 2)
    b = spectral_soft_segments(img, 2, semantic_weight=0.0)
    assert np.array_equal(a, b)


def test_sss_fusion_resolves_texture_ambiguity():
    """A/B: on a color-ambiguous, texture-separated scene the FUSED
    operator recovers the region; the matting-only eigenvectors cannot
    (this is exactly the failure mode the reference's TF1 semantic
    affinity exists to fix)."""
    from awesome_tpu.runner.sss_extractor import spectral_soft_segments

    img, blob = _texture_ambiguous_image()
    fused = spectral_soft_segments(img, 2, semantic_weight=10.0)
    assert fused.shape == (72, 96, 2) and fused.dtype == np.float32
    # deterministic
    assert np.array_equal(
        fused, spectral_soft_segments(img, 2, semantic_weight=10.0)
    )
    iou_fused = _best_iou(fused, blob)
    pure = spectral_soft_segments(img, 2)
    iou_pure = _best_iou(pure, blob)
    assert iou_fused > 0.85, (iou_fused, iou_pure)
    assert iou_fused > iou_pure + 0.1, (iou_fused, iou_pure)


def test_sss_fused_channels_not_redundant():
    """The candidate pool (pure + fused operators) contains the SAME
    strongest bipartition twice on a scene color alone already solves;
    the greedy redundancy filter must keep the two output channels
    distinct cuts instead of one cut duplicated (which would silently
    drop a distinct region's eigenvector — _best_iou can't see that)."""
    from awesome_tpu.runner.sss_extractor import spectral_soft_segments

    img, _ = _two_region_image(48, 64)
    fused = spectral_soft_segments(img, 2, semantic_weight=10.0)
    a, b = fused[..., 0].ravel(), fused[..., 1].ravel()
    corr = abs(float(np.corrcoef(a, b)[0, 1]))
    assert corr < 0.95, f"fused channels are near-duplicates (|corr|={corr:.3f})"
    # and the selection still recovers the region
    pure = spectral_soft_segments(img, 2)
    img2, blob = _two_region_image(48, 64)
    assert _best_iou(fused, blob) >= _best_iou(pure, blob) - 0.05


def test_sss_fused_proxy_and_custom_feature_fn():
    from awesome_tpu.runner.sss_extractor import (
        SemanticSoftSegmentationExtractor,
    )

    img, blob = _texture_ambiguous_image()
    ex = SemanticSoftSegmentationExtractor(
        feature_dir="/nonexistent", proxy="sss_fused")
    f = ex.extract(img, "tex")
    assert f.shape == (72, 96, 2)
    assert _best_iou(f, blob) > 0.85

    # swappable semantic source: an oracle feature fn drives the fusion
    calls = []

    def oracle(small):
        h, w = small.shape[:2]
        yy, xx = np.mgrid[0:h, 0:w]
        m = (((yy - h / 2) ** 2 / (0.097 * h * h)
              + (xx - w / 2) ** 2 / (0.115 * w * w)) < 1.0)
        calls.append(small.shape)
        return np.stack([m, ~m], axis=-1).astype(np.float64)

    ex2 = SemanticSoftSegmentationExtractor(
        feature_dir="/nonexistent", proxy="sss_fused",
        semantic_feature_fn=oracle, semantic_weight=10.0)
    f2 = ex2.extract(img, "tex")
    assert calls, "custom semantic_feature_fn was not consulted"
    assert _best_iou(f2, blob) > 0.9
