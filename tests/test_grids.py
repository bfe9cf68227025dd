import jax.numpy as jnp
import numpy as np

from awesome_tpu.core import grids as G


def test_positional_grid_2d():
    g = G.positional_grid(4, 3)
    assert g.shape == (2, 3, 4)
    # channel 0 is x: varies along width, linspace 0..1
    np.testing.assert_allclose(g[0, 0], np.linspace(0, 1, 4), rtol=1e-6)
    np.testing.assert_allclose(g[1, :, 0], np.linspace(0, 1, 3), rtol=1e-6)


def test_positional_grid_temporal():
    g = G.positional_grid(4, 3, t=2.0, t_max=8.0)
    assert g.shape == (3, 3, 4)
    np.testing.assert_allclose(g[2], 0.25, rtol=1e-6)


def test_coordinate_grid_2d_channel_order():
    g = G.coordinate_grid((3, 5))
    assert g.shape == (2, 3, 5)
    # channels are (x, y) reversed from meshgrid(ij): g[0] varies along W
    np.testing.assert_allclose(g[0][0], np.arange(5))
    np.testing.assert_allclose(g[1][:, 0], np.arange(3))


def test_coordinate_grid_3d_time_to_batch():
    g = G.coordinate_grid((4, 3, 5))
    assert g.shape == (4, 3, 3, 5)


def test_normalized_grid_range():
    g = G.normalized_grid((7, 9))
    assert g.shape == (1, 2, 7, 9)
    assert float(g.min()) == 0.0 and float(g.max()) == 1.0


def test_flatten_unflatten_roundtrip():
    g = G.normalized_grid((5, 6))
    pts = G.flatten_grid(g)
    assert pts.shape == (30, 2)
    back = G.unflatten_grid(pts, g.shape)
    np.testing.assert_allclose(np.asarray(back), np.asarray(g))


def test_pixel_grid_matches_howto():
    g = G.pixel_grid((3, 4))
    assert g.shape == (1, 2, 3, 4)
    np.testing.assert_allclose(g[0, 0, 0], np.arange(4) / 4.0, rtol=1e-6)
    np.testing.assert_allclose(g[0, 1, :, 0], np.arange(3) / 3.0, rtol=1e-6)


def test_circle_mask_and_unary_approximation():
    m = G.circle_mask((21, 21), radius=5.0, center=(10.0, 10.0))
    assert bool(m[10, 10]) and not bool(m[0, 0])
    approx = G.unary_circle_approximation(m.astype(jnp.float32))
    # area should roughly match
    assert abs(float(approx.sum()) - float(m.sum())) / float(m.sum()) < 0.2
