"""Pallas rasterizer kernel vs the XLA rasterizer (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from future_urban_scene_generation_tpu.ops import pallas_raster as pr
from future_urban_scene_generation_tpu.render import rasterizer as rz

rng = np.random.RandomState(31)


def _random_scene(n_verts=40, n_tris=60):
    verts = jnp.asarray(
        rng.rand(n_verts, 3) * [250, 250, 3] + [0, 0, 4], jnp.float32
    )
    tris = jnp.asarray(rng.randint(0, n_verts, (n_tris, 3)), jnp.int32)
    colors = jnp.asarray(rng.rand(n_verts, 3), jnp.float32)
    return verts, tris, colors


def test_pixel_identical_to_xla():
    verts, tris, colors = _random_scene()
    img_ref, bg_ref = rz.rasterize(verts, tris, colors, (256, 256))
    img_pl, bg_pl = pr.rasterize_pallas(verts, tris, colors, (256, 256), interpret=True)
    assert np.array_equal(np.asarray(bg_ref), np.asarray(bg_pl))
    # The kernel evaluates z as a precomputed affine plane; where two triangles
    # intersect/coincide, float-eps z differences can flip the winner vs the XLA
    # path's barycentric z. Allow a tiny fraction of such pixels.
    d = np.abs(np.asarray(img_ref) - np.asarray(img_pl)).max(-1)
    frac_diff = (d > 1e-4).mean()
    assert frac_diff < 0.005, frac_diff


def test_behind_camera_and_degenerate_dropped():
    verts = jnp.asarray(
        [[10.0, 10.0, -5.0], [200.0, 10.0, -5.0], [10.0, 200.0, -5.0],  # behind
         [50.0, 50.0, 5.0], [50.0, 50.0, 5.0], [50.0, 50.0, 5.0]],  # degenerate
        jnp.float32,
    )
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    colors = jnp.ones((6, 3))
    _, bg = pr.rasterize_pallas(verts, tris, colors, (256, 128), interpret=True)
    assert np.asarray(bg).all()


def test_depth_tie_first_wins():
    # Two coincident quads, different colors: the first triangle in buffer order wins
    # (strict < depth test), matching the XLA path's argmin-first semantics.
    verts = jnp.asarray(
        [[10.0, 10.0, 5.0], [100.0, 10.0, 5.0], [10.0, 100.0, 5.0]], jnp.float32
    )
    tris = jnp.asarray([[0, 1, 2], [0, 1, 2]], jnp.int32)
    colors_a = jnp.asarray([[1.0, 0, 0]] * 3)
    img, _ = pr.rasterize_pallas(
        verts, tris, jnp.asarray([[1.0, 0, 0]] * 3), (64, 128), interpret=True
    )
    assert np.asarray(img)[30, 30, 0] > 0.9


def test_triangle_planes_bbox():
    verts, tris, colors = _random_scene(10, 8)
    coefs, bboxes = pr.triangle_planes(verts, tris, colors)
    assert coefs.shape == (8, pr.N_COEF)
    assert bboxes.shape == (8, 4)
    b = np.asarray(bboxes)
    # Valid triangles have ordered bboxes; degenerate ones get inverted (empty)
    # bboxes on purpose so every tile's overlap test skips them.
    ordered = (b[:, 0] <= b[:, 1]) & (b[:, 2] <= b[:, 3])
    degenerate = np.asarray(coefs)[:, 2] == -1.0  # invalid marker plane C = -1
    assert np.all(ordered | degenerate)
    assert ordered.any()
