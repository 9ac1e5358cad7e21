"""Mosaic-compiled kernel parity on the real chip.

tests/ exercises the same kernel bodies in interpret mode on CPU; this tier
re-runs them through the actual TPU lowering (layout inference, VMEM budgets,
MXU dots) where interpret mode cannot catch regressions — e.g. round 2's
scoped-VMEM OOM at 6,144 triangles compiled fine in interpret mode.
"""
import numpy as np
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.ops import pallas_raster as pr
from future_urban_scene_generation_tpu.ops.pallas_conv import (
    conv_small_cin,
    conv_small_cin_v2,
)
from future_urban_scene_generation_tpu.render import rasterizer as rz


def _xla_conv_valid(x, k):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k.astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_stem_conv_kernels_on_chip():
    """Both Pallas stem kernels vs the f32 XLA conv at an ICN-stem-like shape
    (bf16 inputs — the only dtype the dispatch gate admits on TPU).

    v1 (conv_small_cin) merges (rows, w_out) into one dot dimension, which
    Mosaic only allows when w_out % 128 == 0 — found BY THIS TIER: at
    w_out=64 it fails layout inference on the chip while interpret mode
    passes. Production stems run w_out=256; the dispatched kernel is v2,
    whose per-row dots have no width constraint (tested at w_out=64 below)."""
    rng = np.random.RandomState(0)
    x128 = jnp.asarray(rng.rand(2, 70, 134, 21).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(((rng.rand(7, 7, 21, 64) - 0.5) * 0.2).astype(np.float32),
                    jnp.bfloat16)
    ref = _xla_conv_valid(x128, k)  # w_out = 128
    scale = float(jnp.abs(ref).max())
    for fn in (conv_small_cin, conv_small_cin_v2):
        got = fn(x128, k).astype(jnp.float32)
        err = float(jnp.abs(got - ref).max()) / scale
        assert err < 2e-2, (fn.__name__, err)  # bf16 accumulation noise only

    # v2 only: non-128-multiple width (w_out = 64).
    x64 = jnp.asarray(rng.rand(2, 70, 70, 21).astype(np.float32), jnp.bfloat16)
    ref64 = _xla_conv_valid(x64, k)
    got64 = conv_small_cin_v2(x64, k).astype(jnp.float32)
    err = float(jnp.abs(got64 - ref64).max()) / float(jnp.abs(ref64).max())
    assert err < 2e-2, err


def _bench_density_scene():
    """A 1,944-triangle mesh (the bench's per-CAD density) posed in view."""
    from future_urban_scene_generation_tpu.utils import mesh as mu

    m, _ = mu.make_test_car(subdiv=9)  # 1,944 triangles
    tris = m.triangles
    v = np.asarray(m.vertices, np.float32)
    # screen-space placement: x,y in pixels, z = depth
    v = v - v.mean(0, keepdims=True)
    v = v / np.abs(v).max()
    screen = np.stack(
        [128 + 80 * v[:, 0], 64 + 48 * v[:, 1], 5.0 + v[:, 2]], axis=-1
    ).astype(np.float32)
    colors = ((v + 1.0) / 2.0).astype(np.float32)
    return jnp.asarray(screen), jnp.asarray(np.asarray(tris, np.int32)), jnp.asarray(colors)


def test_raster_kernel_on_chip_at_bench_density():
    """Compiled Pallas rasterizer == XLA rasterizer at reference asset density
    (round-2 regression: the kernel OOMed scoped VMEM at 6,144 tris while
    interpret mode passed)."""
    verts, tris, colors = _bench_density_scene()
    # output must tile by (TILE_H, TILE_W) = (16, 128)
    img_pl, bg_pl = pr.rasterize_pallas(verts, tris, colors, (128, 256))
    img_x, bg_x = rz.rasterize(verts, tris, colors, (128, 256))
    assert not bool(bg_pl.all()), "mesh should cover pixels"
    same = np.mean(
        np.isclose(np.asarray(img_pl), np.asarray(img_x), atol=1e-3).all(-1)
    )
    assert same > 0.999, same  # sub-pixel ties may differ on isolated pixels
    assert (np.asarray(bg_pl) == np.asarray(bg_x)).mean() > 0.999


def test_raster_kernel_on_chip_dense_6144():
    """The exact density that OOMed in round 2 must compile and run."""
    _dense_mesh_runs(subdiv=16, min_tris=6144)


def test_raster_kernel_on_chip_dense_20k():
    """VERDICT r2 #1's bar: no compile failure at 20k triangles (the
    register-carry kernel stays under VMEM to ~80k, then rasterize_auto falls
    back to the XLA path)."""
    _dense_mesh_runs(subdiv=29, min_tris=20000)


def _dense_mesh_runs(subdiv: int, min_tris: int):
    from future_urban_scene_generation_tpu.utils import mesh as mu

    m, _ = mu.make_test_car(subdiv=subdiv)
    v = np.asarray(m.vertices, np.float32)
    t = np.asarray(m.triangles, np.int32)
    assert t.shape[0] >= min_tris, t.shape
    v = v - v.mean(0, keepdims=True)
    v = v / np.abs(v).max()
    screen = np.stack(
        [96 + 80 * v[:, 0], 48 + 40 * v[:, 1], 5.0 + v[:, 2]], -1
    ).astype(np.float32)
    colors = ((v + 1) / 2).astype(np.float32)
    img, bg = pr.rasterize_pallas(
        jnp.asarray(screen), jnp.asarray(t), jnp.asarray(colors), (64, 128)
    )
    assert not bool(bg.all())
    assert np.isfinite(np.asarray(img)).all()
