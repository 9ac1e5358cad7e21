"""TPU-specific numeric behavior: paths whose failure mode only exists on the
chip (default bf16 MXU matmuls, int8 MXU convs, bf16 gather tables)."""
import numpy as np
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry.pnp import solve_pnp_4restarts
from future_urban_scene_generation_tpu.geometry.projection import (
    project_points_extrinsic,
)
from future_urban_scene_generation_tpu.geometry.rotations import (
    rodrigues_to_matrix,
    x_rot,
    z_rot,
)


def test_pnp_full_precision_guard_on_chip():
    """LM-PnP recovers a known pose ON THE TPU: the @full_precision decorator
    is load-bearing here — TPU f32 matmuls default to bf16 MXU passes, which
    silently destroy the 6x6 normal-equation solves while the same test stays
    green on CPU (utils/precision.py)."""
    from future_urban_scene_generation_tpu.utils import mesh as mu

    _, kps3d = mu.make_test_car()
    kps3d = jnp.asarray(kps3d * 5.0, jnp.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = np.asarray(x_rot(jnp.float32(-np.pi / 2.4)) @ z_rot(jnp.float32(0.6)))
    ext[:3, 3] = [1.5, 2.0, 24.0]
    K = jnp.asarray([[1400.0, 0, 960], [0, 1400.0, 540], [0, 0, 1]], jnp.float32)
    kp2d = project_points_extrinsic(kps3d, K, jnp.asarray(ext))

    mse, rvec, tvec = solve_pnp_4restarts(
        kps3d, kp2d, jnp.asarray([1400.0, 1400.0]), jnp.asarray([960.0, 540.0])
    )
    assert float(mse) < 1.0, float(mse)  # sub-pixel reprojection
    r_got = np.asarray(rodrigues_to_matrix(rvec))
    assert np.abs(r_got - ext[:3, :3]).max() < 5e-2
    assert np.abs(np.asarray(tvec) - ext[:3, 3]).max() < 0.2


def test_quad_homography_sliver_on_chip():
    """The closed-form 4-point homography (plane-warp front/back/roof solve)
    keeps f32-floor transfer error on a 1-px sliver quad ON THE CHIP — its
    3x3 matmul composition runs under @full_precision, and the default bf16
    MXU pass would silently destroy the perspective terms while CPU tests
    stay green (the same failure mode as PnP above)."""
    from future_urban_scene_generation_tpu.geometry.homography import (
        find_homography_quad,
    )

    src = jnp.asarray([[50, 50], [150, 52], [150, 53], [50, 51]], jnp.float32)
    dst = jnp.asarray([[60, 80], [160, 83], [160, 84.2], [60, 81.2]], jnp.float32)
    h_q, valid = jax.jit(find_homography_quad)(src, dst)
    assert bool(valid)
    p = np.concatenate([np.asarray(src), np.ones((4, 1), np.float32)], 1) @ np.asarray(
        h_q, np.float64
    ).T
    pred = p[:, :2] / p[:, 2:3]
    assert np.abs(pred - np.asarray(dst)).max() < 1e-2


def test_packed_warp_gather_on_chip():
    """The packed 12-channel bilinear gather (the serving plane-warp path) vs
    its own 4-gather reference, both compiled for TPU, in bf16 table mode."""
    from future_urban_scene_generation_tpu.ops.warp import (
        pack_bilinear_table,
        warp_bilinear_matmul,
    )
    from future_urban_scene_generation_tpu.ops.warp import _bilinear_sample

    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(96, 128, 3).astype(np.float32))
    xs = jnp.asarray(rng.rand(64, 64).astype(np.float32) * 126)
    ys = jnp.asarray(rng.rand(64, 64).astype(np.float32) * 94)
    ref = _bilinear_sample(img, xs, ys)
    got = warp_bilinear_matmul(img, xs, ys, dtype=jnp.bfloat16)
    assert float(jnp.abs(got - ref).max()) < 2e-2


def test_int8_conv_tier_on_chip():
    """The int8 serving-tier conv (MXU double-rate s8 path) stays within its
    quantization budget vs the f32 conv on the chip."""
    from future_urban_scene_generation_tpu.models import layers as L

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 32, 32, 64).astype(np.float32) * 2 - 1)
    w = jnp.asarray((rng.rand(3, 3, 64, 64).astype(np.float32) - 0.5) * 0.2)
    ref = L._xla_conv(x, w, 1, 1)
    got = L._int8_conv(x, w, 1, 1)
    scale = float(jnp.abs(ref).max())
    rel = float(jnp.abs(got - ref).max()) / scale
    assert rel < 0.05, rel


def test_lab_roundtrip_on_chip():
    """OpenCV-parity LAB colorspace round trip compiled for the chip (the ICN
    consumes LAB end-to-end — trajectory_inference.py:182,391)."""
    from future_urban_scene_generation_tpu.ops import colorspace as cs

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
    back = jax.jit(lambda t: cs.lab_to_rgb(cs.rgb_to_lab(t)))(x)
    assert float(jnp.abs(back - x).max()) < 2e-2
