"""Focused semantics tests for the pipeline's fused plane warp.

warp_planes_to_crop merges each opposite-face pair into ONE gather: left/right
(with the reference's symmetry substitution) and front/back (no substitution —
only the i->i warp exists, and at most one of the pair can be active). The
painter's-algorithm visibility never marks both faces of a pair visible at
once (test_front_back_never_covisible sweeps poses to pin this), so these
tests exercise every *realizable* visibility combination: at most one side and
one of front/back visible per pose.
"""
import pytest
import numpy as np
import jax.numpy as jnp

from future_urban_scene_generation_tpu.ops import crop as cr
from future_urban_scene_generation_tpu.ops.warp import pack_bilinear_table
from future_urban_scene_generation_tpu.pipeline import stages

rng = np.random.RandomState(70)

LEFT, RIGHT, ROOF, FRONT, BACK = 0, 1, 2, 3, 4


def _setup():
    frame = jnp.asarray(rng.rand(400, 400, 3).astype(np.float32))
    win = cr.Window(jnp.float32(50), jnp.float32(50), jnp.float32(300), jnp.float32(300))
    table = pack_bilinear_table(
        stages._to_signed_lab(cr.crop_resize(frame, win, stages.SRC_TABLE))
    )
    # 5 plane polygons spread inside the window.
    polys = jnp.asarray(rng.rand(5, 6, 2).astype(np.float32) * 250 + 70)
    return table, win, polys


def _nonblack(plane):
    black = np.asarray(stages.LAB_BLACK_SIGNED)
    return np.abs(np.asarray(plane) - black).sum(-1) > 0.05


def _vis(left, right, rest=True, front=None, back=False):
    # Realizable default: roof + front visible, back not (front/back are
    # opposite faces — never co-visible, see test_front_back_never_covisible).
    front = rest if front is None else front
    return jnp.asarray([left, right, rest, front, back])


def _warp(table, win, polys, src_vis, dst_vis):
    return stages.warp_planes_to_crop(table, win, polys, polys, src_vis, dst_vis, win)


def test_same_side_visible_fills_that_slot():
    table, win, polys = _setup()
    out = _warp(table, win, polys, _vis(True, False), _vis(True, False))
    assert out.shape == (5, 256, 256, 3)
    assert _nonblack(out[LEFT]).sum() > 100
    assert _nonblack(out[RIGHT]).sum() == 0
    for p in (ROOF, FRONT):
        assert _nonblack(out[p]).sum() > 100, p
    assert _nonblack(out[BACK]).sum() == 0  # back invisible in this pose


def test_symmetry_substitution_left_to_right():
    table, win, polys = _setup()
    # src sees LEFT, dst sees RIGHT -> left texture lands in the RIGHT slot.
    out = _warp(table, win, polys, _vis(True, False), _vis(False, True))
    assert _nonblack(out[RIGHT]).sum() > 100
    assert _nonblack(out[LEFT]).sum() == 0


def test_symmetry_substitution_right_to_left():
    table, win, polys = _setup()
    out = _warp(table, win, polys, _vis(False, True), _vis(True, False))
    assert _nonblack(out[LEFT]).sum() > 100
    assert _nonblack(out[RIGHT]).sum() == 0


def test_sides_invisible_in_src_everywhere_black():
    table, win, polys = _setup()
    out = _warp(table, win, polys, _vis(False, False), _vis(True, False))
    assert _nonblack(out[LEFT]).sum() == 0
    assert _nonblack(out[RIGHT]).sum() == 0
    assert _nonblack(out[2]).sum() > 100  # roof unaffected


def test_sides_invisible_in_dst_everywhere_black():
    table, win, polys = _setup()
    out = _warp(table, win, polys, _vis(True, False), _vis(False, False))
    assert _nonblack(out[LEFT]).sum() == 0
    assert _nonblack(out[RIGHT]).sum() == 0


def test_nonsymmetry_planes_require_both_sides():
    table, win, polys = _setup()
    # Roof (2) invisible in dst -> roof slot black even though src-visible.
    src_vis = jnp.asarray([True, False, True, True, False])
    dst_vis = jnp.asarray([True, False, False, True, False])
    out = _warp(table, win, polys, src_vis, dst_vis)
    assert _nonblack(out[ROOF]).sum() == 0
    assert _nonblack(out[FRONT]).sum() > 100


def test_front_back_merge_back_slot():
    table, win, polys = _setup()
    # Back visible in src and dst (front not) -> back slot fills, front black.
    out = _warp(table, win, polys, _vis(True, False, front=False, back=True),
                _vis(True, False, front=False, back=True))
    assert _nonblack(out[BACK]).sum() > 100
    assert _nonblack(out[FRONT]).sum() == 0


def test_front_back_no_cross_substitution():
    table, win, polys = _setup()
    # src sees FRONT, dst sees BACK: the reference warps a non-symmetry plane
    # only src slot i -> dst slot i (planes_utils.py:58-60), so BOTH slots stay
    # black (front: dst-invisible; back: src-invisible).
    out = _warp(table, win, polys, _vis(True, False, front=True, back=False),
                _vis(True, False, front=False, back=True))
    assert _nonblack(out[FRONT]).sum() == 0
    assert _nonblack(out[BACK]).sum() == 0


def test_front_back_never_covisible():
    """The precondition of the shared front/back gather: the painter's 0.9-area
    rule never marks both of an opposite-face pair visible. Sweeps camera
    elevation (incl. extreme top-down, where the side pair IS co-visible) x
    yaw x distance. A wider offline sweep (2184 poses incl. az/el/dist/yaw
    cross-products) also found zero front&back co-visibility."""
    from future_urban_scene_generation_tpu.utils import mesh as mu
    from future_urban_scene_generation_tpu.render import visibility as vis
    from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
    from future_urban_scene_generation_tpu.geometry.projection import (
        project_points_extrinsic,
    )
    import itertools
    import jax

    _, kp = mu.make_test_car(subdiv=2)
    kp3d = jnp.asarray(np.asarray(kp, np.float32) * 5.0)
    K = jnp.asarray(np.array([[1400., 0, 960], [0, 1400., 540], [0, 0, 1]],
                             np.float32))

    def one(a):
        el, dist, yaw = a[0], a[1], a[2]
        R = x_rot(el) @ z_rot(jnp.float32(0.4))
        ext = (jnp.eye(4).at[:3, :3].set(R)
               .at[:3, 3].set(jnp.stack([jnp.float32(0.), jnp.float32(2.0), dist])))
        kp3 = kp3d @ z_rot(yaw)
        kp2 = project_points_extrinsic(kp3, K, ext)
        return vis.compute_visibility_local(ext, kp2, kp3, res=96)

    els = [-np.pi / 2.4, -np.pi / 2.05, -np.pi / 6]
    dists = [12., 40.]
    yaws = np.linspace(0, 2 * np.pi, 17)
    grid = np.array(list(itertools.product(els, dists, yaws)), np.float32)
    v = np.asarray(jax.jit(jax.vmap(one))(jnp.asarray(grid)))
    front, back = vis.OPPOSITE_PAIR
    assert int((v[:, front] & v[:, back]).sum()) == 0


def test_masked_region_is_lab_black():
    table, win, polys = _setup()
    out = _warp(table, win, polys, _vis(True, False), _vis(True, False))
    # Outside-polygon pixels carry exactly the signed-LAB black constant.
    outside = ~_nonblack(out[2])
    vals = np.asarray(out[2])[outside]
    assert np.allclose(vals, np.asarray(stages.LAB_BLACK_SIGNED), atol=1e-2)


def test_identity_warp_reproduces_source_texture():
    """src == dst polygons -> identity homography -> the warped plane must equal
    the source table resampled at the dst grid (pure gather, no distortion)."""
    from future_urban_scene_generation_tpu.ops.warp import bilinear_sample_packed

    table, win, polys = _setup()
    out = _warp(table, win, polys, _vis(True, False), _vis(True, False))
    s = 256
    tdim = stages.SRC_TABLE
    qs = (np.arange(s, dtype=np.float32) + 0.5) / s
    tx = jnp.asarray(np.broadcast_to(qs[None, :] * tdim - 0.5, (s, s)))
    ty = jnp.asarray(np.broadcast_to(qs[:, None] * tdim - 0.5, (s, s)))
    direct = np.asarray(bilinear_sample_packed(table, tx, ty))
    got = np.asarray(out[2])
    inside = _nonblack(out[2])
    np.testing.assert_allclose(got[inside], direct[inside], atol=1e-3)


def test_warp_bilinear_matmul_matches_gather_sampler():
    from future_urban_scene_generation_tpu.ops.warp import (
        _bilinear_sample,
        warp_bilinear_matmul,
    )

    img = jnp.asarray(rng.rand(65, 65, 3).astype(np.float32))
    # Inside, the partial-weight border ring, and far outside.
    xs = jnp.asarray(rng.uniform(-3, 68, (48, 48)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-3, 68, (48, 48)).astype(np.float32))
    ref = _bilinear_sample(img, xs, ys)
    got = warp_bilinear_matmul(img, xs, ys, chunk=512)
    assert float(jnp.abs(got - ref).max()) < 1e-6  # exact (f32)
    got1 = warp_bilinear_matmul(img, xs, ys, chunk=48 * 48)  # single-chunk path
    assert float(jnp.abs(got1 - ref).max()) < 1e-6
    got_bf = warp_bilinear_matmul(img, xs, ys, dtype=jnp.bfloat16, chunk=512)
    assert float(jnp.abs(got_bf - ref).max()) < 2e-2


def _smooth_frame():
    yy, xx = np.mgrid[:400, :400].astype(np.float32)
    return jnp.asarray(
        np.stack([xx / 400, yy / 400, 0.5 + 0.3 * np.sin(xx / 40)], -1)
    )


@pytest.mark.slow  # >10s: big torch build / heavy sweep
@pytest.mark.parametrize("warp_res", [128, 96])
def test_reduced_res_warp_semantics_and_quality(warp_res):
    """warp_plane_res=128/96: same slot/symmetry/black semantics, and close to
    the exact path on smooth textures (the extra resample mirrors the reference's
    own warp->crop->resize chain). 96 is the benched serving default (end-to-end
    composited-frame PSNR measured flat from 128 to 96 — see PARITY.md §3)."""
    frame = _smooth_frame()
    win = cr.Window(jnp.float32(50), jnp.float32(50), jnp.float32(300), jnp.float32(300))
    table = pack_bilinear_table(
        stages._to_signed_lab(cr.crop_resize(frame, win, stages.SRC_TABLE))
    )
    local = np.random.RandomState(70)  # independent of module rng state (order!)
    src_polys = jnp.asarray(local.rand(5, 6, 2).astype(np.float32) * 250 + 70)
    # dst = exact homography image of src (mild affinity): in production the
    # correspondences are projections of the same 3D points, so the DLT solve is
    # (near-)exact and the warped texture lands inside the dst polygon's bbox.
    dst_polys = src_polys * 0.9 + jnp.asarray([20.0, 12.0])
    # Symmetry substitution warps src LEFT (idx 0) onto the dst RIGHT slot (idx 1);
    # in production those correspondences are projections of mirrored coplanar
    # points (an exact homography) — make the test pair consistent the same way.
    dst_polys = dst_polys.at[1].set(src_polys[0] * 0.9 + jnp.asarray([20.0, 12.0]))
    sv, dv = _vis(True, False), _vis(False, True)
    exact = np.asarray(
        stages.warp_planes_to_crop(table, win, src_polys, dst_polys, sv, dv, win)
    )
    stages.configure_models(warp_plane_res=warp_res)
    try:
        fast = np.asarray(
            stages.warp_planes_to_crop(table, win, src_polys, dst_polys, sv, dv, win)
        )
    finally:
        stages.configure_models(warp_plane_res=256)

    # Semantics: the same slots are (non)black.
    black = np.asarray(stages.LAB_BLACK_SIGNED)
    for p in range(5):
        nb_exact = (np.abs(exact[p] - black).sum(-1) > 0.05).sum()
        nb_fast = (np.abs(fast[p] - black).sum(-1) > 0.05).sum()
        assert (nb_exact == 0) == (nb_fast == 0), p
        if nb_exact:
            assert abs(nb_fast - nb_exact) / nb_exact < 0.1, (p, nb_exact, nb_fast)

    # Quality on the filled planes.
    mse = float(np.mean((exact - fast) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # signed-LAB range 2
    assert psnr > 30.0, psnr


def test_quad_solver_matches_dlt_on_padded_quads():
    """MODEL_SPEC["quad_homography"] A/B: on TEXTURE_PLANES-topology polys
    (roof/front/back = 4 corners padded to 6 by repetition — the only form the
    pipeline ever passes), the closed-form 4-point solve and the 6-row DLT give
    the same warp. This is the regression pin for the attribution knob that
    tools/compile_probe.py uses."""
    frame = _smooth_frame()
    win = cr.Window(jnp.float32(50), jnp.float32(50), jnp.float32(300), jnp.float32(300))
    table = pack_bilinear_table(
        stages._to_signed_lab(cr.crop_resize(frame, win, stages.SRC_TABLE))
    )
    local = np.random.RandomState(81)
    polys = local.rand(5, 6, 2).astype(np.float32) * 250 + 70
    for row in (2, 3, 4):  # roof/front/back: pad corners like TEXTURE_PLANES
        polys[row, 4:] = polys[row, 3]
    src_polys = jnp.asarray(polys)
    dst_polys = src_polys * 0.9 + jnp.asarray([20.0, 12.0])
    sv, dv = _vis(True, False), _vis(True, False)
    quad = np.asarray(
        stages.warp_planes_to_crop(table, win, src_polys, dst_polys, sv, dv, win)
    )
    stages.configure_models(quad_homography=False)
    try:
        dlt = np.asarray(
            stages.warp_planes_to_crop(table, win, src_polys, dst_polys, sv, dv, win)
        )
    finally:
        stages.configure_models(quad_homography=True)
    # Same solve up to f32 solver noise: tiny mask-boundary flips allowed.
    disagree = np.abs(quad - dlt).max(-1) > 2e-2
    assert disagree.mean() < 2e-3, disagree.mean()
    mse = float(np.mean((quad - dlt) ** 2))
    assert mse < 1e-4, mse
