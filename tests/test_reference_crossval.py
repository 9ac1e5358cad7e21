"""Cross-validation against the ACTUAL reference implementation.

Most parity tests in this suite compare against cv2/torch oracles or compact torch
mirrors; these run the reference repo's own code (mounted read-only at
/root/reference, executed — never copied) on shared random inputs and compare
outputs directly. Skipped wholesale when the reference isn't mounted. Reference
modules needing torchvision get a stub (only `transforms.ToTensor/Normalize`
attributes are touched at import time).
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")

rng = np.random.RandomState(99)

_REF_TOPLEVEL = {"utils", "warp_learn", "vunet", "stacked_hourglass", "edgeconnect"}


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, str(REF))
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tr.ToTensor = object
        tr.Normalize = object
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        stubbed = True
    else:
        stubbed = False
    import importlib

    names = [
        "utils.bounding_box", "utils.crop_utils", "utils.keypoint_utils",
        "utils.gps_utils", "utils.cpc", "utils.pnp_utils",
        "warp_learn.planes_utils", "warp_learn.online_visibility",
        "warp_learn.models", "stacked_hourglass.models",
        "edgeconnect.networks", "vunet.models",
    ]
    mods = {n: importlib.import_module(n) for n in names}
    yield mods
    sys.path.remove(str(REF))
    for k in list(sys.modules):
        if k.split(".")[0] in _REF_TOPLEVEL:
            del sys.modules[k]
    if stubbed:
        sys.modules.pop("torchvision", None)
        sys.modules.pop("torchvision.transforms", None)


# ---------------------------------------------------------------------------
# Host utilities
# ---------------------------------------------------------------------------

def test_bounding_box_crossval(ref):
    from future_urban_scene_generation_tpu.utils.bbox import BoundingBox as Ours

    Ref = ref["utils.bounding_box"].BoundingBox
    for _ in range(20):
        x, y = rng.randint(0, 200, 2)
        w, h = rng.randint(5, 120, 2)
        scale = float(rng.uniform(0.5, 2.0))
        bounds = (0, 320, 0, 240)
        r = Ref(x, y, w, h, bounds=bounds, scale=scale)
        o = Ours(x, y, w, h, bounds=bounds, scale=scale)
        assert tuple(r.xyxy) == tuple(o.xyxy)
        assert tuple(np.asarray(r.mid_bottom)) == tuple(np.asarray(o.mid_bottom))


def test_square_crop_crossval(ref):
    from future_urban_scene_generation_tpu.ops import crop as cr

    sq = ref["utils.crop_utils"].square_crop_from_bbox
    img = rng.rand(240, 320, 3).astype(np.float32)
    for _ in range(10):
        x0, y0 = rng.randint(0, 200), rng.randint(0, 150)
        bw, bh = rng.randint(20, 100), rng.randint(20, 80)
        bbox = [x0, y0, x0 + bw, y0 + bh]
        crop_ref, tl, pad_before, pad_after, center, scale = sq(img, bbox)
        win = cr.square_window_from_bbox(jnp.asarray(np.float32(bbox)))
        # Geometry: same square side and top-left in image coordinates.
        side_ref = crop_ref.shape[0]
        assert abs(float(win.w) - side_ref) <= 1.5  # int-truncation convention
        x_start_ref = tl[0] - pad_before[0]
        y_start_ref = tl[1] - pad_before[1]
        assert abs(float(win.x_start) - x_start_ref) <= 1.5
        assert abs(float(win.y_start) - y_start_ref) <= 1.5
        # Content: our fused crop+resize equals cv2-resizing the reference crop.
        import cv2

        ours256 = np.asarray(cr.crop_resize(jnp.asarray(img), win, 256))
        ref256 = cv2.resize(crop_ref, (256, 256), interpolation=cv2.INTER_LINEAR)
        # Interior only: the 1px border differs by the zero-ring blend convention.
        diff = np.abs(ours256[8:-8, 8:-8] - ref256[8:-8, 8:-8])
        assert np.percentile(diff, 99) < 0.06, np.percentile(diff, 99)


def test_get_maxima_crossval(ref):
    from future_urban_scene_generation_tpu.models.hourglass import decode_heatmaps

    get_maxima = ref["utils.keypoint_utils"].get_maxima
    heat = rng.rand(2, 12, 64, 64).astype(np.float32)
    # Reference path: upsample to 256 then argmax — F.interpolate with DEFAULT
    # mode, i.e. nearest (trajectory_inference.py:77).
    up = torch.nn.functional.interpolate(torch.from_numpy(heat), size=(256, 256))
    ref_kp = get_maxima(up, thresh=0.0)  # (2, 12, 2) normalized (x, y)
    ours = np.asarray(decode_heatmaps(jnp.asarray(heat.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref_kp, atol=1e-6)


def test_gps_meters_crossval(ref):
    from future_urban_scene_generation_tpu.geometry import gps as ours_gps

    t2m = ref["utils.gps_utils"].trajectories_to_meters
    hmat = np.array([[2e-5, 1e-6, 45.0], [0, 1.5e-5, 11.0], [0, 0, 1.0]])
    inv = np.linalg.inv(hmat)
    # 'inter' mode feeds raw pixel mid-bottoms (the GUI's interpolated track).
    pts = np.concatenate(
        [np.zeros((8, 2)), rng.rand(8, 2) * np.array([640, 360])], axis=1
    )
    ref_m = t2m(pts, inv, scale=1.0, shape=(360, 640), img_scale=1.0, mode="inter")
    our_m = np.asarray(ours_gps.trajectory_to_meters(pts[:, 2:].astype(np.float64), inv))
    np.testing.assert_allclose(our_m, ref_m, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Geometry: LM-PnP
# ---------------------------------------------------------------------------

def test_pnp_crossval(ref):
    from future_urban_scene_generation_tpu.geometry.pnp import solve_pnp_4restarts
    from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
    from future_urban_scene_generation_tpu.geometry.projection import (
        project_points_extrinsic,
    )
    from future_urban_scene_generation_tpu.utils.mesh import make_test_car

    # Newer torch forbids the reference's in-place writes into leaf Parameters
    # (cpc.py:9-23); replace apply_U/apply_r/apply_tr with out-of-place builders
    # of the SAME tensors (skew matrix / stacked vectors) so autograd edges from
    # the rodrigues/translation scalars are preserved — torch-version scaffolding,
    # not a behavior change.
    cpc_mod = ref["utils.cpc"]
    if not getattr(cpc_mod.CPC_R, "_oop_patched", False):
        def apply_U(self, ax, ay, az):
            zero = torch.zeros((), dtype=ax.dtype)
            u = torch.stack([
                torch.stack([zero, -az, ay]),
                torch.stack([az, zero, -ax]),
                torch.stack([-ay, ax, zero]),
            ])
            object.__setattr__(self, "U", u)

        def apply_r(self, ax, ay, az):
            object.__setattr__(self, "r", torch.stack([ax, ay, az]))

        def apply_tr(self, x, y, z):
            object.__setattr__(self, "Tr", torch.stack([x, y, z]))

        cpc_mod.CPC_R.apply_U = apply_U
        cpc_mod.CPC_R.apply_r = apply_r
        cpc_mod.CPC_R.apply_tr = apply_tr
        cpc_mod.CPC_R._oop_patched = True

    cpc4 = ref["utils.pnp_utils"].cpc_rodr_4_angles
    kp3d = np.asarray(make_test_car()[1], np.float32) * 5.0
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]], np.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = np.asarray(x_rot(jnp.float32(-1.2)) @ z_rot(jnp.float32(0.7)))
    ext[:3, 3] = [1.0, 1.5, 18.0]
    kp2d = np.asarray(
        project_points_extrinsic(jnp.asarray(kp3d), jnp.asarray(K), jnp.asarray(ext))
    ).astype(np.float32)

    focals = np.array([K[0, 0], K[1, 1]], np.float32)
    centers = np.array([K[0, 2], K[1, 2]], np.float32)
    err_ref, rvec_ref, tvec_ref = cpc4(focals, centers, kp2d, kp3d)
    err_our, rvec_our, tvec_our = solve_pnp_4restarts(
        jnp.asarray(kp3d), jnp.asarray(kp2d), jnp.asarray(focals), jnp.asarray(centers)
    )
    # Both recover the exact pose (reprojection error ~0) and agree on it.
    assert float(err_ref) < 1e-3 and float(err_our) < 1e-3
    np.testing.assert_allclose(np.asarray(tvec_our), tvec_ref.reshape(-1), atol=5e-3)
    np.testing.assert_allclose(np.asarray(rvec_our), rvec_ref.reshape(-1), atol=5e-3)


# ---------------------------------------------------------------------------
# Plane visibility + warping
# ---------------------------------------------------------------------------

def _kp_dicts(kp2d_px, kp3d):
    from future_urban_scene_generation_tpu.utils.keypoints import KEYPOINT_NAMES

    d2 = {n: kp2d_px[i] for i, n in enumerate(KEYPOINT_NAMES)}
    d3 = {n: kp3d[i] for i, n in enumerate(KEYPOINT_NAMES)}
    return d2, d3


def test_visibility_crossval(ref):
    from future_urban_scene_generation_tpu.render import visibility as vis
    from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
    from future_urban_scene_generation_tpu.geometry.projection import (
        project_points_extrinsic,
    )
    from future_urban_scene_generation_tpu.utils.mesh import make_test_car

    ref_vis = ref["warp_learn.online_visibility"].compute_visibility
    kp3d = np.asarray(make_test_car()[1], np.float32) * 5.0
    K = np.array([[500.0, 0, 320], [0, 500.0, 180], [0, 0, 1]], np.float32)
    agree = 0
    total = 0
    for az in (0.3, 1.2, 2.2, 3.5, 4.4, 5.6):
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.asarray(x_rot(jnp.float32(-1.25)) @ z_rot(jnp.float32(az)))
        ext[:3, 3] = [0.0, 1.5, 16.0]
        kp2d = np.asarray(
            project_points_extrinsic(jnp.asarray(kp3d), jnp.asarray(K), jnp.asarray(ext))
        )
        d2, d3 = _kp_dicts(kp2d, kp3d)
        r = ref_vis(ext.astype(np.float64), K.astype(np.float64), d3, 360, 640)
        ours = np.asarray(
            vis.compute_visibility(jnp.asarray(ext), jnp.asarray(kp2d),
                                   jnp.asarray(kp3d), (360, 640))
        )
        names = ["left", "right", "roof", "front", "back"]
        for i, n in enumerate(names):
            total += 1
            agree += int(bool(ours[i]) == bool(r[n]))
    # fillPoly boundary conventions differ slightly; demand near-total agreement.
    assert agree >= total - 1, (agree, total)


def test_planes_warp_crossval(ref):
    from future_urban_scene_generation_tpu.render import planes as our_planes
    from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
    from future_urban_scene_generation_tpu.geometry.projection import (
        project_points_extrinsic,
    )
    from future_urban_scene_generation_tpu.utils.mesh import make_test_car

    pu = ref["warp_learn.planes_utils"]
    kp3d = np.asarray(make_test_car()[1], np.float32) * 5.0
    K = np.array([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]], np.float32)
    img = rng.rand(256, 256, 3).astype(np.float32)

    def pose(az, t):
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.asarray(x_rot(jnp.float32(-1.25)) @ z_rot(jnp.float32(az)))
        ext[:3, 3] = t
        return np.asarray(project_points_extrinsic(
            jnp.asarray(kp3d), jnp.asarray(K), jnp.asarray(ext)))

    src_kp = pose(0.8, [0.0, 1.2, 14.0])
    dst_kp = pose(1.1, [0.5, 1.2, 15.0])

    # Reference: normalized-coordinate dicts in, visibility all-on.
    d2_src = {n: src_kp[i] / 256.0 for i, n in enumerate(
        __import__("future_urban_scene_generation_tpu.utils.keypoints",
                   fromlist=["KEYPOINT_NAMES"]).KEYPOINT_NAMES)}
    vis_all = {n: True for n in ("left", "right", "roof", "front", "back")}
    ref_planes, ref_kp_polys, ref_vis = pu.get_planes(img, d2_src, "car", vis_all)

    our_pl, our_polys = our_planes.get_planes(jnp.asarray(img), jnp.asarray(src_kp))
    # Masked-texture parity (fillPoly boundary rows may differ by <=1px band).
    for i in range(5):
        a = np.asarray(our_pl[i])
        b = ref_planes[i]
        mismatch = np.abs(a - b).max(-1) > 1e-3
        assert mismatch.mean() < 0.02, (i, mismatch.mean())

    # Warp parity through the full skip/symmetry logic. Destination polygons are
    # built by the reference's own get_planes (variable vertex counts per plane:
    # 6 for the sides, 4 for roof/front/back).
    d2_dst = {n: dst_kp[i] / 256.0 for i, n in enumerate(
        __import__("future_urban_scene_generation_tpu.utils.keypoints",
                   fromlist=["KEYPOINT_NAMES"]).KEYPOINT_NAMES)}
    _, dst_polys_ref, _ = pu.get_planes(img, d2_dst, "car", vis_all)
    # Realistic visibility flags (an edge-on plane passes all-on flags into a
    # near-degenerate homography: cv2 fits garbage, our solver flags invalid —
    # production never reaches that case because visibility excludes it).
    src_vis = np.array([1, 0, 1, 0, 1], np.uint8)
    dst_vis = np.array([0, 1, 1, 0, 1], np.uint8)
    ref_warp, ref_unwarp = pu.warp_unwarp_planes(
        ref_planes, ref_kp_polys, dst_polys_ref, src_vis, dst_vis, "car",
        pu.pascal_texture_planes if hasattr(pu, "pascal_texture_planes")
        else ref["warp_learn.online_visibility"].pascal_texture_planes,
    )
    our_warp, our_unwarp = our_planes.warp_unwarp_planes(
        our_pl, our_polys, jnp.trunc(jnp.asarray(dst_kp))[
            jnp.asarray(__import__(
                "future_urban_scene_generation_tpu.render.visibility",
                fromlist=["TEXTURE_PLANES"]).TEXTURE_PLANES)],
        jnp.asarray(src_vis.astype(bool)), jnp.asarray(dst_vis.astype(bool)),
    )
    for i in range(5):
        a = np.asarray(our_warp[i])
        b = ref_warp[i]
        mismatch = np.abs(a - b).max(-1) > 2e-2
        assert mismatch.mean() < 0.03, (i, mismatch.mean())


# ---------------------------------------------------------------------------
# Real reference networks through the converter
# ---------------------------------------------------------------------------

def test_hourglass_real_network_parity(ref):
    from future_urban_scene_generation_tpu.models.hourglass import HourglassNet
    from future_urban_scene_generation_tpu.pipeline.checkpoint import (
        load_torch_checkpoint,
    )

    tnet = ref["stacked_hourglass.models"].HourglassNet(
        num_stacks=2, num_blocks=1, num_classes=12
    ).eval()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "hg.pth"
        torch.save(tnet.state_dict(), p)
        params, _ = load_torch_checkpoint(p)
    x = rng.rand(1, 256, 256, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    if isinstance(ref_out, dict):
        ref_out = ref_out["heatmaps"]
    ref_maps = ref_out[-1].numpy() if isinstance(ref_out, (list, tuple)) else ref_out.numpy()
    ours = HourglassNet(num_stacks=2, num_blocks=1, num_classes=12).apply(
        params, jnp.asarray(x)
    )["heatmaps"]
    our_maps = np.asarray(ours[-1]).transpose(0, 3, 1, 2)
    assert np.abs(our_maps - ref_maps).max() < 5e-3


def test_edgeconnect_real_networks_parity(ref):
    from future_urban_scene_generation_tpu.models import edgeconnect as ec
    from future_urban_scene_generation_tpu.models.convert import convert_state_dict

    nets = ref["edgeconnect.networks"]
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    edge = nets.EdgeGenerator(use_spectral_norm=True).eval()
    with torch.no_grad():
        ref_out = edge(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    params = convert_state_dict(edge.state_dict(), convt_keys=(
        "decoder.0.weight", "decoder.3.weight"))
    ours = ec.EdgeGenerator().apply(params, jnp.asarray(x))
    assert np.abs(np.asarray(ours).transpose(0, 3, 1, 2) - ref_out).max() < 5e-3

    x4 = rng.rand(1, 64, 64, 4).astype(np.float32)
    inp = nets.InpaintGenerator().eval()
    with torch.no_grad():
        ref_out = inp(torch.from_numpy(x4.transpose(0, 3, 1, 2))).numpy()
    params = convert_state_dict(inp.state_dict(), convt_keys=(
        "decoder.0.weight", "decoder.3.weight"))
    ours = ec.InpaintGenerator().apply(params, jnp.asarray(x4))
    assert np.abs(np.asarray(ours).transpose(0, 3, 1, 2) - ref_out).max() < 5e-3


def test_icn_real_network_parity(ref):
    from future_urban_scene_generation_tpu.models.icn import GResnet
    from future_urban_scene_generation_tpu.models.convert import convert_state_dict

    wm = ref["warp_learn.models"]
    tnet = wm.G_Resnet(input_nc=21, output_nc=3, num_downs=2, n_res=3,
                       ngf=64, norm="inst", nl_layer="relu").eval()
    x = rng.rand(1, 64, 64, 21).astype(np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    params = convert_state_dict(tnet.state_dict())
    ours = GResnet(input_nc=21).apply(params, jnp.asarray(x))
    assert np.abs(np.asarray(ours).transpose(0, 3, 1, 2) - ref_out).max() < 5e-3


@pytest.mark.slow  # >10s: big torch build / heavy sweep
def test_vunet_real_network_parity(ref):
    import argparse

    from future_urban_scene_generation_tpu.models.vunet import Vunet
    from future_urban_scene_generation_tpu.pipeline.checkpoint import (
        load_torch_checkpoint,
    )

    # Make the reference deterministic: its Sampler ALWAYS adds N(0,1) noise
    # (vunet/layers.py:166) and enc_down chains z (not mu) between scales, so
    # even the appearance means are stochastic. cov=0 turns every sample into
    # its mean — exactly our deterministic inference mode (PARITY.md §7).
    import importlib

    vlayers = importlib.import_module("vunet.layers")
    if not getattr(vlayers.Sampler, "_cov0_patched", False):
        _orig_sampler_fwd = vlayers.Sampler.forward

        def _fwd_cov0(self, x, cov=0.0):
            return _orig_sampler_fwd(self, x, cov)

        vlayers.Sampler.forward = _fwd_cov0
        vlayers.Sampler._cov0_patched = True

    args = argparse.Namespace(up_mode="subpixel", w_norm=True, drop_prob=0.0,
                              vunet_256=True)
    tnet = ref["vunet.models"].Vunet_fix_res(args).eval()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "vunet.pth"
        torch.save(tnet.state_dict(), p)
        params, _ = load_torch_checkpoint(p)

    x = rng.rand(1, 256, 256, 6).astype(np.float32) * 2 - 1
    y = rng.rand(1, 256, 256, 3).astype(np.float32) * 2 - 1
    # Deterministic path: feed the appearance POSTERIOR MEANS to the decoder
    # (the reference's Samplers inject N(0,1) noise even at eval — PARITY.md §7;
    # our cov=0 path uses the means, so call the reference's sub-forwards the
    # same way run-time inference does, substituting mu for z).
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        yt = torch.from_numpy(y.transpose(0, 3, 1, 2))
        out_up, skips_up = tnet.forward_enc_up(xt)
        mu_app, _ = tnet.forward_enc_down(out_up, skips_up)
        dec_up, skips_dec = tnet.forward_dec_up(yt)
        ref_img = tnet.forward_dec_down(dec_up, skips_dec, mu_app)[0].numpy()
    model = Vunet(vunet_256=True)
    mu_ours = model.apply(params, jnp.asarray(x), cov=0.0,
                          method=Vunet.encode_appearance)
    our_img = model.apply(params, jnp.asarray(y), mu_ours, cov=0.0,
                          method=Vunet.decode_shape)
    assert np.abs(np.asarray(our_img).transpose(0, 3, 1, 2) - ref_img).max() < 5e-2


def test_heatmap_targets_crossval(ref):
    from future_urban_scene_generation_tpu.ops.heatmap import kpoint_to_heatmap

    ref_fn = ref["utils.keypoint_utils"].kpoint_to_heatmap
    for kp in ([0.3, 0.7], [0.9, 0.1], [-1.0, -1.0]):
        r = ref_fn(np.asarray(kp, np.float64), (64, 64), sigma=2.0)
        o = np.asarray(kpoint_to_heatmap(jnp.asarray(np.float32(kp)), (64, 64), 2.0))
        np.testing.assert_allclose(o, r, atol=1e-5)


def test_metrics_crossval(ref):
    import importlib

    from future_urban_scene_generation_tpu.ops.metrics import edge_accuracy, psnr

    m = importlib.import_module("edgeconnect.metrics")
    a = rng.rand(16, 16).astype(np.float32) * 255
    b = rng.rand(16, 16).astype(np.float32) * 255
    ref_psnr = m.PSNR(255.0)(torch.from_numpy(a), torch.from_numpy(b))
    assert abs(float(psnr(jnp.asarray(a), jnp.asarray(b), 255.0)) - float(ref_psnr)) < 1e-3

    e1 = (rng.rand(16, 16) > 0.7).astype(np.float32)
    e2 = (rng.rand(16, 16) > 0.7).astype(np.float32)
    rp, rr = m.EdgeAccuracy(0.5)(torch.from_numpy(e1), torch.from_numpy(e2))
    op, orr = edge_accuracy(jnp.asarray(e1), jnp.asarray(e2), 0.5)
    assert abs(float(op) - float(rp)) < 1e-5
    assert abs(float(orr) - float(rr)) < 1e-5


def test_image_ref_to_crop_ref_crossval(ref):
    from future_urban_scene_generation_tpu.ops.crop import image_ref_to_crop_ref
    from future_urban_scene_generation_tpu.utils.keypoints import KEYPOINT_NAMES

    ref_fn = ref["utils.crop_utils"].image_ref_to_crop_ref
    kps = rng.rand(12, 2) * 400 - 50  # some will fall outside the crop
    kps[3] = [-1, -1]  # missing marker
    d = {n: tuple(kps[i]) for i, n in enumerate(KEYPOINT_NAMES)}
    for normalize in (False, True):
        r = ref_fn(d, crop_tl=(40, 30), crop_pad=(5, 8), crop_shape=(200, 200, 3),
                   normalize=normalize)
        o = image_ref_to_crop_ref(kps.copy(), (40, 30), (5, 8), (200, 200, 3),
                                  normalize)
        for i, n in enumerate(KEYPOINT_NAMES):
            np.testing.assert_allclose(
                np.asarray(o[i], np.float64), np.asarray(r[n], np.float64),
                atol=1e-9, err_msg=n,
            )


def test_icn_input_assembly_crossval(ref):
    """Channel order + LAB normalization of the 21-channel ICN input vs the
    reference's own conversion chain (warp_learn/models.py:353-364).

    The reference converts sketch/central with COLOR_RGB2LAB but planes with
    COLOR_BGR2LAB (planes_to_torch) — the channel inconsistency PARITY.md §6
    documents. This framework is RGB throughout, so the planes comparison feeds
    the reference the channel-swapped image: passing makes the documented
    convention mapping executable.
    """
    import cv2

    from future_urban_scene_generation_tpu.ops import colorspace as cs

    pu = ref["warp_learn.planes_utils"]
    img_u8 = (rng.rand(64, 64, 3) * 255).astype(np.uint8)

    def ours_signed_lab(rgb_u8):
        return np.asarray(
            cs.rgb_to_lab(jnp.asarray(rgb_u8.astype(np.float32) / 255.0)) * 2.0 - 1.0
        )

    # Sketch/central path: RGB2LAB + ToTensor + Normalize(0.5, 0.5).
    ref_lab = cv2.cvtColor(img_u8, cv2.COLOR_RGB2LAB).astype(np.float32) / 255.0
    ref_signed = ref_lab * 2.0 - 1.0
    ours = ours_signed_lab(img_u8)
    assert np.abs(ours - ref_signed).max() < 0.03  # cv2 LUT quantization

    # Planes path: the reference applies COLOR_BGR2LAB, so its input must be the
    # channel-swapped image to produce the same LAB texture as our RGB pipeline.
    planes_ref = pu.planes_to_torch([img_u8[..., ::-1]], to_LAB=True).numpy()
    ours_plane = ours_signed_lab(img_u8).transpose(2, 0, 1)
    assert np.abs(ours_plane - planes_ref[0]).max() < 0.03

    # 21-channel concat order: [sketch | central | 5 planes] (models.py:364) ==
    # stages.icn_synthesize input layout.
    from future_urban_scene_generation_tpu.pipeline import stages

    sketch = rng.rand(256, 256, 3).astype(np.float32)
    central = rng.rand(256, 256, 3).astype(np.float32) * 2 - 1
    planes = rng.rand(5, 256, 256, 3).astype(np.float32) * 2 - 1
    sketch_lab = np.asarray(stages._to_signed_lab(jnp.asarray(sketch)))
    expected = np.concatenate(
        [sketch_lab, central] + [planes[i] for i in range(5)], axis=-1
    )
    got = np.asarray(
        jnp.concatenate(
            [stages._to_signed_lab(jnp.asarray(sketch)), jnp.asarray(central),
             jnp.concatenate(list(jnp.asarray(planes)), axis=-1)], axis=-1,
        )
    )
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_vunet128_real_network_parity(ref):
    """The vunet_256=False (128^2) variant — one fewer down/up stage."""
    import argparse
    import importlib
    import tempfile

    from future_urban_scene_generation_tpu.models.vunet import Vunet
    from future_urban_scene_generation_tpu.pipeline.checkpoint import (
        load_torch_checkpoint,
    )

    vlayers = importlib.import_module("vunet.layers")
    if not getattr(vlayers.Sampler, "_cov0_patched", False):
        _orig = vlayers.Sampler.forward

        def _fwd0(self, x, cov=0.0):
            return _orig(self, x, cov)

        vlayers.Sampler.forward = _fwd0
        vlayers.Sampler._cov0_patched = True

    args = argparse.Namespace(up_mode="subpixel", w_norm=True, drop_prob=0.0,
                              vunet_256=False)
    tnet = ref["vunet.models"].Vunet_fix_res(args).eval()
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "v.pth"
        torch.save(tnet.state_dict(), p)
        params, _ = load_torch_checkpoint(p)

    x = rng.rand(1, 128, 128, 6).astype(np.float32) * 2 - 1
    y = rng.rand(1, 128, 128, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        yt = torch.from_numpy(y.transpose(0, 3, 1, 2))
        out_up, skips_up = tnet.forward_enc_up(xt)
        mu_app, _ = tnet.forward_enc_down(out_up, skips_up)
        dec_up, skips_dec = tnet.forward_dec_up(yt)
        ref_img = tnet.forward_dec_down(dec_up, skips_dec, mu_app)[0].numpy()
    model = Vunet(vunet_256=False)
    mu_ours = model.apply(params, jnp.asarray(x), cov=0.0,
                          method=Vunet.encode_appearance)
    our_img = model.apply(params, jnp.asarray(y), mu_ours, cov=0.0,
                          method=Vunet.decode_shape)
    assert np.abs(np.asarray(our_img).transpose(0, 3, 1, 2) - ref_img).max() < 5e-2


def test_discriminators_real_network_parity(ref):
    """The REAL GAN discriminators through the converter: the ICN's multi-scale
    PatchGAN (warp_learn/models.py:211-259) and EdgeConnect's spectral-norm
    PatchGAN with feature taps (networks.py:138-181, eval-folded)."""
    from future_urban_scene_generation_tpu.models.convert import convert_state_dict
    from future_urban_scene_generation_tpu.models.edgeconnect import ECDiscriminator
    from future_urban_scene_generation_tpu.models.icn import DNLayersMulti

    wm = ref["warp_learn.models"]
    tdis = wm.D_NLayersMulti(input_nc=3, ndf=16, n_layers=2, num_D=2).eval()
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = tdis(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    params = convert_state_dict(tdis.state_dict())
    ours = DNLayersMulti(input_nc=3, ndf=16, n_layers=2).apply(params, jnp.asarray(x))
    for r, o in zip(ref_outs, ours):
        rn = r.numpy()
        on = np.asarray(o).transpose(0, 3, 1, 2)
        scale = max(1.0, np.abs(rn).max())
        assert np.abs(on - rn).max() / scale < 5e-3

    nets = ref["edgeconnect.networks"]
    tec = nets.Discriminator(in_channels=3, use_sigmoid=True,
                             use_spectral_norm=True).eval()
    with torch.no_grad():
        ref_out, ref_feats = tec(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    params = convert_state_dict(tec.state_dict())
    our_out, our_feats = ECDiscriminator(in_channels=3, use_sigmoid=True).apply(
        params, jnp.asarray(x)
    )
    assert np.abs(np.asarray(our_out).transpose(0, 3, 1, 2) - ref_out.numpy()).max() < 5e-3
    assert len(our_feats) == len(ref_feats)
    for r, o in zip(ref_feats, our_feats):
        rn = r.numpy()
        on = np.asarray(o).transpose(0, 3, 1, 2)
        scale = max(1.0, np.abs(rn).max())
        assert np.abs(on - rn).max() / scale < 5e-3
