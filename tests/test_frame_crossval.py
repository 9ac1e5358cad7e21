"""FRAME-LEVEL cross-validation: execute the reference's own ``traj_test``
(trajectory_inference.py:39-475) end-to-end — perception stubs feeding its real
crop/PnP/visibility/warp/generator/stitch/composite math — and compare the final
composited future frames against this framework's ``synthesize_scene``.

The reference's Open3D renderer cannot run here, so ``get_rendered``
(warp_learn/render_open3d.py:29-50) is stubbed with THIS repo's rasterizer output
at full frame resolution — everything else of the reference executes unmodified
(read-only, never copied). Both sides share: the frame, the CAD mesh, identical
decoded 2D keypoints, the same trajectory rows, and THE SAME generator weights —
either a shared random torch init or (weights="trained", FUSG_TRAINED_ZOO) a
framework-trained zoo exported to the reference's .pth layout.

This pins the INTEGRATION ORDER (crop -> generator -> inverse-stitch coordinates
-> mask composite, trajectory_inference.py:185-198, 369-442, 461-473), not just
the already-crossvalidated pieces.
"""
import os
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

REF = Path("/root/reference")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(), reason="reference not mounted"),
]

rng = np.random.RandomState(7)

_REF_TOPLEVEL = {"utils", "warp_learn", "vunet", "stacked_hourglass", "edgeconnect"}

H, W = 360, 640
K_CAM = np.array([[420.0, 0, W / 2], [0, 420.0, H / 2], [0, 0, 1]], np.float64)


def _install_stubs():
    """open3d + torchvision stand-ins sufficient to import trajectory_inference."""
    created = []
    if "open3d" not in sys.modules:
        o3d = types.ModuleType("open3d")
        geom = types.ModuleType("open3d.geometry")
        util = types.ModuleType("open3d.utility")
        visu = types.ModuleType("open3d.visualization")

        class TriangleMesh:  # annotation target only
            pass

        geom.TriangleMesh = TriangleMesh
        util.Vector3dVector = lambda a: np.array(a, np.float64)
        # Annotation targets inside render_open3d (get_rendered itself is stubbed).
        visu.VisualizerWithKeyCallback = type("VisualizerWithKeyCallback", (), {})
        visu.Visualizer = type("Visualizer", (), {})
        visu.MeshColorOption = type("MeshColorOption", (), {"Color": 1})
        o3d.geometry, o3d.utility, o3d.visualization = geom, util, visu
        for name, mod in (("open3d", o3d), ("open3d.geometry", geom),
                          ("open3d.utility", util), ("open3d.visualization", visu)):
            sys.modules[name] = mod
            created.append(name)

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        feat = types.ModuleType("skimage.feature")

        def _no_canny(*a, **k):
            raise RuntimeError("skimage unavailable (inpaint path unused here)")

        feat.canny = _no_canny
        sk.feature = feat
        for name, mod in (("skimage", sk), ("skimage.feature", feat)):
            sys.modules[name] = mod
            created.append(name)

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        fn = types.ModuleType("torchvision.transforms.functional")

        class ToTensor:
            def __call__(self, img):
                t = torch.from_numpy(np.ascontiguousarray(np.asarray(img)))
                if t.dtype == torch.uint8:
                    t = t.float() / 255.0
                return t.permute(2, 0, 1)

        def normalize(tensor, mean, std):
            mean = torch.as_tensor(mean, dtype=tensor.dtype)[:, None, None]
            std = torch.as_tensor(std, dtype=tensor.dtype)[:, None, None]
            return (tensor - mean) / std

        class Normalize:
            def __init__(self, mean, std):
                self.mean, self.std = mean, std

            def __call__(self, tensor):
                return normalize(tensor, self.mean, self.std)

        tr.ToTensor = ToTensor
        tr.Normalize = Normalize
        tr.transforms = tr  # `from torchvision.transforms import transforms`
        fn.normalize = normalize
        tv.transforms = tr
        for name, mod in (("torchvision", tv), ("torchvision.transforms", tr),
                          ("torchvision.transforms.functional", fn)):
            sys.modules[name] = mod
            created.append(name)
    return created


@pytest.fixture(scope="module")
def ref_traj():
    sys.path.insert(0, str(REF))
    created = _install_stubs()
    # The reference uses removed aliases/attrs: np.float (numpy>=1.24) and
    # pathlib's private _cparts (removed in 3.12).
    had_npfloat = hasattr(np, "float")
    if not had_npfloat:
        np.float = float  # noqa: NPY001
    import pathlib

    had_cparts = hasattr(pathlib.PurePath, "_cparts")
    if not had_cparts:
        pathlib.PurePath._cparts = property(lambda self: list(self.parts))

    import importlib

    mods = {
        n: importlib.import_module(n)
        for n in (
            "trajectory_inference", "utils.crop_utils", "utils.keypoint_utils",
            "warp_learn.vehicle_utils", "warp_learn.models", "vunet.models",
            "vunet.layers",
        )
    }

    # Deterministic VUNet sampling (cov=0 == our inference mode, PARITY.md §7).
    vlayers = mods["vunet.layers"]
    if not getattr(vlayers.Sampler, "_cov0_patched", False):
        orig = vlayers.Sampler.forward
        vlayers.Sampler.forward = lambda self, x, cov=0.0: orig(self, x, cov)
        vlayers.Sampler._cov0_patched = True

    # Newer torch forbids the reference CPC's in-place writes into leaf
    # Parameters (cpc.py:9-23); same out-of-place scaffolding as
    # test_reference_crossval.test_pnp_crossval — not a behavior change.
    cpc_mod = importlib.import_module("utils.cpc")
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

    yield mods

    sys.path.remove(str(REF))
    for k in list(sys.modules):
        if k.split(".")[0] in _REF_TOPLEVEL or k == "trajectory_inference":
            del sys.modules[k]
    # (created stub modules below include skimage/open3d/torchvision entries)
    for name in created:
        sys.modules.pop(name, None)
    if not had_npfloat:
        del np.float
    if not had_cparts:
        del pathlib.PurePath._cparts


class _FakePly:
    def __init__(self, vertices):
        self.vertices = np.array(vertices, np.float64)


class _FakeCap:
    def set(self, *a):  # traj_test resets the capture position per vehicle
        return None


class _ConstCad(torch.nn.Module):
    def forward(self, x):
        out = torch.zeros(1, 10)
        out[0, 0] = 10.0
        return out


class _ConstKP(torch.nn.Module):
    def __init__(self, heat):
        super().__init__()
        self.heat = heat  # (1, 12, 64, 64)

    def forward(self, x):
        return {"heatmaps": [self.heat]}


def _our_rasterizer_get_rendered(tris, get_normals):
    """Stub for render_open3d.get_rendered: full-frame normal sketch + mask from
    this repo's rasterizer (the documented substitution for Open3D)."""
    from future_urban_scene_generation_tpu.render import rasterizer as rz

    def fake(ply, w, h, extrinsic, intrinsic):
        verts = jnp.asarray(np.asarray(ply.vertices, np.float32))
        normals = jnp.asarray(get_normals(np.asarray(ply.vertices, np.float64)))
        cam = rz.Camera.from_intrinsic(jnp.asarray(np.float32(intrinsic)))
        sketch, bg = rz.render_normal_sketch(
            verts, jnp.asarray(tris), normals,
            jnp.asarray(np.float32(extrinsic)), cam, (h, w),
        )
        img = (np.asarray(sketch) * 255.0).astype(np.uint8)
        return img, np.asarray(bg)

    return fake


@pytest.mark.parametrize("weights", ["random", "trained"])
def test_traj_test_composite_crossval(ref_traj, tmp_path, monkeypatch, weights):
    """``weights="random"``: the historical worst-case crossval — shared
    RANDOM-init generators chaotically amplify sub-pixel resample deltas
    (floors 0.96/0.98, attribution in PARITY.md). ``weights="trained"``: the
    SAME scene with generators trained in this framework (cli/train.py),
    exported to the reference's .pth layout (tools/export_zoo.py) and loaded
    into BOTH sides — the measurement the 0.99 north-star hypothesis rests on
    (VERDICT r4 #1). Set FUSG_TRAINED_ZOO to the exported checkpoint tree;
    skipped otherwise. Measured band (see PARITY.md "Fidelity attribution"):
    trained weights lift the per-frame floor because smooth generators are
    Lipschitz-tame on the ~1e-2 input deltas random ones amplify."""
    from future_urban_scene_generation_tpu.geometry.projection import (
        project_points_extrinsic,
    )
    from future_urban_scene_generation_tpu.geometry import gps
    from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
    from future_urban_scene_generation_tpu.models.convert import convert_state_dict
    from future_urban_scene_generation_tpu.ops import crop as cr
    from future_urban_scene_generation_tpu.ops.metrics import ssim
    from future_urban_scene_generation_tpu.pipeline import runner, stages
    from future_urban_scene_generation_tpu.pipeline.checkpoint import (
        load_torch_checkpoint,
    )
    from future_urban_scene_generation_tpu.utils.bbox import BoundingBox
    from future_urban_scene_generation_tpu.utils.keypoints import KEYPOINT_NAMES
    from future_urban_scene_generation_tpu.utils import mesh as mu

    ti = ref_traj["trajectory_inference"]
    vu = ref_traj["warp_learn.vehicle_utils"]
    sq = ref_traj["utils.crop_utils"].square_crop_from_bbox

    # ---------------- shared scene ----------------
    mesh, kp3d_unit = mu.make_test_car(subdiv=2)
    kp3d_scaled = np.asarray(kp3d_unit, np.float64) * 5.0
    verts_scaled = np.asarray(mesh.vertices, np.float64) * 5.0
    tris = np.asarray(mesh.triangles, np.int32)

    def normals_of(verts):
        return mu.compute_vertex_normals(mu.TriangleMesh(verts, tris)).astype(
            np.float32
        )

    # Pose pitch: -pi/3. Until round 5 this was -pi/2.3, which put the
    # REFERENCE'S OWN CPC PnP in a wrong convergence basin (reprojection error
    # 373 vs our solver's 0.17 on identical keypoints; its best-of-4-restarts
    # R was ~90deg off GT) — the frame comparison then measured the
    # reference's pose failure, not implementation parity, and the bad pose
    # made its per-step loop silently break after step 1 (frames 2-5 were raw
    # background on the ref side; its bare try/excepts hid both,
    # trajectory_inference.py:252-253,444-445). At -pi/3 both solvers agree
    # with GT (ref err 0.48, ours 0.22 — measured sweep in the round-5 notes,
    # PARITY.md "Fidelity attribution") and the recorder below verifies the
    # reference really synthesizes every step. The old adversarial pose is
    # kept as an explicit robustness pin: test_pnp_robustness_advantage.
    ext = np.eye(4)
    ext[:3, :3] = np.asarray(
        x_rot(jnp.float64(-np.pi / 3.0)) @ z_rot(jnp.float64(0.7)), np.float64
    )
    ext[:3, 3] = [0.5, 2.0, 22.0]
    rvec_gt = None  # reference recovers pose itself via CPC

    kp2d_gt = np.asarray(
        project_points_extrinsic(
            jnp.asarray(np.float32(kp3d_scaled)),
            jnp.asarray(np.float32(K_CAM)),
            jnp.asarray(np.float32(ext)),
        )
    )
    x0, y0 = kp2d_gt.min(0) - 6
    x1, y1 = kp2d_gt.max(0) + 6
    bbox_xyxy = [float(int(x0)), float(int(y0)), float(int(x1)), float(int(y1))]

    # Structured background so stitch misalignment shows up in SSIM.
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    bg_f = np.stack([xx / W, yy / H, 0.5 + 0.3 * np.sin(xx / 17) * np.cos(yy / 13)], -1)
    bg_u8 = (np.clip(bg_f, 0, 1) * 255).astype(np.uint8)
    frame_u8 = bg_u8.copy()
    fy0, fy1 = int(y0), min(int(y1), H)
    fx0, fx1 = int(x0), min(int(x1), W)
    frame_u8[fy0:fy1, fx0:fx1] = (
        rng.rand(max(fy1 - fy0, 0), max(fx1 - fx0, 0), 3) * 255
    ).astype(np.uint8)  # "vehicle" texture for the plane warps

    # Trajectory rows [frame, id, x, y, w, h, ...] — straight-ish motion.
    T = 6
    rows = []
    bw, bh = bbox_xyxy[2] - bbox_xyxy[0], bbox_xyxy[3] - bbox_xyxy[1]
    for t in range(T):
        rows.append([1 + 2 * t, 3, bbox_xyxy[0] + 8 * t, bbox_xyxy[1] + 2 * t,
                     bw, bh, 1, -1, -1, -1])
    trajectories = [np.asarray(rows, np.float64)]
    inv_h = np.array([[1.2e-5, 1e-6, 45.0], [-8e-7, 1.1e-5, 11.0], [0, 0, 1.0]])

    # ---------------- oracle keypoints via crafted heatmaps ----------------
    crop_ref, xy_min, xy_pad, _, _, _ = sq(frame_u8, bbox_xyxy)
    bbox_w = crop_ref.shape[1]
    kp_norm = (kp2d_gt - np.asarray(xy_min) + np.asarray(xy_pad)) / bbox_w
    cells = np.clip((kp_norm * 64).astype(int), 0, 63)  # heatmap grid cells
    heat = torch.zeros(1, 12, 64, 64)
    for i, (cx, cy) in enumerate(cells):
        heat[0, i, cy, cx] = 1.0
    # What the reference's get_maxima decodes (nearest-upsample argmax => cell/64),
    # mapped back to frame coordinates — BOTH sides consume exactly these.
    kp_decoded = cells / 64.0 * bbox_w + np.asarray(xy_min) - np.asarray(xy_pad)

    # ---------------- shared generators (random or trained) ----------------
    zoo = os.environ.get("FUSG_TRAINED_ZOO")
    if weights == "trained" and not zoo:
        pytest.skip(
            "FUSG_TRAINED_ZOO unset — train + export first "
            "(cli/train.py --model icn/vunet; tools/export_zoo.py)"
        )
    wm = ref_traj["warp_learn.models"]
    torch.manual_seed(0)
    t_icn = wm.G_Resnet(input_nc=21, output_nc=3, num_downs=2, n_res=3, ngf=64,
                        norm="inst", nl_layer="relu").eval()
    import argparse as ap

    t_vunet = ref_traj["vunet.models"].Vunet_fix_res(
        ap.Namespace(up_mode="subpixel", w_norm=True, drop_prob=0.0, vunet_256=True)
    ).eval()
    if weights == "trained":
        # The exported tree IS the reference's checkpoint layout
        # (run_test.py:76-87): load it into the reference nets the way
        # run_test.py does, and into our side through the converter — both
        # sides then carry the SAME trained weights.
        t_icn.load_state_dict(torch.load(
            Path(zoo) / "icn" / "256_synth" / "gnet_00020.pth",
            map_location="cpu", weights_only=False,
        ))
        t_vunet.load_state_dict(torch.load(
            Path(zoo) / "vunet" / "256" / "vunet.pth",
            map_location="cpu", weights_only=False,
        ))
    icn_params = convert_state_dict(t_icn.state_dict())
    vp = tmp_path / "vunet.pth"
    torch.save(t_vunet.state_dict(), vp)
    vunet_params, _ = load_torch_checkpoint(vp)

    # ---------------- reference side: the real traj_test ----------------
    monkeypatch.setattr(vu, "get_rendered", _our_rasterizer_get_rendered(tris, normals_of))

    video_dir = tmp_path / "train" / "S01" / "c001"
    video_dir.mkdir(parents=True)
    import cv2

    cv2.imwrite(str(video_dir / "background_frame.png"), bg_u8)
    np.save(tmp_path / "intrinsic.npy", K_CAM)
    args = ap.Namespace(video_dir=video_dir, device="cpu")

    kp3d_dict = {n: np.asarray(kp3d_unit[i], np.float64)
                 for i, n in enumerate(KEYPOINT_NAMES)}

    # Pre-flight: traj_test swallows errors in bare try/excepts — run the whole
    # t=0 Warp&Learn + VUNet chain once unguarded (with the GT pose standing in
    # for the PnP result) so wiring failures surface with tracebacks.
    ku = ref_traj["utils.keypoint_utils"]
    pu_mods = ref_traj["warp_learn.models"]
    import importlib as _il

    pu = _il.import_module("warp_learn.planes_utils")
    ov = _il.import_module("warp_learn.online_visibility")
    ply = _FakePly(verts_scaled)
    img_r, mask_r = vu.get_rendered(ply, W, H, ext, K_CAM)
    assert img_r.shape == (H, W, 3) and mask_r.shape == (H, W)
    assert (~mask_r).sum() > 200  # vehicle visible
    kp3d_dict_scaled = {n: np.asarray(kp3d_scaled[i], np.float64)
                        for i, n in enumerate(KEYPOINT_NAMES)}
    central = vu.get_central_crop(bbox_xyxy, frame_u8, 256, 256)
    s_sk, s_mask, s_planes, s_kp, s_vis = vu.get_vehicle_information(
        ply, frame_u8, ext, K_CAM,
        ku.kpoints_array_to_dict(kp_decoded), kp3d_dict_scaled,
    )
    warped, _ = pu.warp_unwarp_planes(
        s_planes, s_kp, s_kp, s_vis, s_vis, "car", ov.pascal_texture_planes
    )
    icn_in, crop_info = pu_mods.get_icn_inputs(
        warped, s_sk, np.logical_not(s_mask), central, 256, 256
    )
    with torch.no_grad():
        net_img = pu.to_image(t_icn(icn_in)[0], from_LAB=True)
    assert net_img.shape == (256, 256, 3)

    monkeypatch.chdir(tmp_path)
    dump = os.environ.get("FUSG_CROSSVAL_DUMP")

    # Record the EXACT 21ch inputs the reference feeds its ICN per step. Two
    # jobs: (a) the all-steps guard below — the reference's bare per-step
    # try/except (trajectory_inference.py:444-445) can silently break out of
    # the future loop, leaving frames 2-5 as raw background and turning the
    # later-frame SSIMs into vehicle-vs-nothing comparisons (this HAPPENED
    # with the pre-round-5 pose; see the pose comment above); (b) with
    # FUSG_CROSSVAL_DUMP set, the input-side ground truth for attributing
    # generator divergence separately from input deltas.
    ref_icn_inputs: list = []

    class _Recorder(torch.nn.Module):
        def __init__(self, net):
            super().__init__()
            self.net = net

        def forward(self, x):
            ref_icn_inputs.append(x.detach().cpu().numpy().copy())
            return self.net(x)

    icn_for_ref = _Recorder(t_icn)
    # NOT under torch.no_grad(): the reference's CPC PnP differentiates through
    # torch autograd (utils/cpc.py:24-37); its perception block guards itself.
    ti.traj_test(
        args, _FakeCap(), 1, frame_u8.copy(), [bbox_xyxy], trajectories,
        inv_h, 1.0, 1.0, "cpu", None, None, None, None,
        _ConstCad(), _ConstKP(heat), icn_for_ref, t_vunet,
        [ply], [kp3d_dict], False,
    )
    assert len(ref_icn_inputs) == T, (
        f"reference synthesized only {len(ref_icn_inputs)}/{T} steps — its "
        "silent per-step break fired; the comparison would be vacuous"
    )
    ref_icn = np.stack([
        cv2.imread(str(tmp_path / "results" / "warp&learn" / "S01_c001" / f"{i:04}.png"))
        for i in (1, 3, 5, 7, 9, 11)
    ]).astype(np.float32) / 255.0
    ref_vun = np.stack([
        cv2.imread(str(tmp_path / "results" / "vunet" / "S01_c001" / f"{i:04}.png"))
        for i in (1, 3, 5, 7, 9, 11)
    ]).astype(np.float32) / 255.0
    # The silent try/excepts must not have skipped the work: step-0 must differ
    # from the raw background inside the vehicle region.
    veh_region = ~mask_r
    assert np.abs(ref_icn[0] - bg_u8.astype(np.float32) / 255.0)[veh_region].max() > 0.05, \
        "reference traj_test silently skipped the vehicle (check stubs)"

    # ---------------- our side ----------------
    old_spec = dict(stages.MODEL_SPEC)
    try:
        stages.configure_models(reference_channel_order=True, warp_plane_res=256,
                                generator_dtype="float32")
        cad_bank = runner.build_cad_bank([mesh], [np.float32(kp3d_unit)], scale=5.0)
        frame_rgb = jnp.asarray(frame_u8[..., ::-1].astype(np.float32) / 255.0)
        bg_rgb = jnp.asarray(bg_u8[..., ::-1].astype(np.float32) / 255.0)
        bboxes_j = jnp.asarray(np.float32([bbox_xyxy]))
        window = jax.vmap(cr.square_window_from_bbox)(bboxes_j)
        crops = jax.vmap(lambda w_: cr.crop_resize(frame_rgb, w_, 256))(window)
        perception = stages.Perception(
            cad_idx=jnp.zeros(1, jnp.int32),
            kp_frame=jnp.asarray(np.float32(kp_decoded))[None],
            window=window,
            crop=crops,
        )
        # Meters exactly as SceneService builds them (pipeline/service.py:186-212).
        mid_bottoms = np.stack([
            BoundingBox(*r[2:6], bounds=(0, W - 1, 0, H - 1), scale=1.0).mid_bottom
            for r in rows
        ]).astype(np.float64)
        meters = gps.trajectory_to_meters(mid_bottoms, inv_h)[None]

        models = stages.Models(
            cad_params={}, hourglass_params={},
            icn_params=icn_params, vunet_params=vunet_params,
        )
        result = runner.synthesize_scene(
            models, cad_bank, frame_rgb, bg_rgb, perception,
            jnp.asarray(np.float32(meters)), jnp.asarray(np.float32(K_CAM)),
        )
        ours_icn_inputs = None
        if dump:
            # Reconstruct OUR side's 21ch ICN input exactly as _generate_core
            # assembles it (geometry outputs + plane warps + signed-LAB concat)
            # so the input-side delta between implementations is measurable
            # directly, independent of the generators that amplify it.
            geom = runner._scene_geometry(
                models, cad_bank, frame_rgb, perception,
                jnp.asarray(np.float32(meters)), jnp.asarray(np.float32(K_CAM)),
            )
            (sketches, veh_masks, win_fields, visibilities, polys,
             src_packed, central_lab, src_win_fields, _err) = geom
            src_window0 = stages.cr.Window(*(f[0] for f in src_win_fields))

            def _warp_step(window_fields_s, vis_s, polys_s):
                return stages.warp_planes_to_crop(
                    src_packed[0], src_window0, polys[0][0], polys_s,
                    visibilities[0][0], vis_s,
                    stages.cr.Window(*window_fields_s),
                )

            planes_v0 = jax.vmap(_warp_step)(
                tuple(f[0] for f in win_fields), visibilities[0], polys[0]
            )  # (S, 5, 256, 256, 3) signed LAB
            sketch_lab = stages._to_signed_lab(sketches[0])  # (S, 256, 256, 3)
            planes_cat = jnp.moveaxis(planes_v0, 1, 3).reshape(
                planes_v0.shape[:1] + planes_v0.shape[2:4] + (-1,)
            )
            central_rep = jnp.repeat(central_lab, sketch_lab.shape[0], axis=0)
            ours_icn_inputs = np.asarray(
                jnp.concatenate([sketch_lab, central_rep, planes_cat], axis=-1)
            )  # (S, 256, 256, 21) — NHWC; reference records NCHW
    finally:
        stages.MODEL_SPEC.update(old_spec)

    ours_icn = np.asarray(result.frames_icn)[..., ::-1]  # RGB -> BGR like cv2
    ours_vun = np.asarray(result.frames_vunet)[..., ::-1]

    icn_ssims = [float(ssim(jnp.asarray(ours_icn[i]), jnp.asarray(ref_icn[i])))
                 for i in range(6)]
    vun_ssims = [float(ssim(jnp.asarray(ours_vun[i]), jnp.asarray(ref_vun[i])))
                 for i in range(6)]
    print("frame SSIM icn:", [f"{v:.4f}" for v in icn_ssims])
    print("frame SSIM vunet:", [f"{v:.4f}" for v in vun_ssims])

    # Attribution hook (tools/fidelity_attribution.py): dump both sides'
    # frames + the vehicle mask so the SSIM deficit can be localized offline,
    # plus both sides' per-step ICN INPUT tensors (ours NHWC, ref NCHW) so
    # input-side deltas separate from generator amplification.
    if dump:
        os.makedirs(dump, exist_ok=True)
        extra = {}
        if ours_icn_inputs is not None and ref_icn_inputs:
            extra = dict(
                ours_icn_inputs=ours_icn_inputs,
                ref_icn_inputs=np.concatenate(ref_icn_inputs, axis=0),
            )
        np.savez_compressed(
            os.path.join(dump, f"crossval_frames_{weights}.npz"),
            ref_icn=ref_icn, ref_vun=ref_vun, ours_icn=ours_icn,
            ours_vun=ours_vun, veh_mask=np.asarray(veh_region),
            bg=bg_u8, icn_ssims=np.asarray(icn_ssims),
            vun_ssims=np.asarray(vun_ssims), **extra,
        )

    # Full-frame SSIM floors = measured minima minus a small tolerance
    # (VERDICT r4 #8), on the corrected pose where the reference's own CPC
    # converges (see the pose comment above; full history in PARITY.md
    # "Fidelity attribution").
    # random (round-5 measured): icn 0.9866-0.9959, vunet 0.9904-0.9972 —
    # random-weight generators amplify the ~1e-2 input deltas (sketch IoU
    # 0.95 at s0, degrading to 0.84 at s5 as the two sides' slightly
    # different PnP minima compound through the rollout).
    # trained (round-5 measured, framework-trained weights in BOTH sides via
    # the exported .pth zoo): icn 0.9937-0.9970 — the ICN branch MEETS the
    # SSIM>=0.99 north star; vunet 0.9873-0.9965, worst frame 0.987 where
    # the appearance path sees the pose-seed delta (both solvers converge on
    # this scene, to minima 0.48 vs 0.22 px reprojection — a seed
    # difference, not an implementation infidelity; the rollout magnifies it
    # with step index, and VUNet's masked-appearance crop is window-aligned
    # to that pose).
    icn_floor, vun_floor = {
        "random": (0.985, 0.988),
        "trained": (0.99, 0.985),
    }[weights]
    assert min(icn_ssims) > icn_floor, icn_ssims
    assert min(vun_ssims) > vun_floor, vun_ssims

    # And the integration actually synthesized a vehicle on our side too.
    assert np.abs(ours_icn[0] - np.asarray(bg_rgb)[..., ::-1])[veh_region].max() > 0.05


def test_pnp_robustness_advantage(ref_traj):
    """The crossval scene's PRE-round-5 pose (pitch -pi/2.3, a steep
    overhead view) is a measured failure case for the reference's own CPC
    PnP: its best-of-4-canonical-restarts LM lands in a wrong basin
    (reprojection error ~373, R ~90deg off GT) while this framework's
    vmapped-restart solver recovers the true pose (err ~0.2) from identical
    quantized keypoints. Pinned here (a) as the documented reason the frame
    crossval moved to -pi/3 — final-frame parity is only meaningful where
    the reference itself succeeds — and (b) as a robustness advantage of
    the branchless solver (geometry/pnp.py) over utils/cpc.py:47-135 +
    pnp_utils.py:43-130 on steep viewing angles."""
    import importlib

    from future_urban_scene_generation_tpu.geometry.projection import (
        project_points_extrinsic,
    )
    from future_urban_scene_generation_tpu.geometry.rotations import (
        rodrigues_to_matrix,
        x_rot,
        z_rot,
    )
    from future_urban_scene_generation_tpu.ops import crop as cr
    from future_urban_scene_generation_tpu.pipeline import runner, stages
    from future_urban_scene_generation_tpu.utils import mesh as mu

    sq = ref_traj["utils.crop_utils"].square_crop_from_bbox
    pnp_utils = importlib.import_module("utils.pnp_utils")
    import cv2

    mesh, kp3d_unit = mu.make_test_car(subdiv=2)
    kp3d_scaled = np.asarray(kp3d_unit, np.float64) * 5.0
    ext = np.eye(4)
    ext[:3, :3] = np.asarray(
        x_rot(jnp.float64(-np.pi / 2.3)) @ z_rot(jnp.float64(0.7)), np.float64
    )
    ext[:3, 3] = [0.5, 2.0, 22.0]
    kp2d_gt = np.asarray(
        project_points_extrinsic(
            jnp.asarray(np.float32(kp3d_scaled)),
            jnp.asarray(np.float32(K_CAM)),
            jnp.asarray(np.float32(ext)),
        )
    )
    x0, y0 = kp2d_gt.min(0) - 6
    x1, y1 = kp2d_gt.max(0) + 6
    bbox = [float(int(x0)), float(int(y0)), float(int(x1)), float(int(y1))]
    crop_ref, xy_min, xy_pad, _, _, _ = sq(np.zeros((H, W, 3), np.uint8), bbox)
    bw = crop_ref.shape[1]
    cells = np.clip(
        ((kp2d_gt - np.asarray(xy_min) + np.asarray(xy_pad)) / bw * 64).astype(int),
        0, 63,
    )
    kp_dec = cells / 64.0 * bw + np.asarray(xy_min) - np.asarray(xy_pad)

    err_ref, rv_ref, _tv_ref = pnp_utils.cpc_rodr_4_angles(
        [K_CAM[0, 0], K_CAM[1, 1]], [K_CAM[0, 2], K_CAM[1, 2]],
        kp_dec, kp3d_scaled,
    )
    r_ref = cv2.Rodrigues(np.asarray(rv_ref, np.float64))[0]

    cad_bank = runner.build_cad_bank([mesh], [np.float32(kp3d_unit)], scale=5.0)
    window = jax.vmap(cr.square_window_from_bbox)(jnp.asarray(np.float32([bbox])))
    perc = stages.Perception(
        cad_idx=jnp.zeros(1, jnp.int32),
        kp_frame=jnp.asarray(np.float32(kp_dec))[None],
        window=window, crop=jnp.zeros((1, 256, 256, 3)),
    )
    err_ours, rv_ours, _tv = stages.solve_poses(
        perc, cad_bank, jnp.asarray(np.float32(K_CAM))
    )
    r_ours = np.asarray(rodrigues_to_matrix(rv_ours[0]))

    assert float(err_ref) > 50.0, "reference CPC unexpectedly converged"
    assert np.abs(r_ref - ext[:3, :3]).max() > 0.5  # its pose is far off GT
    assert float(np.asarray(err_ours)[0]) < 1.0  # ours converged...
    assert np.abs(r_ours - ext[:3, :3]).max() < 0.05  # ...onto the true pose
