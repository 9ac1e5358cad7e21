"""Scene-level pipeline runner: one jitted function from (frame, bboxes, trajectories)
to the (S+1) composited future frames for both generator branches.

This is the TPU-native counterpart of traj_test (trajectory_inference.py:39-475):
everything between video decode and PNG writing runs as a single jit with fixed
shapes — vehicles and future steps are vmapped axes, vehicle compositing is a scan.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry.rotations import (
    extrinsic_from_rodrigues,
    z_rot,
)
from future_urban_scene_generation_tpu.geometry.projection import project_points_extrinsic
from future_urban_scene_generation_tpu.pipeline import stages
from future_urban_scene_generation_tpu.pipeline.stages import (
    CadBank,
    Models,
    central_crop_patch,
    perceive,
    pose_rollout,
    render_vehicle,
    solve_poses,
    warp_planes_to_crop,
    _to_signed_lab,
)
from future_urban_scene_generation_tpu.render import visibility as vis


class SceneResult(NamedTuple):
    frames_icn: jnp.ndarray  # (S+1, H, W, 3)
    frames_vunet: jnp.ndarray  # (S+1, H, W, 3)
    pnp_error: jnp.ndarray  # (V,)
    cad_idx: jnp.ndarray  # (V,)


def run_scene(
    models: Models,
    cad_bank: CadBank,
    frame: jnp.ndarray,  # (H, W, 3) float [0,1] RGB
    background: jnp.ndarray,  # (H, W, 3) float [0,1] RGB (static background)
    bboxes: jnp.ndarray,  # (V, 4) xyxy
    meter_coords: jnp.ndarray,  # (V, T, 2) metric trajectory (T-1 future steps)
    intrinsic: jnp.ndarray,  # (3, 3)
    vis_res: int = 192,
) -> SceneResult:
    return _run_scene_impl(
        models, cad_bank, frame, background, bboxes, meter_coords, intrinsic,
        vis_res=vis_res, spec=stages.spec_key(),
    )


@partial(jax.jit, static_argnames=("vis_res", "spec"))
def _run_scene_impl(
    models, cad_bank, frame, background, bboxes, meter_coords, intrinsic,
    vis_res, spec,
) -> SceneResult:
    perception = perceive(models, frame, bboxes)
    return _synthesize_scene_impl(
        models, cad_bank, frame, background, perception, meter_coords, intrinsic,
        vis_res=vis_res, spec=spec,
    )


def synthesize_scene(
    models: Models,
    cad_bank: CadBank,
    frame: jnp.ndarray,
    background: jnp.ndarray,  # (H, W, 3) static, or (S+1, H, W, 3) per step (inpaint)
    perception,  # stages.Perception — possibly oracle-injected (tests/benchmarks)
    meter_coords: jnp.ndarray,
    intrinsic: jnp.ndarray,
    vis_res: int = 192,
) -> SceneResult:
    return _synthesize_scene_impl(
        models, cad_bank, frame, background, perception, meter_coords, intrinsic,
        vis_res=vis_res, spec=stages.spec_key(),
    )


# ``spec`` (stages.spec_key()) is a pure cache-key argument: MODEL_SPEC is read at
# trace time, so a configure_models() change must map to a new jit cache entry.
@partial(jax.jit, static_argnames=("vis_res", "spec"))
def _synthesize_scene_impl(
    models: Models,
    cad_bank: CadBank,
    frame: jnp.ndarray,
    background: jnp.ndarray,
    perception,
    meter_coords: jnp.ndarray,
    intrinsic: jnp.ndarray,
    vis_res: int,
    spec: tuple,
) -> SceneResult:
    geom = _geometry_core(
        models, cad_bank, frame, perception, meter_coords, intrinsic, vis_res
    )
    return _generate_core(models, frame, background, geom, perception.cad_idx)


def _scene_geometry(models, cad_bank, frame, perception, meter_coords, intrinsic,
                    vis_res: int = 192):
    return _scene_geometry_impl(
        models, cad_bank, frame, perception, meter_coords, intrinsic,
        vis_res=vis_res, spec=stages.spec_key(),
    )


@partial(jax.jit, static_argnames=("vis_res", "spec"))
def _scene_geometry_impl(models, cad_bank, frame, perception, meter_coords,
                         intrinsic, vis_res, spec):
    """Stage A of the staged scene runner: everything up to (and excluding) the
    generators — PnP, rollout, per-step rendering, visibility, polygons, and the
    per-vehicle source tables/priors. Splitting here bounds remote-compile units
    (ROADMAP #3): the geometry stage recompiles independently of generator
    changes and vice versa. The monolithic scene jit runs the SAME core, so
    staged == monolith by construction (test_pipeline pins it)."""
    return _geometry_core(
        models, cad_bank, frame, perception, meter_coords, intrinsic, vis_res
    )


def _geometry_core(models, cad_bank, frame, perception, meter_coords,
                   intrinsic, vis_res):
    with jax.named_scope("fusg.pnp"):
        err, rvec, tvec = solve_poses(perception, cad_bank, intrinsic)
        extrinsics = jax.vmap(extrinsic_from_rodrigues)(rvec, tvec)
    with jax.named_scope("fusg.rollout"):
        kp3d_all = cad_bank.keypoints3d[perception.cad_idx]
        theta, translation = jax.vmap(pose_rollout)(meter_coords, kp3d_all)

    from future_urban_scene_generation_tpu.ops.warp import pack_bilinear_table

    def per_vehicle(cad_idx, bbox_window_fields, ext, kp3d, theta_v, tr_v):
        verts = cad_bank.vertices[cad_idx]
        corners = cad_bank.corners[cad_idx]
        corner_normals = cad_bank.corner_normals[cad_idx]
        cull = (
            cad_bank.cullable[cad_idx] if cad_bank.cullable is not None else False
        )
        bbox_window = stages.cr.Window(*bbox_window_fields)

        def per_step(theta_s, tr_s):
            with jax.named_scope("fusg.render"):
                sketch, veh_mask, window = render_vehicle(
                    verts, corners, corner_normals, ext, intrinsic, theta_s, tr_s,
                    cull=cull,
                )
            with jax.named_scope("fusg.visibility"):
                kp3d_s = kp3d @ z_rot(theta_s) + tr_s
                kp2d_s = project_points_extrinsic(kp3d_s, intrinsic, ext)
                # Scale-free local raster: area ratios are affine-invariant,
                # so the vis_res^2 window over the keypoint bbox IS the
                # frame-resolution computation with better effective resolution
                # than the frame for typical vehicle sizes (visibility.py).
                visibility = vis.compute_visibility_local(
                    ext, kp2d_s, kp3d_s, res=vis_res
                )
                polys = jnp.trunc(kp2d_s)[jnp.asarray(vis.TEXTURE_PLANES)]
            return sketch, veh_mask, window, visibility[:5], polys

        sketches, veh_masks, windows, visibilities, polys = jax.vmap(per_step)(
            theta_v, tr_v
        )
        src_window = jax.tree.map(lambda f: f[0], windows)
        with jax.named_scope("fusg.src_table"):
            central_lab = _to_signed_lab(
                stages._maybe_flip_rgb(central_crop_patch(frame, bbox_window))
            )
            src_packed = pack_bilinear_table(
                stages._to_signed_lab(
                    stages.cr.crop_resize(frame, src_window, stages.SRC_TABLE)
                )
            ).astype(stages._generator_dtype())
        win_fields = (windows.x_start, windows.y_start, windows.w, windows.h)
        src_win_fields = (src_window.x_start, src_window.y_start,
                          src_window.w, src_window.h)
        return (sketches, veh_masks, win_fields, visibilities, polys,
                src_packed, central_lab, src_win_fields)

    bbox_win = perception.window
    bbox_win_fields = (bbox_win.x_start, bbox_win.y_start, bbox_win.w, bbox_win.h)
    out = jax.vmap(per_vehicle)(
        perception.cad_idx, bbox_win_fields, extrinsics, kp3d_all, theta, translation
    )
    return out + (err,)


def _scene_generate(models, frame, background, geom, cad_idx):
    return _scene_generate_impl(
        models, frame, background, geom, cad_idx, spec=stages.spec_key()
    )


@partial(jax.jit, static_argnames=("spec",))
def _scene_generate_impl(models, frame, background, geom, cad_idx, spec):
    """Stage B of the staged scene runner: generators + fault barrier + composite."""
    return _generate_core(models, frame, background, geom, cad_idx)


def _generate_core(models, frame, background, geom, cad_idx):
    (sketches, veh_masks, win_fields, visibilities, polys,
     src_packed, central_lab, src_win_fields, err) = geom
    v, s = sketches.shape[0], sketches.shape[1]

    # Plane warps stay per-(vehicle, step) vmaps: the stage is gather-latency
    # bound, not MXU bound, so it gains nothing from a flattened batch.
    def per_vehicle_warp(src_packed_v, src_win_fields_v, polys_v, vis_v,
                         win_fields_v):
        src_window = stages.cr.Window(*src_win_fields_v)

        def per_step(window_fields_s, vis_s, polys_s):
            with jax.named_scope("fusg.plane_warp"):
                return warp_planes_to_crop(
                    src_packed_v, src_window, polys_v[0], polys_s, vis_v[0],
                    vis_s, stages.cr.Window(*window_fields_s),
                )

        return jax.vmap(per_step)(win_fields_v, vis_v, polys_v)

    planes = jax.vmap(per_vehicle_warp)(
        src_packed, src_win_fields, polys, visibilities, win_fields
    )  # (V, S, 5, 256, 256, 3)

    # Generators run as true batches over V*S: one conv program at batch N
    # gives XLA the whole batch for MXU tiling instead of V x S nested batch-1
    # programs (stages.icn_synthesize_batch). Batches BEYOND 24 are scanned in
    # batch-24 chunks (stages.GEN_CHUNK): XLA's layout assignment over the
    # monolithic batch-48 generator region thrashed — ~24 ms/scene of
    # {2,3,1,0}<->{3,0,2,1} relayout copies + materialized reflect-pad /
    # up-stage border DUS that it fully fuses away at batch 24 (V=8 trace,
    # docs/SERVING.md). A lax.scan body is a separately layout-assigned
    # computation, so every chunk compiles exactly like the clean batch-24
    # program and V-scaling stays linear (it also halves the compiled program
    # size at V=8 — see the cold-compile table).
    src_windows = stages.cr.Window(*src_win_fields)  # batched (V,)
    mu_app = stages.vunet_encode_appearance_batch(
        models, frame, sketches[:, 0], veh_masks[:, 0], src_windows
    )
    n = v * s

    def flat(a):
        return a.reshape((n,) + a.shape[2:])

    chunk = stages.MODEL_SPEC.get("gen_chunk", 24)

    def gen_chunk_body(sketches_c, central_c, planes_c, mu_c, steps):
        icn = stages.icn_synthesize_batch(
            models, sketches_c, central_c, planes_c, s_repeat=steps
        )
        mu_rep = jax.tree.map(lambda a: jnp.repeat(a, steps, axis=0), mu_c)
        vun = stages.vunet_decode_batch(models, sketches_c, mu_rep)
        return icn, vun

    # Chunk only in the measured thrash zone: batch 48 loses ~24 ms/scene to
    # relayout copies and chunking wins 20% (V=8: 61.2 -> 73.6 fps), but the
    # batch-96 monolith does NOT thrash the same way and beats 4 sequential
    # chunks by 14% (V=16: 39.4 vs 34.5 fps — the chunks forgo batch-96 MXU
    # utilization). So: exactly-two-chunk batches scan; larger batches keep
    # the monolithic apply.
    if chunk and n > chunk and n <= 2 * chunk and n % chunk == 0 and chunk % s == 0:
        nc = n // chunk
        cv = chunk // s  # whole vehicles per chunk (chunk % s == 0)

        def rechunk(a, m):
            return a.reshape((nc, m) + a.shape[1:])

        xs = (
            rechunk(flat(sketches), chunk),
            rechunk(central_lab, cv),
            rechunk(flat(planes), chunk),
            jax.tree.map(lambda a: rechunk(a, cv), mu_app),
        )

        def body(carry, xs_c):
            sk_c, ce_c, pl_c, mu_c = xs_c
            return carry, gen_chunk_body(sk_c, ce_c, pl_c, mu_c, s)

        _, (icn_crops, vunet_crops) = jax.lax.scan(body, None, xs)
    else:
        icn_crops, vunet_crops = gen_chunk_body(
            flat(sketches), central_lab, flat(planes), mu_app, s
        )
    icn_crops = icn_crops.reshape(v, s, stages.CROP, stages.CROP, 3)
    vunet_crops = vunet_crops.reshape(v, s, stages.CROP, stages.CROP, 3)

    # Fault barrier (branchless counterpart of the reference's per-vehicle /
    # per-step try/except skips, trajectory_inference.py:252-253, 444-445).
    # Finiteness via a spatial SUM: NaN/Inf propagate through the reduction, and
    # a sum fuses into the generators' epilogues — the previous
    # all(isfinite(...)) reduce + full-tensor where-rewrite of both crop stacks
    # traced at ~10 ms/scene. Skipping the value rewrite is safe because
    # compositing selects (ops/crop.stitch uses jnp.where on the mask), and a
    # non-finite vehicle-step's mask is forced all-false here — its values are
    # never selected, and select_n does not propagate unselected NaNs.
    # Spatial-first reduction: a single (2,3,4) reduce includes the lane dim at
    # full tensor size and traced at 4.6 ms; reducing (2,3) first keeps lanes
    # and the residual (V, S, 3) sum is trivial.
    finite_ok = jnp.isfinite(
        jnp.sum(jnp.sum(icn_crops, axis=(2, 3)), axis=-1)
    ) & jnp.isfinite(jnp.sum(jnp.sum(vunet_crops, axis=(2, 3)), axis=-1))
    window_ok = (win_fields[2] > 1.0) & (win_fields[3] > 1.0)
    pose_ok = jnp.isfinite(err)[:, None]
    ok = (finite_ok & window_ok & pose_ok)[:, :, None, None]
    masks = veh_masks & ok

    n_steps = sketches.shape[1]
    if background.ndim == 3:
        background = jnp.broadcast_to(background, (n_steps,) + background.shape)

    step_fields = tuple(jnp.swapaxes(f, 0, 1) for f in win_fields)
    # Both generator branches share one composite call (2S steps): the
    # patch/full decision in composite_frames is a single scene-level scalar.
    frames_both = stages.composite_frames(
        jnp.concatenate([background, background], axis=0),
        jnp.concatenate(
            [jnp.swapaxes(icn_crops, 0, 1), jnp.swapaxes(vunet_crops, 0, 1)],
            axis=0,
        ),
        tuple(jnp.concatenate([f, f], axis=0) for f in step_fields),
        jnp.concatenate(
            [jnp.swapaxes(masks, 0, 1), jnp.swapaxes(masks, 0, 1)], axis=0
        ),
    )
    frames_icn, frames_vunet = jnp.split(frames_both, 2, axis=0)
    return SceneResult(frames_icn, frames_vunet, err, cad_idx)


def synthesize_scene_staged(models, cad_bank, frame, background, perception,
                            meter_coords, intrinsic, vis_res: int = 192):
    """:func:`synthesize_scene` split into two jits (geometry | generators).

    Same math and outputs (equivalence-tested); trades one HBM round trip of the
    intermediate tensors (tens of MB) for independently-compilable halves — use
    during development to avoid the monolithic program's full remote recompile on
    every generator or geometry change. Production serving keeps the fused
    :func:`synthesize_scene`.
    """
    geom = _scene_geometry(
        models, cad_bank, frame, perception, meter_coords, intrinsic,
        vis_res=vis_res,
    )
    return _scene_generate(models, frame, background, geom, perception.cad_idx)


def synthesize_scene_sharded(
    models, cad_bank, frame, background, perception, meter_coords, intrinsic,
    mesh, vis_res: int = 192,
):
    """Run :func:`synthesize_scene` with the vehicle axis sharded over the mesh's
    'data' axis (jax.sharding). Per-vehicle work (PnP, rendering, plane warps,
    generator forwards) partitions across devices; the composite scan gathers
    crops via XLA collectives. V must divide the data-axis size.

    This is the multi-chip serving path for the reference's batch axis
    (SURVEY §2.3: vehicles x steps, not sequence length).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    perception = type(perception)(
        cad_idx=jax.device_put(perception.cad_idx, data_sh),
        kp_frame=jax.device_put(perception.kp_frame, data_sh),
        window=jax.tree.map(lambda f: jax.device_put(f, data_sh), perception.window),
        crop=jax.device_put(perception.crop, data_sh),
    )
    meter_coords = jax.device_put(meter_coords, data_sh)
    frame = jax.device_put(frame, repl)
    background = jax.device_put(background, repl)
    intrinsic = jax.device_put(intrinsic, repl)
    models = jax.tree.map(lambda p: jax.device_put(p, repl), models)
    cad_bank = jax.tree.map(lambda p: jax.device_put(p, repl), cad_bank)
    # Pallas fast paths lower to custom calls with no SPMD sharding rule, so
    # under the mesh they could fail to partition or silently replicate the
    # vehicle axis; spec_key() threads the flag, so this traces a separate
    # XLA-only program without disturbing the single-chip compile cache.
    # gen_chunk is a SINGLE-chip layout fix (batch-48 relayout thrash); under
    # the mesh the vehicle axis is already partitioned — each device sees a
    # <= 24 sub-batch — and the chunk scan would serialize work all devices
    # could run at once.
    prev = (stages.MODEL_SPEC["pallas_kernels"], stages.MODEL_SPEC["gen_chunk"])
    stages.MODEL_SPEC["pallas_kernels"] = False
    stages.MODEL_SPEC["gen_chunk"] = 0
    try:
        return synthesize_scene(
            models, cad_bank, frame, background, perception, meter_coords,
            intrinsic, vis_res=vis_res,
        )
    finally:
        stages.MODEL_SPEC["pallas_kernels"], stages.MODEL_SPEC["gen_chunk"] = prev


def run_scene_sharded(
    models, cad_bank, frame, background, bboxes, meter_coords, intrinsic,
    mesh, vis_res: int = 192,
) -> SceneResult:
    """:func:`run_scene` (perception INSIDE the program) with the vehicle axis
    sharded over ``mesh``'s 'data' axis — the serving-path counterpart of
    :func:`synthesize_scene_sharded` for callers that submit raw (frame,
    bboxes, meters) requests, e.g. the streaming runners. Crops, hourglass/
    CAD-classifier forwards, PnP, rendering, warps and generator forwards all
    partition per vehicle; frame/background/weights replicate. V must divide
    the data-axis size.

    Streams x chips: give each camera stream its own (sub)mesh and the streams
    land on disjoint devices — the embarrassingly-parallel stream axis of
    BASELINE config 4 (each stream is an independent request pipeline; no
    collective crosses streams).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    bboxes = jax.device_put(bboxes, data_sh)
    meter_coords = jax.device_put(meter_coords, data_sh)
    frame = jax.device_put(frame, repl)
    background = jax.device_put(background, repl)
    intrinsic = jax.device_put(intrinsic, repl)
    models = jax.tree.map(lambda p: jax.device_put(p, repl), models)
    cad_bank = jax.tree.map(lambda p: jax.device_put(p, repl), cad_bank)
    # Same spec overrides as synthesize_scene_sharded (see its comment): the
    # Pallas custom calls carry no SPMD rule, and gen_chunk is a single-chip
    # layout fix that would serialize the already-partitioned sub-batches.
    prev = (stages.MODEL_SPEC["pallas_kernels"], stages.MODEL_SPEC["gen_chunk"])
    stages.MODEL_SPEC["pallas_kernels"] = False
    stages.MODEL_SPEC["gen_chunk"] = 0
    try:
        return run_scene(
            models, cad_bank, frame, background, bboxes, meter_coords,
            intrinsic, vis_res=vis_res,
        )
    finally:
        stages.MODEL_SPEC["pallas_kernels"], stages.MODEL_SPEC["gen_chunk"] = prev


def build_cad_bank(meshes, keypoints, scale: float = 5.0) -> CadBank:
    """Pad a list of (TriangleMesh, (12,3) kp) into a CadBank (run_test.py:146-153's
    x5 vertex scaling applied here). Triangles are Morton-sorted so the Pallas
    rasterizer's chunk-level tile culling bites at CAD mesh density."""
    import numpy as np

    from future_urban_scene_generation_tpu.utils.mesh import (
        compute_vertex_normals,
        orient_for_backface_cull,
        spatial_sort_triangles,
    )

    v_max = max(len(m.vertices) for m in meshes)
    t_max = max(len(m.triangles) for m in meshes)
    verts, tris, normals, kps, corners, corner_normals = [], [], [], [], [], []
    cullable = []
    for mesh, kp in zip(meshes, keypoints):
        # Vertex normals from the AS-LOADED winding (reference parity with
        # Open3D's ComputeVertexNormals on the raw PLY, utils/cad_utils.py:21-25);
        # the cull rewind below only changes triangle orientation, which the
        # rasterizer's coverage/interpolation are agnostic to.
        n = compute_vertex_normals(mesh)
        oriented, can_cull = orient_for_backface_cull(mesh)
        cullable.append(can_cull)
        mesh = spatial_sort_triangles(oriented)
        v = np.asarray(mesh.vertices, np.float32) * scale
        t = np.asarray(mesh.triangles, np.int32)
        # Pad vertices by repeating the last one: padded vertices must not distort the
        # projected-vertex bbox that defines sketch crop windows.
        v = np.pad(v, ((0, v_max - len(v)), (0, 0)), mode="edge")
        n = np.pad(np.asarray(n, np.float32), ((0, v_max - len(n)), (0, 0)), mode="edge")
        t = np.pad(t, ((0, t_max - len(t)), (0, 0)))  # degenerate all-zero triangles
        verts.append(v)
        tris.append(t)
        normals.append(n)
        kps.append(np.asarray(kp, np.float32) * scale)
        # Static corner expansion (lane-major (3 corners, 3 xyz, Tmax)): the
        # gather-free rasterizer's input — padding triangles expand to vertex 0
        # thrice (degenerate, culled by the zero-area validity test).
        corners.append(np.stack([v[t[:, 0]].T, v[t[:, 1]].T, v[t[:, 2]].T]))
        corner_normals.append(np.stack([n[t[:, 0]].T, n[t[:, 1]].T, n[t[:, 2]].T]))
    return CadBank(
        jnp.asarray(np.stack(verts)),
        jnp.asarray(np.stack(tris)),
        jnp.asarray(np.stack(normals)),
        jnp.asarray(np.stack(kps)),
        jnp.asarray(np.stack(corners)),
        jnp.asarray(np.stack(corner_normals)),
        jnp.asarray(np.asarray(cullable, bool)),
    )
