"""Ahead-of-time scene-program export: serve warm restarts without retracing.

Measured motivation (tools/compile_probe.py, docs/SERVING.md): a warm service
restart with a hot persistent compile cache still pays 14-22 s, and that cost
is TRACE-dominated — retracing the full scene program through Python costs
~10-17 s while the cached XLA compile is only ~4-6 s. Tracing is pure
re-derivation of a program we already have, so this module removes it:
`jax.export` serializes the traced+lowered StableHLO of a scene program to a
file at warm-up time, and a restarting service `deserialize()`s it — skipping
Python tracing entirely; only the (persistent-cache-hit) XLA compile remains.

Design notes:

- Programs are exported FLAT: the argument pytree (Models, CadBank, arrays)
  is flattened to a leaf tuple before export, and outputs are returned as a
  leaf tuple. This keeps the serialized artifact free of custom pytree-node
  registrations; the loader rebuilds `runner.SceneResult` itself (its
  structure is part of this module's contract, not of the artifact).
- The artifact key bakes in everything that changes the traced program:
  leaf shapes/dtypes (vehicle bucket, resolution, steps), `vis_res`,
  `stages.spec_key()` (the MODEL_SPEC snapshot — same invariant the jit
  cache uses), the jax version and the backend platform. A stale artifact is
  therefore unreachable, not wrong.
- Pallas kernels lower to the non-portable `tpu_custom_call` target, which
  `jax.export` rejects by default because such artifacts are not stable
  across unrelated machines/versions. That guarantee is irrelevant here: the
  artifact is a LOCAL deploy cache keyed by jax version + platform (same
  contract as `.jax_cache/`), so the check is explicitly disabled for the
  custom-call targets the scene program uses.

The reference has no analogue (its pipeline is an eager torch script,
trajectory_inference.py:39-475); compile/trace latency is a TPU-serving
concern this framework owns.
"""
from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.pipeline import stages

# Non-portable lowerings the scene program may contain; see module docstring
# for why disabling the stability check is sound for a local deploy cache.
_LOCAL_CUSTOM_CALLS = (
    "tpu_custom_call",  # Pallas kernels (ops/pallas_conv.py, ops/pallas_raster.py)
    "Sharding",         # sharding-constraint custom call (sharded programs)
    "annotate_device_placement",
)

_FORMAT_VERSION = 1


def _artifact_key(kind: str, leaves, static: tuple) -> str:
    """Filename-safe digest of everything that shapes the traced program."""
    h = hashlib.sha256()
    h.update(f"v{_FORMAT_VERSION}|{kind}|{jax.__version__}|".encode())
    h.update(f"{jax.default_backend()}|".encode())
    for leaf in leaves:
        h.update(f"{jnp.shape(leaf)}{jnp.result_type(leaf)}|".encode())
    h.update(repr(static).encode())
    return f"{kind}-{h.hexdigest()[:20]}"


def _flat_leaves(args: tuple):
    return jax.tree_util.tree_leaves(args)


def export_program(
    fn: Callable,
    example_args: tuple,
    *,
    kind: str,
    static: tuple = (),
    directory: os.PathLike,
) -> Path:
    """Trace/lower ``fn(*example_args)`` once and serialize it under
    ``directory``. ``fn`` must accept the pytree args and return any pytree of
    arrays; ``static`` is extra cache-key material (e.g. ``vis_res`` and
    ``stages.spec_key()``) that ``fn`` closes over.

    Returns the artifact path. Idempotent: an existing artifact for the same
    key is left untouched (same invariant as the persistent compile cache).
    """
    from jax import export as jexport

    leaves, treedef = jax.tree_util.tree_flatten(tuple(example_args))
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / (_artifact_key(kind, leaves, static) + ".jaxexp")
    if path.exists():
        return path

    def flat_fn(*flat):
        args = jax.tree_util.tree_unflatten(treedef, flat)
        return tuple(jax.tree_util.tree_leaves(fn(*args)))

    specs = [jax.ShapeDtypeStruct(jnp.shape(l), jnp.result_type(l)) for l in leaves]
    exported = jexport.export(
        jax.jit(flat_fn),
        disabled_checks=[
            jexport.DisabledSafetyCheck.custom_call(t) for t in _LOCAL_CUSTOM_CALLS
        ],
    )(*specs)
    # Unique tmp per writer: os.replace makes the RENAME atomic, but two
    # exporters sharing one tmp name could interleave write_bytes and publish
    # corrupt bytes. Distinct tmp names make the whole write-then-rename race
    # benign (last writer wins with a complete artifact).
    tmp = path.with_suffix(f".{os.getpid()}.tmp")
    try:
        tmp.write_bytes(exported.serialize())
        os.replace(tmp, path)
    finally:
        tmp.unlink(missing_ok=True)
    return path


# (path, mtime) -> jitted deserialized call. Deserializing + re-jitting per
# request would repay the artifact parse every call; the executable itself is
# also cached by jax under the returned jit wrapper, so serving reuses one
# loaded program per artifact per process.
_LOADED: dict = {}


def load_program(
    path: os.PathLike,
    out_unflatten: Callable[[Sequence], object] = tuple,
) -> Optional[Callable]:
    """Deserialize an exported program; returns ``run(*args) -> out``, or
    ``None`` if the artifact cannot be read/deserialized (truncated write,
    disk corruption, foreign bytes). The miss-falls-back-silently contract
    covers BAD artifacts, not just absent ones: serving must degrade to the
    jit path, never crash in the request path on cache state.

    ``out_unflatten`` rebuilds the output pytree from the flat leaf tuple
    (e.g. ``lambda outs: SceneResult(*outs)``). The returned callable flattens
    its args with the SAME tree order used at export time (guaranteed by
    identical pytree structure) and jits the deserialized call so repeat
    invocations hit the executable cache.
    """
    from jax import export as jexport

    path = Path(path)
    cache_key = (str(path), path.stat().st_mtime_ns)
    call = _LOADED.get(cache_key)
    if call is None:
        try:
            call = jax.jit(jexport.deserialize(path.read_bytes()).call)
        except Exception as e:  # corrupt/unreadable artifact -> jit fallback
            import warnings

            warnings.warn(
                f"AOT artifact {path.name} failed to deserialize "
                f"({type(e).__name__}: {e}); falling back to the jit path"
            )
            return None
        _LOADED[cache_key] = call

    def run(*args):
        return out_unflatten(call(*_flat_leaves(tuple(args))))

    return run


# ----------------------------------------------------------------------------
# Scene-program front-ends (the shapes SceneService serves).


def _scene_static(vis_res: int) -> tuple:
    return (int(vis_res), stages.spec_key())


def export_run_scene(models, cad_bank, frame, background, bboxes, meter_coords,
                     intrinsic, *, vis_res: int, directory) -> Path:
    """Export the full serving program (perception inside — runner.run_scene)."""
    from future_urban_scene_generation_tpu.pipeline import runner

    def fn(m, cb, f, bg, bb, mc, k):
        return runner.run_scene(m, cb, f, bg, bb, mc, k, vis_res=vis_res)

    return export_program(
        fn,
        (models, cad_bank, frame, background, bboxes, meter_coords, intrinsic),
        kind="run_scene",
        static=_scene_static(vis_res),
        directory=directory,
    )


def lookup_run_scene(models, cad_bank, frame, background, bboxes, meter_coords,
                     intrinsic, *, vis_res: int, directory) -> Optional[Callable]:
    """Return a no-retrace ``run(models, cad_bank, frame, background, bboxes,
    meter_coords, intrinsic) -> SceneResult`` if an artifact matching the
    argument shapes + current MODEL_SPEC exists under ``directory``; else None.
    """
    from future_urban_scene_generation_tpu.pipeline import runner

    if jax.default_backend() == "cpu" and not os.environ.get("FUSG_AOT_CPU"):
        # XLA:CPU crashes executing a freshly-deserialized FULL scene program
        # in a process that never traced it (segfault inside the executable;
        # bisected: perception/geometry sub-programs restore fine, the
        # generator region does not — an XLA:CPU issue, not an artifact one;
        # the same artifacts restore correctly on TPU, tools/aot_probe.py).
        # In-process restore works everywhere and stays tested on CPU
        # (tests/test_aot.py sets FUSG_AOT_CPU=1); serving restores are a TPU
        # feature, so on CPU the lookup reports a miss and the service falls
        # back to the jit path.
        return None
    leaves = _flat_leaves(
        (models, cad_bank, frame, background, bboxes, meter_coords, intrinsic)
    )
    path = Path(directory) / (
        _artifact_key("run_scene", leaves, _scene_static(vis_res)) + ".jaxexp"
    )
    if not path.exists():
        return None
    return load_program(path, out_unflatten=lambda outs: runner.SceneResult(*outs))
