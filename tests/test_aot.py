"""AOT scene-program export (pipeline/aot.py): roundtrip, keying, equivalence.

Warm serving restarts are trace-dominated (~10-17 s of the 14-22 s warm
restart, docs/SERVING.md); `jax.export` artifacts skip the retrace. These
tests pin the invariants the serving integration relies on:

* a deserialized program computes EXACTLY what the jit path computes (same
  StableHLO -> same executable), including through the full `runner.run_scene`
  program at tiny shapes;
* the artifact key covers everything that shapes the traced program — leaf
  shapes/dtypes, the static tuple (vis_res + MODEL_SPEC snapshot) — so a
  stale artifact is unreachable rather than wrong;
* lookup misses (no artifact / different shapes / different spec) return
  None instead of serving the wrong program.

The reference has no compile step at all (eager torch,
trajectory_inference.py:39-475); this surface is TPU-serving-specific.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.pipeline import aot


def _toy(d, x):
    return {"y": d["a"] @ x + d["b"], "z": jnp.sum(x) * d["b"]}


@pytest.fixture
def toy_args():
    d = {"a": jnp.arange(64.0).reshape(8, 8) / 64.0, "b": jnp.arange(8.0)}
    x = jnp.linspace(0.0, 1.0, 8)
    return d, x


def test_roundtrip_matches_direct_call(tmp_path, toy_args):
    d, x = toy_args
    path = aot.export_program(_toy, (d, x), kind="toy", static=(1,),
                              directory=tmp_path)
    run = aot.load_program(path, out_unflatten=tuple)
    got = run(d, x)
    want = jax.tree_util.tree_leaves(_toy(d, x))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_export_idempotent_and_static_keyed(tmp_path, toy_args):
    d, x = toy_args
    p1 = aot.export_program(_toy, (d, x), kind="toy", static=(1,),
                            directory=tmp_path)
    mtime = p1.stat().st_mtime_ns
    # Same key: artifact untouched (deploy warmers race benignly).
    assert aot.export_program(_toy, (d, x), kind="toy", static=(1,),
                              directory=tmp_path) == p1
    assert p1.stat().st_mtime_ns == mtime
    # Different static tuple (e.g. a MODEL_SPEC change): different artifact.
    p2 = aot.export_program(_toy, (d, x), kind="toy", static=(2,),
                            directory=tmp_path)
    assert p2 != p1
    # Different leaf shapes: different artifact.
    d16 = {"a": jnp.zeros((16, 16)), "b": jnp.zeros(16)}
    p3 = aot.export_program(_toy, (d16, jnp.zeros(16)), kind="toy", static=(1,),
                            directory=tmp_path)
    assert p3 not in (p1, p2)
    assert len({p1.name, p2.name, p3.name}) == 3


def test_output_pytree_reconstruction(tmp_path, toy_args):
    d, x = toy_args
    path = aot.export_program(_toy, (d, x), kind="toy", static=(),
                              directory=tmp_path)
    # Loader contract: the caller owns the output structure.
    run = aot.load_program(path, out_unflatten=lambda outs: dict(y=outs[0], z=outs[1]))
    out = run(d, x)
    np.testing.assert_allclose(np.asarray(out["y"]), np.asarray(_toy(d, x)["y"]),
                               rtol=1e-6)


def test_corrupt_artifact_degrades_to_none(tmp_path, toy_args):
    """A truncated/garbage artifact must report a MISS (None + warning), not
    raise in the request path — the fall-back contract covers bad cache
    state, not just absent files."""
    d, x = toy_args
    path = aot.export_program(_toy, (d, x), kind="toy", static=(),
                              directory=tmp_path)
    good = path.read_bytes()
    try:
        path.write_bytes(good[: len(good) // 2])  # truncated write
        with pytest.warns(UserWarning, match="falling back to the jit path"):
            assert aot.load_program(path) is None
        path.write_bytes(b"not an export artifact")
        with pytest.warns(UserWarning, match="failed to deserialize"):
            assert aot.load_program(path) is None
    finally:
        path.write_bytes(good)
    run = aot.load_program(path)  # restored bytes load again (mtime-keyed)
    assert run is not None and len(run(d, x)) == 2


def test_service_scene_program_dispatch(tmp_path):
    """SceneService._scene_program: AOT hit -> deserialized program; miss or
    aot_dir unset -> the jit path (runner.run_scene closure)."""
    from types import SimpleNamespace

    from future_urban_scene_generation_tpu.pipeline.service import SceneService

    calls = {}

    class _FakeAot:
        @staticmethod
        def lookup_run_scene(*args, vis_res, directory):
            calls["lookup"] = (vis_res, directory)
            return calls.get("hit")

    import future_urban_scene_generation_tpu.pipeline as pl
    real = pl.aot
    fake_self = SimpleNamespace(
        cfg=SimpleNamespace(runtime=SimpleNamespace(vis_res=96, aot_dir=None))
    )
    args = (1, 2, 3, 4, 5, 6, 7)
    try:
        pl.aot = _FakeAot()
        # aot_dir unset: jit path, no lookup.
        fn = SceneService._scene_program(fake_self, args)
        assert "lookup" not in calls and callable(fn)
        # aot_dir set, miss: lookup consulted, jit fallback.
        fake_self.cfg.runtime.aot_dir = tmp_path
        fn = SceneService._scene_program(fake_self, args)
        assert calls["lookup"] == (96, tmp_path) and callable(fn)
        # Hit: the loaded program is returned as-is.
        marker = lambda *a: "aot-result"  # noqa: E731
        calls["hit"] = marker
        assert SceneService._scene_program(fake_self, args) is marker
    finally:
        pl.aot = real


# ---------------------------------------------------------------------------
# Full scene program (slow tier: compiles runner.run_scene twice at 240x320).


@pytest.mark.slow
def test_run_scene_aot_equivalence(tmp_path, monkeypatch):
    # In-process restore is exercised on CPU via the override; FRESH-process
    # CPU restore of the full scene program is gated off in lookup_run_scene
    # (XLA:CPU executes the deserialized generator region incorrectly — see
    # the gate's comment; TPU restore is covered by tools/aot_probe.py).
    monkeypatch.setenv("FUSG_AOT_CPU", "1")
    from future_urban_scene_generation_tpu.pipeline import runner, stages
    from future_urban_scene_generation_tpu.utils import mesh as mu

    H, W = 240, 320
    K = jnp.asarray(np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]],
                             np.float32))
    mesh, kp3d = mu.make_test_car(subdiv=1)
    cad_bank = runner.build_cad_bank([mesh], [kp3d], scale=5.0)
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    bg = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    bboxes = jnp.asarray(np.float32([[100, 90, 200, 160]]))
    t = np.linspace(0, 2.4, 3)
    meters = jnp.asarray(np.stack([t, np.zeros_like(t)], -1)[None])

    key = jax.random.PRNGKey(0)
    cadm, hgm, icnm, vunm = stages.Models.modules()
    dummy = jnp.zeros((1, 256, 256, 3))
    models = stages.Models(
        cad_params=jax.jit(cadm.init)(key, dummy),
        hourglass_params=jax.jit(hgm.init)(key, dummy),
        icn_params=jax.jit(icnm.init)(key, jnp.zeros((1, 256, 256, 21))),
        vunet_params=jax.jit(
            lambda k: vunm.init({"params": k}, dummy, jnp.zeros((1, 256, 256, 6)),
                                cov=0.0)
        )(key),
    )
    args = (models, cad_bank, frame, bg, bboxes, meters, K)

    ref = runner.run_scene(*args, vis_res=96)

    # Miss before export; hit after; miss again at a different vis_res.
    assert aot.lookup_run_scene(*args, vis_res=96, directory=tmp_path) is None
    aot.export_run_scene(*args, vis_res=96, directory=tmp_path)
    run = aot.lookup_run_scene(*args, vis_res=96, directory=tmp_path)
    assert run is not None
    assert aot.lookup_run_scene(*args, vis_res=128, directory=tmp_path) is None

    res = run(*args)
    assert isinstance(res, runner.SceneResult)
    for a, b in zip(jax.tree_util.tree_leaves(res), jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # A MODEL_SPEC change must invalidate the lookup (stale program would
    # silently serve the old spec otherwise).
    old = stages.MODEL_SPEC["warp_plane_res"]
    try:
        stages.configure_models(warp_plane_res=64)
        assert aot.lookup_run_scene(*args, vis_res=96, directory=tmp_path) is None
    finally:
        stages.configure_models(warp_plane_res=old)
    assert aot.lookup_run_scene(*args, vis_res=96, directory=tmp_path) is not None
