"""StreamRunner: warm-program streaming with overlapped submission."""
import numpy as np
import pytest
import jax

from future_urban_scene_generation_tpu.pipeline import runner, stages, streaming
from future_urban_scene_generation_tpu.utils import mesh as mu

H, W = 240, 320
K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], dtype=np.float32)


@pytest.mark.slow
def test_stream_runner_pipelines():
    import jax.numpy as jnp

    mesh, kp3d = mu.make_test_car(subdiv=1)
    cad_bank = runner.build_cad_bank([mesh], [kp3d], scale=5.0)
    key = jax.random.PRNGKey(0)
    cadm, hgm, icnm, vunm = stages.Models.modules()
    dummy = jnp.zeros((1, 256, 256, 3))
    models = stages.Models(
        cad_params=jax.jit(cadm.init)(key, dummy),
        hourglass_params=jax.jit(hgm.init)(key, dummy),
        icn_params=jax.jit(icnm.init)(key, jnp.zeros((1, 256, 256, 21))),
        vunet_params=jax.jit(
            lambda k: vunm.init(
                {"params": k}, dummy, jnp.zeros((1, 256, 256, 6)), cov=0.0
            )
        )(key),
    )
    stream = streaming.StreamRunner(
        models, cad_bank, K, (H, W), n_vehicles=1, n_steps=3, depth=2
    )

    rng = np.random.RandomState(0)
    frames = rng.rand(3, H, W, 3).astype(np.float32)
    bboxes = [[100.0, 80.0, 180.0, 140.0]]
    t = np.linspace(0, 2, 3)
    meters = np.stack([np.stack([t, 0 * t], -1)])

    results = []
    for f in frames:
        out = stream.submit(f, bboxes, meters)
        if out is not None:
            results.append(out)
    results.extend(stream.flush())
    assert len(results) == 3
    for r in results:
        assert r.frames_icn.shape == (3, H, W, 3)
        assert np.isfinite(np.asarray(r.frames_icn)).all()
    assert len(stream.latencies) == 3


def test_uint8_upload_matches_float():
    import numpy as np
    import jax.numpy as jnp
    from future_urban_scene_generation_tpu.pipeline.streaming import StreamRunner

    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (32, 48, 3), np.uint8)
    a = np.asarray(StreamRunner._upload(u8))
    b = np.asarray(StreamRunner._upload(u8.astype(np.float32) / 255.0))
    assert a.dtype == np.float32
    np.testing.assert_allclose(a, b, atol=1e-7)
