"""init_distributed ordering contract: jax.distributed.initialize must be invoked
before ANY backend-touching query (jax.devices / jax.process_count) — those
initialize a single-process local backend, after which a later initialize is a
no-op or an error on a real multi-host slice. DCN hardware is unreachable in this
environment, so the contract is pinned via mocks.
"""
import jax
import pytest

from future_urban_scene_generation_tpu.parallel import mesh as pmesh


def test_init_distributed_never_touches_backend(monkeypatch):
    calls = []

    monkeypatch.setattr(
        jax.distributed, "is_initialized", lambda: calls.append("is_init") or False
    )
    monkeypatch.setattr(
        jax.distributed,
        "initialize",
        lambda **kw: calls.append(("initialize", kw.get("coordinator_address"))),
    )

    def forbidden(*a, **k):
        raise AssertionError(
            "backend-touching call before jax.distributed.initialize"
        )

    monkeypatch.setattr(jax, "process_count", forbidden)
    monkeypatch.setattr(jax, "devices", forbidden)
    monkeypatch.setattr(jax, "local_devices", forbidden)

    pmesh.init_distributed(coordinator_address="10.0.0.1:1234", num_processes=2,
                           process_id=0)
    assert ("initialize", "10.0.0.1:1234") in calls
    assert calls.index("is_init") < calls.index(("initialize", "10.0.0.1:1234"))


def test_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.setattr(
        jax.distributed,
        "initialize",
        lambda **kw: pytest.fail("must not initialize without a coordinator"),
    )
    pmesh.init_distributed()


def test_init_distributed_noop_when_already_initialized(monkeypatch):
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    monkeypatch.setattr(
        jax.distributed,
        "initialize",
        lambda **kw: pytest.fail("must not re-initialize"),
    )
    pmesh.init_distributed(coordinator_address="10.0.0.1:1234")
