"""Persistent-compile-cache helper: default resolution, env override, config
side effects, and graceful failure on an uncreatable directory."""
import jax
import pytest

from future_urban_scene_generation_tpu.utils import cache

pytestmark = pytest.mark.smoke


@pytest.fixture(autouse=True)
def _restore_cache_config():
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)


def test_default_dir_is_package_adjacent(monkeypatch):
    monkeypatch.delenv("FUSG_JAX_CACHE", raising=False)
    d = cache.default_cache_dir()
    assert d.name == ".jax_cache"
    assert (d.parent / "future_urban_scene_generation_tpu").is_dir()


def test_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("FUSG_JAX_CACHE", str(tmp_path / "envcache"))
    assert cache.default_cache_dir() == tmp_path / "envcache"


def test_enable_sets_jax_config(tmp_path):
    target = tmp_path / "c"
    out = cache.enable_persistent_cache(target, min_compile_secs=1.25)
    assert out == target and target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.25


def test_enable_survives_uncreatable_dir(tmp_path):
    blocker = tmp_path / "file"
    blocker.write_text("x")
    # A path whose parent is a FILE cannot be created -> returns None, no raise.
    assert cache.enable_persistent_cache(blocker / "sub") is None
