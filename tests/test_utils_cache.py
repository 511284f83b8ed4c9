"""utils.enable_compilation_cache: config wiring and env opt-out."""

import os

import jax

from cyclediffusion_tpu.utils import enable_compilation_cache


def test_cache_dir_configured(tmp_path, monkeypatch):
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    monkeypatch.setenv("CYCLEDIFFUSION_COMPILE_CACHE", str(tmp_path / "cc"))
    monkeypatch.delenv("CYCLEDIFFUSION_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        path = enable_compilation_cache(min_compile_secs=123.0)
        assert path == str(tmp_path / "cc")
        assert os.path.isdir(path)
        assert jax.config.jax_compilation_cache_dir == path
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 123.0
    finally:
        # tmp_path is deleted after the test — don't leave compiles pointed
        # at a dead cache dir for the rest of the pytest process
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_min)


def test_cache_env_opt_out(monkeypatch):
    monkeypatch.setenv("CYCLEDIFFUSION_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache() is None


def test_cache_cpu_backend_noop(monkeypatch):
    """XLA:CPU AOT cache entries can mismatch the host machine — the helper
    only engages on TPU."""
    monkeypatch.delenv("CYCLEDIFFUSION_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert enable_compilation_cache() is None
