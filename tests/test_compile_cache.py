"""QD_COMPILE_CACHE knob: the persistent-cache setup must honor the opt-out
and the directory override (qingdai_tpu/compile_cache.py)."""

import importlib

import qingdai_tpu.compile_cache as cc


def _fresh():
    return importlib.reload(cc)


def test_cache_opt_out(monkeypatch):
    mod = _fresh()
    monkeypatch.setenv("QD_COMPILE_CACHE", "0")
    assert mod.setup_from_env() is None


def test_cache_dir_override(monkeypatch, tmp_path):
    mod = _fresh()
    target = str(tmp_path / "xla_cache")
    monkeypatch.setenv("QD_COMPILE_CACHE", "1")
    monkeypatch.setenv("QD_COMPILE_CACHE_DIR", target)
    import jax
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert mod.setup_from_env() == target
        import os
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        # idempotent second call
        assert mod.setup_from_env() == target
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
