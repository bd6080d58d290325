"""Persistent executable cache (utils/compile_cache.py): the cold-compile
fix for remote-attached TPUs — verified here on the CPU backend (the cache
layer is backend-generic; axon round-trip verified on hardware, see
BASELINE.md)."""

import os

import jax
import jax.numpy as jnp

from easyrag_tpu.utils.compile_cache import enable_compile_cache


def test_enable_writes_entries_and_returns_path(tmp_path):
    path = enable_compile_cache(str(tmp_path / "cache"))
    try:
        assert os.path.isdir(path)

        @jax.jit
        def f(x):
            return (x * 2 + 1).sum()

        assert float(f(jnp.arange(8.0))) == 64.0
        entries = os.listdir(path)
        assert entries, "no cache entries written"
        assert any("cache" in e for e in entries)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("EASYRAG_COMPILE_CACHE", str(tmp_path / "env_cache"))
    try:
        assert enable_compile_cache() == str(tmp_path / "env_cache")
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_pipeline_config_knob(tmp_path):
    """tpu.compile_cache_dir reaches jax config at pipeline _init."""
    from easyrag_tpu.config import EasyRAGConfig

    cfg = EasyRAGConfig.from_dict(
        {"tpu": {"compile_cache_dir": str(tmp_path / "boot_cache")}}
    )
    assert cfg.tpu.compile_cache_dir.endswith("boot_cache")
    # _init with a corpus is heavy; exercise just the knob's code path
    from easyrag_tpu.utils.compile_cache import enable_compile_cache as ecc

    try:
        assert ecc(cfg.tpu.compile_cache_dir) == cfg.tpu.compile_cache_dir
        assert jax.config.jax_compilation_cache_dir == cfg.tpu.compile_cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
