"""Persistent-compilation-cache partitioning (utils/compile_cache.py).

The cache dir must be partitioned by platform AND host-CPU fingerprint:
CPU AOT executables embed the compiling machine's features, and any process
can compile for CPU regardless of JAX_PLATFORMS (tests and dryrun flip the
backend after import), so loading another host's partition risks SIGILL.
"""

import os

import pytest

from carla_ppo_tpu.utils import compile_cache


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    """enable() mutates global jax config; put it back after each test."""
    import jax

    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)
    compile_cache._enabled = True


def test_fingerprint_stable_and_short():
    a = compile_cache._cpu_fingerprint()
    b = compile_cache._cpu_fingerprint()
    assert a == b
    assert 0 < len(a) <= 16


def test_default_dir_carries_host_fingerprint(monkeypatch):
    """Every default partition (cpu-flavoured or not) must embed the host
    fingerprint, so a VM-type change can never load foreign AOT blobs."""
    fp = compile_cache._cpu_fingerprint()
    for plats in ("axon", "axon,cpu", "cpu", ""):
        monkeypatch.setenv("JAX_PLATFORMS", plats)
        monkeypatch.delenv("CARLA_PPO_CACHE_DIR", raising=False)
        monkeypatch.setattr(compile_cache, "_enabled", False)
        d = compile_cache.enable()
        assert d is not None and d.endswith(fp), (plats, d)
        assert os.path.basename(os.path.dirname(d)) == ".jax_cache"


def test_env_disable(monkeypatch):
    monkeypatch.setenv("CARLA_PPO_CACHE_DIR", "0")
    monkeypatch.setattr(compile_cache, "_enabled", False)
    assert compile_cache.enable() is None


def test_explicit_dir_overrides_partitioning(monkeypatch, tmp_path):
    monkeypatch.setenv("CARLA_PPO_CACHE_DIR", str(tmp_path / "cc"))
    monkeypatch.setattr(compile_cache, "_enabled", False)
    assert compile_cache.enable() == str(tmp_path / "cc")


def test_idempotent(monkeypatch):
    monkeypatch.delenv("CARLA_PPO_CACHE_DIR", raising=False)
    monkeypatch.setattr(compile_cache, "_enabled", False)
    d1 = compile_cache.enable()
    d2 = compile_cache.enable()
    assert d1 == d2
