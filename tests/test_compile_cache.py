"""Persistent XLA compilation cache (utils/compile_cache.py).

The reference is eager PyTorch and pays no compile cost; under jit this
framework does, so the cache is a first-class runtime feature: enabling it
must populate the directory on first compile, and a second enable/compile of
the same program must not grow it (fingerprint hit).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eelunet_tpu.utils.compile_cache import enable_compile_cache, resolve_cache_dir


def test_resolve_spec(monkeypatch, tmp_path):
    monkeypatch.delenv("EELUNET_COMPILE_CACHE", raising=False)
    assert resolve_cache_dir("") == ""
    assert resolve_cache_dir(str(tmp_path)) == str(tmp_path)
    assert resolve_cache_dir("auto").endswith(os.path.join(".cache", "eelunet_tpu", "xla"))
    monkeypatch.setenv("EELUNET_COMPILE_CACHE", str(tmp_path / "envdir"))
    assert resolve_cache_dir("auto") == str(tmp_path / "envdir")


def test_cache_populates_and_hits(tmp_path, monkeypatch):
    cache = tmp_path / "xla_cache"
    # Thresholds so even a toy program is cached (defaults skip sub-second
    # compiles — the production graphs are all above them). Save/restore the
    # REAL prior values: the conftest may have a suite-wide cache dir active.
    prior = {
        k: getattr(jax.config, k)
        for k in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        assert enable_compile_cache(str(cache)) == str(cache)

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 16), np.float32))
        first = np.asarray(f(x))
        entries = set(os.listdir(cache))
        assert entries, "first compile must write a cache entry"

        # Same program again from a cold in-process cache: must LOAD, not add.
        jax.clear_caches()
        again = np.asarray(f(x))
        assert set(os.listdir(cache)) == entries
        np.testing.assert_array_equal(first, again)
    finally:
        for k, v in prior.items():
            jax.config.update(k, v)
        # Re-point the process-level cache singleton back too — the config
        # update alone leaves later suite compiles writing to this tmp dir.
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:
            pass


def test_disabled_and_bad_dir(tmp_path):
    # "" leaves things untouched and reports disabled (or the previously
    # enabled directory — enable is global and sticky by design).
    before = enable_compile_cache("")
    # Unwritable parent degrades to a no-op instead of raising.
    bad = os.path.join(str(tmp_path), "f")
    open(bad, "w").close()
    assert enable_compile_cache(os.path.join(bad, "sub")) == before
