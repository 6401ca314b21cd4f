"""Persistent XLA compilation cache.

The reference pays no compile cost (PyTorch eager, train.py:236 runs ops
immediately); under jit every entry point here pays an XLA compile on first
call instead — seconds on CPU, and MINUTES per train-step graph on rigs where
TPU compilation goes through a remote service (docs/PERF.md). JAX ships a
persistent on-disk compilation cache that turns every repeat invocation of the
same program (same shapes/dtypes/topology) into a deserialize-and-load; this
module is the single switch every CLI, `bench.py`, and the serving stack flip
before first compilation.

Spec values (``TrainConfig.compile_cache``):

- ``"auto"`` (default): ``$EELUNET_COMPILE_CACHE`` if set, else
  ``~/.cache/eelunet_tpu/xla``.
- ``""``: disabled (leave JAX's own defaults untouched).
- any other string: used as the cache directory verbatim.

The cache is keyed by XLA's fingerprint of (HLO, compile options, backend
version), so stale hits across jaxlib/libtpu upgrades are not a concern; the
directory is safe to delete at any time.
"""

from __future__ import annotations

import os

_ENV = "EELUNET_COMPILE_CACHE"
_DEFAULT_SUBDIR = os.path.join("~", ".cache", "eelunet_tpu", "xla")

_enabled_dir: str = ""


def resolve_cache_dir(spec: str) -> str:
    """Map a ``compile_cache`` config value to a directory ('' = disabled)."""
    if spec == "auto":
        spec = os.environ.get(_ENV) or _DEFAULT_SUBDIR
    return os.path.expanduser(spec) if spec else ""


def enable_compile_cache(spec: str = "auto") -> str:
    """Point JAX's persistent compilation cache at ``resolve_cache_dir(spec)``.

    Returns the directory in use ('' when disabled). Idempotent; safe to call
    before or after backend initialization (JAX reads the config at each
    compile). Errors creating the directory degrade to disabled — a missing
    cache must never take down training.
    """
    global _enabled_dir
    path = resolve_cache_dir(spec)
    if not path:
        return _enabled_dir
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        if jax.config.jax_compilation_cache_dir != path:
            jax.config.update("jax_compilation_cache_dir", path)
            # The on-disk cache object is a process-level singleton pinned to
            # the directory in use at first compile; without a reset, later
            # config updates silently keep writing to the old directory.
            try:
                from jax._src import compilation_cache as _cc

                _cc.reset_cache()
            except Exception:
                pass
        _enabled_dir = path
    except OSError:
        return _enabled_dir
    return _enabled_dir
