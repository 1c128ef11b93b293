"""Persistent-compile-cache hardening.

Two independent defects in jax's persistent compilation cache bit this
project repeatedly (full-suite segfaults that look like hangs because
pytest's piped stdout never flushes):

1. **Torn concurrent writes.** With the default unlimited
   ``jax_compilation_cache_max_size`` the cache takes NO lock, and
   ``LRUCache.put`` publishes entries with a plain non-atomic
   ``write_bytes`` (jax/_src/lru_cache.py). Any concurrent process
   sharing the cache dir -- the test suite spawns CLI subprocesses that
   do exactly that -- can read a half-written entry, and the torn bytes
   crash the native consumers (XLA's CPU AOT executable deserializer in
   ``backend_compile_and_load``; previously the zstandard C decoder,
   which got blamed first because its frames were on the stack).
   :func:`atomic_cache_puts` fixes the root cause: entries are written to
   a unique temp file in the cache dir and published with ``os.replace``
   (atomic on POSIX), so readers only ever see complete files.

2. **zstandard under large bursts.** Decompressing those torn entries is
   also what made the zstd backend segfault "intermittently under
   bursts". With atomic puts this may well be gone too, but zlib keeps
   the dependency surface smaller and decompresses fast either way, so
   :func:`force_zlib_cache` stays. The format choice is cache-dir-wide
   (jax picks the DEcompressor by a module global, not content sniffing),
   so a dir written with zstd cannot be read after forcing zlib -- use a
   fresh dir when switching (the in-repo dirs are suffixed ``2``).

Call :func:`harden_cache` (both fixes) before the first compile that may
touch the cache -- tests/conftest.py, bench.py, benchmarks/suite.py, and
cli.main do.
"""

from __future__ import annotations

import os
import warnings


def force_zlib_cache() -> None:
    """Make jax's persistent compilation cache use zlib, not zstandard."""
    try:
        import jax._src.compilation_cache as _cc
        _cc.zstandard = None
    except (ImportError, AttributeError) as e:   # pragma: no cover
        warnings.warn(
            f"could not force zlib compile-cache compression ({e}); "
            "persistent-cache writes will use zstandard")


def atomic_cache_puts() -> None:
    """Publish compile-cache entries atomically (temp file + os.replace).

    Patches jax's LRUCache.put; safe to call multiple times. No-ops with
    a warning if the private layout moves in a future jax (degrading to
    the status-quo torn-write behavior, never breaking).
    """
    try:
        import jax._src.lru_cache as _lru
        if getattr(_lru.LRUCache.put, "_horizonator_atomic", False):
            return
        orig_put = _lru.LRUCache.put

        def put(self, key: str, val: bytes) -> None:
            if not key:
                raise ValueError("key cannot be empty")
            if getattr(self, "eviction_enabled", False):
                # the locked path serializes writers already; keep jax's
                # own logic (eviction bookkeeping) intact
                return orig_put(self, key, val)
            cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
            if cache_path.exists():
                return
            tmp = self.path / (f"{key}{_lru._CACHE_SUFFIX}"
                               f".tmp.{os.getpid()}.{id(val) & 0xffff:x}")
            try:
                tmp.write_bytes(val)
                os.replace(tmp, cache_path)
            except OSError as e:          # pragma: no cover
                warnings.warn(f"compile-cache put failed: {e}")
                try:
                    tmp.unlink()
                except OSError:
                    pass

        put._horizonator_atomic = True
        _lru.LRUCache.put = put
    except (ImportError, AttributeError) as e:   # pragma: no cover
        warnings.warn(
            f"could not make compile-cache puts atomic ({e}); concurrent "
            "cache sharers may read torn entries (native-crash risk)")


def harden_cache() -> None:
    """Both fixes: zlib compression + atomic entry publishes."""
    force_zlib_cache()
    atomic_cache_puts()
