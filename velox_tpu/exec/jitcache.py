"""Global jit cache keyed by (op id, signature).

Object-identity jit keys forced a remote recompile per run in round 1
(BASELINE.md Q3 postmortem); every operator jit goes through here with
a VALUE key instead.

Set ``VELOX_TPU_JIT_PROFILE=1`` to record per-key wall time (each call
then blocks until ready — profiling changes the async overlap, use it
to ATTRIBUTE time, not to total it). Read results via
``jit_profile()``.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict

import jax

_CACHE: Dict[tuple, Callable] = {}
_PROFILE: Dict[tuple, list] = {}
_PROFILING = bool(os.environ.get("VELOX_TPU_JIT_PROFILE"))


def cached_jit(key: tuple, make: Callable[[], Callable]) -> Callable:
    """Return a jitted callable for ``key``, building it on first use."""
    fn = _CACHE.get(key)
    if fn is None:
        fn = jax.jit(make())
        if _PROFILING:
            inner = fn

            def fn(*a, __inner=inner, __key=key, **kw):
                t0 = time.time()
                out = __inner(*a, **kw)
                jax.block_until_ready(out)
                _PROFILE.setdefault(__key, []).append(
                    time.time() - t0)
                return out

        _CACHE[key] = fn
    return fn


def jit_profile() -> Dict[tuple, list]:
    """Per-key call walls (seconds); empty unless profiling is on."""
    return _PROFILE


def cache_clear() -> None:
    _CACHE.clear()
    _PROFILE.clear()


def cache_size() -> int:
    return len(_CACHE)
