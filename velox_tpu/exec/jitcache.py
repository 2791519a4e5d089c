"""Global jit cache.

Every operator instance used to own fresh ``jax.jit`` closures; re-running
a plan (new Task, same PlanNodes) re-traced everything (~0.4s per closure
on the tunneled TPU). This cache keys compiled callables by the semantic
configuration (plan-node id + anything baked into the trace as a
constant), so repeated executions of a plan — the serving pattern — reuse
compiled programs. Data-dependent device arrays must be ARGUMENTS of the
cached functions, never closed-over constants; host constants that vary
with the data (e.g. normalized-key mins) must appear in the key.

The analog of velox's plan/expression compilation caching
(velox/exec/HashTableCache.h and ExprSet reuse across batches).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax

_CACHE: Dict[tuple, Callable] = {}


def cached_jit(key: tuple, make: Callable[[], Callable]) -> Callable:
    """Return a jitted callable for ``key``, building it on first use."""
    fn = _CACHE.get(key)
    if fn is None:
        fn = jax.jit(make())
        _CACHE[key] = fn
    return fn


def cache_clear() -> None:
    _CACHE.clear()


def cache_size() -> int:
    return len(_CACHE)
