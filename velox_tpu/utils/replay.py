"""Count-replay execution: elide mid-run host syncs on repeat runs.

The tunneled TPU backend dispatches asynchronously for ~free (50 chained
jit calls enqueue in <1ms) but any BLOCKING device->host read mid-chain
costs a full ~30-110ms RPC round trip — measured on TPC-H Q18 SF1, the
~8 control-value syncs (output-capacity counts, dynamic-filter min/max,
join has-null flags) were ~93% of the 876ms steady-state wall while the
actual device compute was <10ms.

The replay model exploits a TPU-native property: under static shapes and
identical inputs, every one of those control values is a pure function
of (plan, data) and therefore IDENTICAL across runs. So:

- **record** (first run of a plan): every control fetch blocks as
  usual, and the (tag, value, device-buffer ref) triple is appended to
  a log keyed by the plan fingerprint.
- **replay** (repeat runs): each fetch returns the RECORDED value
  immediately — zero round trips — and enqueues a device-side equality
  check (live value == recorded device buffer, an async ~0.1ms
  dispatch). ONE coalesced fetch at the end of the run reads the AND of
  all checks. If anything diverged (data changed, nondeterminism), the
  results are discarded and the run repeats in record mode — replay
  never trades correctness, only latency.

This is the engine's answer to velox's adaptive output-batch sizing
(velox/exec/Operator.cpp outputBatchRows) re-thought for a remote
accelerator: instead of adapting batch sizes around cheap syncs, make
repeat steady-state runs sync-free and *validate* the speculation.

Operators opt in by routing host reads through ``fetch_int`` /
``fetch_bool`` / ``fetch_np`` / ``fetch_tree`` below; with no active
session they are plain blocking conversions.
"""

from __future__ import annotations

import hashlib
import threading
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "ReplayDivergence", "fetch_int", "fetch_bool", "fetch_float",
    "fetch_np", "fetch_tree", "replay_run", "catalog_epoch_bump",
    "replay_stats", "clear_recordings", "attach_checks",
    "deliver_attached",
]


class ReplayDivergence(Exception):
    """Replay cursor ran past / mismatched the recorded log — the host
    control flow of this run differs from the recorded run."""


# one recording per plan fingerprint: list of (tag, host_value, dev_ref)
_RECORDINGS: Dict[str, List[Tuple[str, Any, Any]]] = {}
_MAX_RECORDINGS = 64
# fingerprints whose replay failed validation: record-only from then on
# (value None) or retry-allowed counters
_POISONED: Dict[str, int] = {}
_POISON_LIMIT = 3

_STATS = {"record_runs": 0, "replay_runs": 0, "replay_hits": 0,
          "replay_misses": 0, "elided_syncs": 0}

# catalog data epoch: registering/unregistering tables invalidates
# fingerprints so stale recordings never even attempt to replay
_EPOCH = [0]


def catalog_epoch_bump() -> None:
    _EPOCH[0] += 1


def replay_stats() -> Dict[str, int]:
    return dict(_STATS)


def clear_recordings() -> None:
    _RECORDINGS.clear()
    _POISONED.clear()


class _Session:
    __slots__ = ("mode", "log", "cursor", "checks", "tid", "fp",
                 "harvested", "delivered")

    def __init__(self, fp: str, mode: str,
                 log: Optional[List] = None) -> None:
        self.fp = fp
        self.mode = mode              # "record" | "replay"
        self.log = log if log is not None else []
        self.cursor = 0
        self.checks: List[Any] = []   # device bool scalars
        self.harvested = 0            # checks[:harvested] rode along a
        self.delivered: List[bool] = []   # result transfer already
        self.tid = threading.get_ident()


_active: Optional[_Session] = None


def _session() -> Optional[_Session]:
    s = _active
    if s is not None and s.tid == threading.get_ident():
        return s
    return None


def _eq_check(live, recorded_dev):
    """Device-side equality of the live value vs the recorded device
    buffer — an async dispatch, never a host read. Dict trees compare
    leaf-wise (one AND-reduced bool)."""
    import jax.numpy as jnp

    if isinstance(live, dict):
        ok = jnp.asarray(True)
        for k in live:
            ok = jnp.logical_and(ok, _eq_check(live[k], recorded_dev[k]))
        return ok
    if (hasattr(live, "dtype")
            and jnp.issubdtype(live.dtype, jnp.inexact)):
        return jnp.array_equal(live, recorded_dev, equal_nan=True)
    return jnp.array_equal(live, recorded_dev)


def _replay(tag: str, live) -> Any:
    s = _session()
    assert s is not None and s.mode == "replay"
    if s.cursor >= len(s.log):
        raise ReplayDivergence(
            f"replay log exhausted at {tag!r} (recorded "
            f"{len(s.log)} fetches)")
    rtag, value, dev = s.log[s.cursor]
    if rtag != tag:
        raise ReplayDivergence(
            f"replay tag mismatch at #{s.cursor}: live {tag!r} vs "
            f"recorded {rtag!r}")
    s.cursor += 1
    s.checks.append(_eq_check(live, dev))
    _STATS["elided_syncs"] += 1
    return value


def _record(tag: str, live, host_value) -> None:
    s = _session()
    if s is not None and s.mode == "record":
        s.log.append((tag, host_value, live))


def fetch_int(tag: str, scalar) -> int:
    """Host int of a device scalar; recorded/replayed under a session."""
    s = _session()
    if s is not None and s.mode == "replay":
        return _replay(tag, scalar)
    v = int(scalar)
    _record(tag, scalar, v)
    return v


def fetch_bool(tag: str, scalar) -> bool:
    s = _session()
    if s is not None and s.mode == "replay":
        return _replay(tag, scalar)
    v = bool(scalar)
    _record(tag, scalar, v)
    return v


def fetch_float(tag: str, scalar) -> float:
    s = _session()
    if s is not None and s.mode == "replay":
        return _replay(tag, scalar)
    v = float(scalar)
    _record(tag, scalar, v)
    return v


def fetch_np(tag: str, arr) -> np.ndarray:
    """Host ndarray of a device array (ONE transfer when blocking)."""
    s = _session()
    if s is not None and s.mode == "replay":
        return _replay(tag, arr)
    v = np.asarray(arr)
    _record(tag, arr, v)
    return v


def fetch_tree(tag: str, tree: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Host dict-of-ndarrays (one coalesced device_get when blocking).
    Replay enqueues one equality check per leaf, keyed by the sorted
    leaf names so a structural change diverges loudly."""
    import jax

    s = _session()
    struct = tag + "|" + ",".join(sorted(tree))
    if s is not None and s.mode == "replay":
        return _replay(struct, tree)
    host = jax.device_get(tree)
    _record(struct, dict(tree), host)
    return host


def attach_checks(tree: Dict[str, Any]) -> Dict[str, Any]:
    """Piggyback pending replay-validation checks onto a host transfer
    the caller is about to make anyway (Batch.to_pydict's one
    coalesced device_get). On the tunneled backend every blocking
    round trip costs ~0.2-1.5s of pure latency — riding the checks on
    the result transfer makes a replayed run ONE round trip total
    instead of two. Returns the tree to fetch (possibly augmented
    with "__replay_checks__")."""
    import jax.numpy as jnp

    s = _session()
    if s is None or s.mode != "replay":
        return tree
    pending = s.checks[s.harvested:]
    if not pending:
        return tree
    out = dict(tree)
    from velox_tpu.exec.jitcache import cached_jit

    stack = cached_jit(
        ("replay_stack", len(pending)),
        lambda: (lambda xs: jnp.stack(
            [jnp.asarray(x) for x in xs])))
    out["__replay_checks__"] = stack(tuple(pending))
    s.harvested = len(s.checks)
    return out


def deliver_attached(host_tree: Dict[str, Any]) -> Dict[str, Any]:
    """Consume the piggybacked check results out of a fetched tree
    (counterpart of attach_checks)."""
    got = host_tree.pop("__replay_checks__", None)
    s = _session()
    if got is not None and s is not None:
        s.delivered.append(bool(np.all(got)))
    return host_tree


# ------------------------------------------------------------------ driver

def _fingerprint(plan) -> Optional[str]:
    """Structural plan hash + catalog epoch + execution-relevant config.
    None disables replay for this plan (unserializable nodes)."""
    from velox_tpu.utils.config import config

    def _structural(p) -> str:
        parts: List[str] = []

        def walk(n):
            parts.append(type(n).__name__)
            parts.append(str(getattr(n, "id", "")))
            # in-memory values plans: distinct batch objects are
            # distinct data — identity keeps two same-shaped test
            # plans from sharing a recording
            b = getattr(n, "batches", None)
            if b is not None:
                parts.append(str(id(b)))
            for sn in n.sources:
                walk(sn)

        walk(p)
        return "|".join(parts)

    def _has_values(n) -> bool:
        if getattr(n, "batches", None) is not None:
            return True
        return any(_has_values(s) for s in n.sources)

    try:
        if _has_values(plan):
            # plan_to_json serializes ValuesNode DATA — a device fetch;
            # batch-list identity is cheap and data-distinct
            body = _structural(plan)
        else:
            from velox_tpu.plan.serde import plan_to_json

            body = plan_to_json(plan)
    except Exception:
        try:
            body = _structural(plan)
        except Exception:
            return None
    extra = (f"epoch={_EPOCH[0]};narrow={config.narrow_lanes};"
             f"opt={config.optimize_plans};fused={config.fused_pipelines};"
             f"rows={config.preferred_batch_rows}")
    return hashlib.sha1(
        (body + extra).encode("utf-8", "ignore")).hexdigest()


def replay_run(plan, run: Callable[[], Any]) -> Any:
    """Execute ``run()`` under record/replay; returns its result only
    after a replay validates (or a record run completes)."""
    global _active

    from velox_tpu.utils.config import config

    if (not config.replay_counts or config.profile_sync_per_op
            or _session() is not None):
        return run()

    fp = _fingerprint(plan)
    if fp is None or _POISONED.get(fp, 0) >= _POISON_LIMIT:
        return run()

    recording = _RECORDINGS.get(fp)
    if recording is not None:
        # ---- replay attempt
        sess = _Session(fp, "replay", recording)
        _active = sess
        _STATS["replay_runs"] += 1
        try:
            result = run()
            diverged = sess.cursor != len(sess.log)
        except ReplayDivergence:
            diverged = True
            result = None
        except Exception:
            # a replayed value may have steered host code somewhere a
            # correct run never goes; if so, fall through to record —
            # a genuine bug will re-raise there
            _active = None
            _RECORDINGS.pop(fp, None)
            _POISONED[fp] = _POISONED.get(fp, 0) + 1
            return replay_run(plan, run)
        finally:
            checks = sess.checks[sess.harvested:]
            delivered = sess.delivered
            _active = None
        if not diverged:
            ok = all(delivered)
            if ok and checks:    # any checks that didn't ride along
                import jax
                import jax.numpy as jnp

                ok = bool(jax.device_get(jnp.all(jnp.stack(
                    [jnp.asarray(c) for c in checks]))))
            if ok:
                _STATS["replay_hits"] += 1
                return result
        # divergence or failed validation: drop the stale recording and
        # fall through to a fresh record run (results above discarded)
        _STATS["replay_misses"] += 1
        _RECORDINGS.pop(fp, None)
        _POISONED[fp] = _POISONED.get(fp, 0) + 1

    # ---- record run (blocking semantics, correct by construction)
    sess = _Session(fp, "record")
    _active = sess
    _STATS["record_runs"] += 1
    try:
        result = run()
    finally:
        _active = None
    if len(_RECORDINGS) >= _MAX_RECORDINGS:
        _RECORDINGS.pop(next(iter(_RECORDINGS)))
    _RECORDINGS[fp] = sess.log
    return result
