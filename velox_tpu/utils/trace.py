"""Batch serialization + query tracing/replay.

Three reference subsystems in one TPU-friendly module:

* ``save_batch``/``load_batch`` — encoding-preserving binary dumps of a
  Batch (velox VectorSaver, docs/develop/debugging/vector-saver.rst):
  values + validity + selection + dictionaries + types round-trip via npz.
* ``QueryTracer`` — records every input batch of chosen plan nodes while
  a query runs (velox/exec/OperatorTraceWriter.h:37, hooked into the
  driver loop at exec/Driver.cpp:600-611).
* ``replay_operator`` — re-executes ONE operator from its recorded inputs
  (velox/tool/trace/ replayer family): deterministic repro of a single
  operator without the upstream plan.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from velox_tpu.types import DataType
from velox_tpu.types.types import DecimalType, TypeKind
from velox_tpu.vector.batch import Batch
from velox_tpu.vector.column import Column, Dictionary


def _type_to_json(t: DataType) -> dict:
    d = {"kind": t.kind.value}
    if isinstance(t, DecimalType):
        d["precision"] = t.precision
        d["scale"] = t.scale
    return d


def _type_from_json(d: dict) -> DataType:
    kind = TypeKind(d["kind"])
    if kind == TypeKind.DECIMAL:
        return DecimalType(kind, d["precision"], d["scale"])
    return DataType(kind)


def save_batch(batch: Batch, path: str) -> None:
    """Encoding-preserving dump (values stay dictionary codes)."""
    arrays = {"__sel__": np.asarray(batch.sel)}
    meta = {"num_rows": batch.num_rows, "columns": {}}
    for n, c in batch.columns.items():
        arrays[f"v__{n}"] = np.asarray(c.values)
        if c.valid is not None:
            arrays[f"m__{n}"] = np.asarray(c.valid)
        meta["columns"][n] = {
            "type": _type_to_json(c.dtype),
            "dictionary": (
                None if c.dictionary is None
                else list(map(str, c.dictionary.values))),
            "stats": c.stats,
        }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f)


def _meta_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".meta.json"


def load_batch(path: str) -> Batch:
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    cols = {}
    for n, cm in meta["columns"].items():
        d = (None if cm["dictionary"] is None
             else Dictionary(cm["dictionary"]))
        valid = (jnp.asarray(npz[f"m__{n}"])
                 if f"m__{n}" in npz.files else None)
        stats = tuple(cm["stats"]) if cm.get("stats") else None
        cols[n] = Column(
            _type_from_json(cm["type"]), jnp.asarray(npz[f"v__{n}"]),
            valid, d, stats)
    return Batch(cols, jnp.asarray(npz["__sel__"]), meta["num_rows"])


class QueryTracer:
    """Record input batches of selected plan nodes during execution."""

    def __init__(self, trace_dir: str, node_ids: Optional[List[str]] = None):
        self.trace_dir = trace_dir
        self.node_ids = set(node_ids) if node_ids else None
        self._counts: Dict[str, int] = {}

    def wants(self, node_id: str) -> bool:
        return self.node_ids is None or node_id in self.node_ids

    def record(self, node_id: str, batch: Batch) -> None:
        i = self._counts.get(node_id, 0)
        self._counts[node_id] = i + 1
        save_batch(
            batch, os.path.join(self.trace_dir, node_id, f"input_{i:05d}"))

    def recorded_inputs(self, node_id: str) -> List[str]:
        d = os.path.join(self.trace_dir, node_id)
        return sorted(
            os.path.join(d, f[:-4]) for f in os.listdir(d)
            if f.endswith(".npz"))


def replay_operator(trace_dir: str, node) -> List[Batch]:
    """Re-run one plan node's operator on its recorded inputs
    (velox/tool/trace/TraceReplayRunner.cpp analog)."""
    from velox_tpu.exec.task import make_operator

    tracer = QueryTracer(trace_dir)
    paths = tracer.recorded_inputs(node.id)
    op = make_operator(node)
    out: List[Batch] = []
    for p in paths:
        op.add_input(load_batch(p))
        while True:
            b = op.get_output()
            if b is None:
                break
            out.append(b)
    op.no_more_input()
    while not op.is_finished():
        b = op.get_output()
        if b is None:
            break
        out.append(b)
    return out
