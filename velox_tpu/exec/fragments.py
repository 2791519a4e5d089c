"""Multi-fragment execution: the host-side exchange control plane.

The analog of velox's distributed-query contract (SURVEY.md D.5):
``PartitionedOutput`` hash-partitions its input and enqueues per-partition
batches into an in-process ``OutputBufferManager``
(velox/exec/OutputBufferManager.h:41-51); consumer fragments start from
``Exchange`` operators that drain their partition. ``run_fragments`` plays
the host engine's coordinator role (velox leaves this to Presto/Spark),
running each fragment as one Task per partition — the
MultiFragmentTest-without-a-cluster pattern
(velox/exec/tests/MultiFragmentTest.cpp:52). Inside a TPU slice the same
exchange is a single all_to_all (velox_tpu/parallel); this path is the
DCN / cross-slice form.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from velox_tpu.plan.nodes import (
    ExchangeNode, PlanNode, SourceNode, new_id,
)
from velox_tpu.vector.batch import Batch
from velox_tpu.exec.operator import Operator
from velox_tpu.exec.task import Task, _SIMPLE_OPERATORS
from velox_tpu.ops.hash import hash_columns, partition_ids


@dataclass(frozen=True)
class PartitionedOutputNode(SourceNode):
    """Fragment terminal: hash/broadcast partition to consumers
    (velox/core/PlanNode.h:2712)."""

    keys: Tuple[str, ...] = ()
    num_partitions: int = 1
    broadcast: bool = False
    #: "hash" | "round_robin" | "hive_bucket" (velox PartitionFunction
    #: family: exec/HashPartitionFunction.h, RoundRobinPartitionFunction,
    #: connectors/hive/HivePartitionFunction.h)
    partition_kind: str = "hash"


from velox_tpu.plan.serde import register_node_type

register_node_type(PartitionedOutputNode)


class OutputBufferManager:
    """In-process page buffers keyed by (fragment, partition)
    (velox/exec/OutputBufferManager.h analog; enqueue/get/ack collapses
    to enqueue/drain since producers finish before consumers here).

    ``serialize_pages=True`` stores wire-format SerializedPages instead of
    live device batches — the cross-host (DCN) form of the exchange, where
    pages leave the producer's device memory
    (velox/exec/SerializedPage.h; serializers/PrestoSerializer.h:49)."""

    def __init__(self, serialize_pages: bool = False,
                 compress: bool = False):
        self._buffers: Dict[tuple, list] = defaultdict(list)
        self._serialize = serialize_pages
        self._compress = compress
        #: wire bytes enqueued so far (exchange data-plane stat)
        self.bytes_buffered = 0

    def enqueue(self, fragment: str, partition: int, batch: Batch) -> None:
        if self._serialize:
            from velox_tpu.serial import serialize_page

            page = serialize_page(batch, compress=self._compress)
            self.bytes_buffered += len(page)
            self._buffers[(fragment, partition)].append(page)
        else:
            self._buffers[(fragment, partition)].append(batch)

    def drain(self, fragment: str, partition: int) -> List[Batch]:
        items = self._buffers.get((fragment, partition), [])
        if self._serialize:
            from velox_tpu.serial import deserialize_page

            return [deserialize_page(p) for p in items]
        return list(items)


class PartitionedOutputOp(Operator):
    """velox/exec/PartitionedOutput.cpp:426 — partition + enqueue."""

    blocking = True

    def __init__(self, node: PartitionedOutputNode, manager, fragment: str):
        super().__init__(node)
        self.manager = manager
        self.fragment = fragment

    _rr_next = 0

    def _partition_ids(self, batch: Batch):
        node = self.node
        n = node.num_partitions
        kind = getattr(node, "partition_kind", "hash")
        if kind == "round_robin":
            # row-wise cycling (velox RoundRobinPartitionFunction)
            ranks = jnp.cumsum(batch.sel.astype(jnp.int64)) - 1
            part = ((ranks + self._rr_next) % n).astype(jnp.int32)
            self._rr_next = int(
                (self._rr_next + jnp.sum(batch.sel.astype(jnp.int64)))
                % n)
            return part
        cols = [
            (batch.column(k).values, batch.column(k).valid)
            for k in node.keys]
        if kind == "hive_bucket":
            from velox_tpu.ops.hash import hive_bucket_ids

            return hive_bucket_ids(cols, n)
        return partition_ids(hash_columns(cols), n)

    def add_input(self, batch: Batch) -> None:
        node = self.node
        n = node.num_partitions
        if node.broadcast or (not node.keys and getattr(
                node, "partition_kind", "hash") != "round_robin"):
            for p in range(n):
                self.manager.enqueue(self.fragment, p, batch)
            return
        part = self._partition_ids(batch)
        for p in range(n):
            sel = jnp.logical_and(batch.sel, part == p)
            self.manager.enqueue(
                self.fragment, p, batch.with_sel(sel))

    def get_output(self) -> Optional[Batch]:
        return None

    def is_finished(self) -> bool:
        return self.no_more_input_seen


class ExchangeOp(Operator):
    """velox/exec/Exchange.cpp — drain the producer's partition."""

    def __init__(self, node: ExchangeNode, manager, producer: str,
                 partition: int):
        super().__init__(node)
        self._queue = list(manager.drain(producer, partition))
        self._i = 0

    def get_output(self) -> Optional[Batch]:
        if self._i < len(self._queue):
            b = self._queue[self._i]
            self._i += 1
            return b
        return None

    def is_finished(self) -> bool:
        return self._i >= len(self._queue)


@dataclass
class Fragment:
    """One plan fragment (velox/core/PlanFragment.h analog)."""

    name: str
    plan: PlanNode
    num_tasks: int = 1
    #: exchange node id -> producer fragment name
    exchange_sources: Optional[Dict[str, str]] = None


def run_fragments(fragments: Sequence[Fragment],
                  serialize_pages: bool = False, compress: bool = False):
    """Execute fragments in order (producers first); returns the last
    fragment's result as an Arrow table. ``serialize_pages`` routes every
    exchange through the SerializedPage wire format (the cross-host
    path)."""
    import pyarrow as pa

    from velox_tpu.vector.arrow_bridge import to_arrow

    manager = OutputBufferManager(serialize_pages, compress)
    last_tables = []
    for frag in fragments:
        srcs = frag.exchange_sources or {}
        last_tables = []
        for task_idx in range(frag.num_tasks):
            planner_ctx = (manager, frag, task_idx, srcs)
            task = _make_task(frag.plan, planner_ctx)
            outs = list(task.run())
            last_tables.extend(outs)
    return pa.concat_tables([to_arrow(b) for b in last_tables]) \
        if last_tables else None


def _make_task(plan: PlanNode, ctx) -> Task:
    manager, frag, task_idx, srcs = ctx
    from velox_tpu.exec import task as task_mod

    # register context-bound factories for the exchange node types
    # (velox Operator translator registry, exec/Operator.h:452)
    prev_ex = task_mod._OPERATOR_REGISTRY.get(ExchangeNode)
    prev_po = task_mod._OPERATOR_REGISTRY.get(PartitionedOutputNode)
    task_mod._OPERATOR_REGISTRY[ExchangeNode] = (
        lambda node: ExchangeOp(
            node, manager, srcs[node.id], task_idx))
    task_mod._OPERATOR_REGISTRY[PartitionedOutputNode] = (
        lambda node: PartitionedOutputOp(node, manager, frag.name))
    try:
        return Task(plan)
    finally:
        if prev_ex is None:
            task_mod._OPERATOR_REGISTRY.pop(ExchangeNode, None)
        else:
            task_mod._OPERATOR_REGISTRY[ExchangeNode] = prev_ex
        if prev_po is None:
            task_mod._OPERATOR_REGISTRY.pop(PartitionedOutputNode, None)
        else:
            task_mod._OPERATOR_REGISTRY[PartitionedOutputNode] = prev_po


def partitioned_output(builder, keys: Sequence[str], num_partitions: int,
                       broadcast: bool = False,
                       partition_kind: str = "hash"):
    """PlanBuilder extension: terminate a fragment with a shuffle write
    (partition_kind: hash | round_robin | hive_bucket)."""
    node = PartitionedOutputNode(
        new_id(), builder.node.output_type, builder.node,
        tuple(keys), num_partitions, broadcast, partition_kind)
    builder.node = node
    return builder


# ------------------------------------------------- streaming fragments

class StreamingPartitionedOutputOp(PartitionedOutputOp):
    """PartitionedOutput against the bounded StreamingBufferManager:
    pages serialize immediately, enqueue blocks under backpressure, and
    finishing publishes no_more_data (the real OutputBufferManager
    producer contract, velox/exec/PartitionedOutput.cpp:426)."""

    def add_input(self, batch: Batch) -> None:
        from velox_tpu.serial import serialize_page

        node = self.node
        n = node.num_partitions
        if node.broadcast or (not node.keys and getattr(
                node, "partition_kind", "hash") != "round_robin"):
            page = serialize_page(batch)
            for p in range(n):
                self.manager.enqueue(self.fragment, p, page)
            return
        part = self._partition_ids(batch)
        for p in range(n):
            sel = jnp.logical_and(batch.sel, part == p)
            self.manager.enqueue(
                self.fragment, p, serialize_page(batch.with_sel(sel)))

    def no_more_input(self) -> None:
        if not self.no_more_input_seen:
            super(PartitionedOutputOp, self).no_more_input()
            self.manager.no_more_data(
                self.fragment, list(range(self.node.num_partitions)))


class StreamingExchangeOp(Operator):
    """Exchange pulling from a (possibly remote) ExchangeSource with
    fetch->ack windowing; blocks until the producer publishes pages."""

    def __init__(self, node: ExchangeNode, source):
        super().__init__(node)
        from velox_tpu.exec.exchange_net import consume_source

        self._gen = consume_source(source)
        self._done = False

    def get_output(self) -> Optional[Batch]:
        if self._done:
            return None
        b = next(self._gen, None)
        if b is None:
            self._done = True
        return b

    def is_finished(self) -> bool:
        return self._done


def run_fragments_streaming(fragments: Sequence[Fragment],
                            max_buffered_bytes: int = 8 << 20):
    """Execute ALL fragments CONCURRENTLY (one thread per task) against
    a bounded streaming buffer manager — producers and consumers overlap
    and flow-control each other, unlike :func:`run_fragments`'s
    producers-first batch mode."""
    import pyarrow as pa

    from velox_tpu.exec.exchange_net import (
        LocalExchangeSource, StreamingBufferManager)
    from velox_tpu.vector.arrow_bridge import to_arrow

    manager = StreamingBufferManager(max_buffered_bytes)
    results: Dict[str, list] = {}
    errors: list = []
    threads = []

    def make_task(frag, task_idx):
        from velox_tpu.exec import task as task_mod

        srcs = frag.exchange_sources or {}
        prev_ex = task_mod._OPERATOR_REGISTRY.get(ExchangeNode)
        prev_po = task_mod._OPERATOR_REGISTRY.get(PartitionedOutputNode)
        task_mod._OPERATOR_REGISTRY[ExchangeNode] = (
            lambda node: StreamingExchangeOp(
                node, LocalExchangeSource(
                    manager, srcs[node.id], task_idx)))
        task_mod._OPERATOR_REGISTRY[PartitionedOutputNode] = (
            lambda node: StreamingPartitionedOutputOp(
                node, manager, frag.name))
        try:
            return Task(frag.plan)
        finally:
            if prev_ex is None:
                task_mod._OPERATOR_REGISTRY.pop(ExchangeNode, None)
            else:
                task_mod._OPERATOR_REGISTRY[ExchangeNode] = prev_ex
            if prev_po is None:
                task_mod._OPERATOR_REGISTRY.pop(
                    PartitionedOutputNode, None)
            else:
                task_mod._OPERATOR_REGISTRY[PartitionedOutputNode] = \
                    prev_po

    def run_one(frag, task):
        try:
            outs = list(task.run())
            results.setdefault(frag.name, []).extend(outs)
        except Exception as e:  # surfaced after join
            errors.append((frag.name, e))

    # task construction mutates the (global) operator registry: build
    # sequentially in this thread, then RUN concurrently
    import threading

    for frag in fragments:
        for task_idx in range(frag.num_tasks):
            task = make_task(frag, task_idx)
            t = threading.Thread(target=run_one, args=(frag, task))
            threads.append(t)
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    if errors:
        raise errors[0][1]
    last = results.get(fragments[-1].name, [])
    return pa.concat_tables([to_arrow(b) for b in last]) if last else None
