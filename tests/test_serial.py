"""SerializedPage / CompactRow wire formats + serialized exchange.

Parity: velox/serializers/PrestoSerializer.h (columnar pages, compression,
checksums), row/CompactRow.h (row-major), exec/SerializedPage.h (exchange
data plane).
"""

import pytest

from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.exec.fragments import (
    Fragment, partitioned_output, run_fragments,
)
from velox_tpu.serial import (
    deserialize_compact_rows, deserialize_page, serialize_compact_rows,
    serialize_page,
)
from velox_tpu.vector.batch import Batch

DATA = {
    "k": [1, 2, None, 4, 5],
    "x": [1.5, None, 3.0, -4.25, 0.0],
    "s": ["aa", "bb", None, "aa", "cc"],
}
TYPES = {"k": BIGINT, "x": DOUBLE, "s": VARCHAR}


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("serde", [
    (serialize_page, deserialize_page),
    (serialize_compact_rows, deserialize_compact_rows),
])
def test_roundtrip(serde, compress):
    ser, de = serde
    b = Batch.from_pydict(DATA, TYPES)
    buf = ser(b, compress=compress)
    assert isinstance(buf, bytes)
    rt = de(buf)
    assert rt.to_pydict() == b.to_pydict()
    assert rt.schema == b.schema


def test_roundtrip_active_rows_only():
    # serialization compacts to selected rows
    b = Batch.from_pydict(DATA, TYPES)
    import jax.numpy as jnp

    sel = jnp.asarray([True, False, True, False, False]
                      + [False] * (b.capacity - 5))
    rt = deserialize_page(serialize_page(b.with_sel(sel)))
    assert rt.to_pydict() == {"k": [1, None], "x": [1.5, 3.0],
                              "s": ["aa", None]}
    assert rt.num_rows == 2


def test_checksum_detects_corruption():
    b = Batch.from_pydict(DATA, TYPES)
    buf = bytearray(serialize_page(b))
    buf[-1] ^= 0xFF
    with pytest.raises(AssertionError, match="checksum"):
        deserialize_page(bytes(buf))


def test_serialized_exchange_matches_in_memory():
    def plans():
        producer = partitioned_output(
            PlanBuilder().values(
                [Batch.from_pydict(
                    {"k": list(range(100)),
                     "v": [i * 3 for i in range(100)]},
                    {"k": BIGINT, "v": BIGINT})]),
            keys=["k"], num_partitions=4)
        ex_id = "ex1"
        from velox_tpu.plan.nodes import ExchangeNode

        consumer = PlanBuilder(ExchangeNode(
            ex_id, producer.node.output_type)) \
            .aggregate([], ["sum(v) as s", "count(k) as c"])
        return producer.build(), consumer.build(), ex_id

    results = []
    for serialize in (False, True):
        p, c, ex_id = plans()
        frags = [
            Fragment("producer", p, num_tasks=1),
            Fragment("consumer", c, num_tasks=4,
                     exchange_sources={ex_id: "producer"}),
        ]
        out = run_fragments(frags, serialize_pages=serialize)
        df = out.to_pydict()
        results.append((sum(df["s"]), sum(df["c"])))
    assert results[0] == results[1] == (3 * sum(range(100)), 100)


def test_page_zstd_roundtrip():
    import numpy as np

    from velox_tpu.serial import deserialize_page, serialize_page
    from velox_tpu.types import BIGINT, DOUBLE
    from velox_tpu.vector.batch import Batch

    rng = np.random.default_rng(0)
    b = Batch.from_pydict(
        {"k": [int(x) for x in rng.integers(0, 5, 500)],
         "v": [float(x) for x in rng.normal(size=500)]},
        {"k": BIGINT, "v": DOUBLE})
    for mode in (False, True, "zstd"):
        buf = serialize_page(b, compress=mode)
        assert deserialize_page(buf).to_pydict() == b.to_pydict()
    assert len(serialize_page(b, compress="zstd")) < len(
        serialize_page(b))
