"""Session configuration.

Analog of velox/core/QueryConfig.h (157 macro-generated properties) pared
to the knobs this engine honors. One process-wide instance (`config`)
plus per-query overrides later.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class SessionConfig:
    #: device lane policy: narrow (32-bit lanes wherever exactness allows)
    #: is the TPU-native mode — 64-bit integer/float ops are emulated on
    #: TPU and pathologically slow on some backends. DECIMAL(p<=9) lanes
    #: become int32; sums use exact digit-split accumulation.
    narrow_lanes: bool = field(
        default_factory=lambda: os.environ.get(
            "VELOX_TPU_NARROW_LANES", "0") == "1")

    #: preferred rows per output batch (velox QueryConfig
    #: preferred_output_batch_rows analog)
    preferred_batch_rows: int = 1 << 20

    #: session timezone (velox QueryConfig.h:103
    #: adjust_timestamp_to_session_timezone + session_timezone):
    #: timestamp part extraction (hour/day/year/...) interprets
    #: instants in this zone via device offset tables (utils/tz.py)
    session_timezone: str = "UTC"

    #: kArray aggregation mode cap (velox kArrayHashMaxSize analog)
    max_array_groups: int = 1 << 20

    #: abandon partial aggregation when groups/rows exceeds this after
    #: min_rows (velox abandon_partial_aggregation_min_pct analog)
    abandon_partial_agg_min_pct: float = 0.8
    abandon_partial_agg_min_rows: int = 100_000

    #: use the fused linear-pipeline compiler when a pipeline matches
    fused_pipelines: bool = True

    #: right-size sparse operator outputs (exec/operator.py
    #: AdaptiveOutput): sync one count on an operator's first large
    #: output batch and compact when <12.5% of rows are live. Off by
    #: default: builds/probes/aggregations already right-size at their
    #: own (required) sync points, and on the tunneled backend the extra
    #: pack gathers measured NET-NEGATIVE on TPC-H Q18 (1.24s -> 1.43s);
    #: enable for plans with long post-filter operator chains the
    #: built-in sizing can't see.
    adaptive_compact: bool = False

    #: max key-range span for the direct-address (kArray) join table
    #: (velox HashMode::kArray analog, velox/exec/HashTable.cpp:470-520):
    #: when the build key domain fits, probing is two gathers instead of
    #: a binary search (searchsorted lowers to a log(n)-step scan on TPU)
    karray_join_span: int = 1 << 26

    #: run the sort-order property pass (plan/optimizer.py): rewrite hash
    #: joins to merge joins and aggregations to streaming aggregations
    #: where ingest-verified physical ordering proves it safe
    optimize_plans: bool = True

    #: HBM budget for buffered (blocking-operator) batches; exceeding it
    #: spills buffers to host RAM (velox memory arbitration analog).
    #: None = unlimited.
    spill_memory_budget_bytes: "int | None" = None
    #: per-query HBM cap for buffered batches (velox
    #: query_memory_per_node / QueryCtx pool capacity analog);
    #: exceeding it spills the query's own buffers. None = unlimited.
    query_memory_cap_bytes: "int | None" = None
    #: a partition acquires another writer once it has written this many
    #: bytes since its last scale-up (velox writer_min_size analog)
    writer_min_partition_bytes: int = 128 << 20

    #: hash partitions for spilled aggregation state / join builds —
    #: finish merges one partition at a time, bounding peak HBM to the
    #: largest partition (velox/exec/Spill.h spill partition bits)
    spill_agg_partitions: int = 8
    spill_join_partitions: int = 8

    #: profiling: fetch one value of every operator output so per-op
    #: walls reflect true device time (async dispatch otherwise charges
    #: an op's compute to whichever downstream op syncs first)
    profile_sync_per_op: bool = False

    #: count-replay execution (utils/replay.py): repeat runs of the same
    #: plan over the same data elide every mid-run control-value sync
    #: (output-capacity counts, dynamic-filter min/max, join flags) and
    #: validate the whole run with ONE deferred device fetch, falling
    #: back to a blocking re-run on any divergence. On the tunneled TPU
    #: backend each elided sync saves a ~30-110ms RPC round trip.
    replay_counts: bool = True

    #: decoded parquet splits kept per table (AsyncDataCache analog;
    #: 0 disables). Entries key on (columns, subfilter) — parquet files
    #: are immutable.
    scan_cache_entries: int = 4

    #: second spill rung: host-RAM bytes across spilled buffers beyond
    #: which batches move to SerializedPage FILES (velox SpillFile);
    #: None = host RAM is the final tier
    spill_host_budget_bytes: "int | None" = None
    #: background threads for the host->disk spill rung (0 = write
    #: synchronously; velox spill executor analog)
    spill_io_threads: int = 2
    spill_dir: "str | None" = None  # default: system tempdir


config = SessionConfig()
