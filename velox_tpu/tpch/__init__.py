"""TPC-H workload: query plans + runner.

Analog of velox/exec/tests/utils/TpchQueryBuilder.h:71 (all 22 queries as
PlanBuilder programs) and velox/benchmarks/tpch/TpchBenchmark.cpp.
"""

from velox_tpu.tpch.queries import tpch_plan, SUPPORTED_QUERIES  # noqa: F401
