"""Process-wide metrics.

Analog of velox's StatsReporter macros + RuntimeMetrics
(velox/common/base/StatsReporter.h:348, RuntimeMetrics.h:42): named
counters/gauges/histograms recorded through a pluggable reporter. The
default reporter keeps in-process values for tests/inspection.
"""

from __future__ import annotations

import threading
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class RuntimeMetric:
    """Aggregated metric: sum/count/min/max (velox RuntimeMetric)."""

    unit: str = "none"
    sum: float = 0.0
    count: int = 0
    min: float = float("inf")
    max: float = float("-inf")

    def add(self, value: float) -> None:
        self.sum += value
        self.count += 1
        self.min = min(self.min, value)
        self.max = max(self.max, value)

    def merge(self, other: "RuntimeMetric") -> None:
        self.sum += other.sum
        self.count += other.count
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)


class StatsReporter:
    """Pluggable sink (BaseStatsReporter analog); default: in-process."""

    def __init__(self):
        self._lock = threading.Lock()
        self.counters: Dict[str, float] = defaultdict(float)
        self.gauges: Dict[str, float] = {}
        self.histograms: Dict[str, List[float]] = defaultdict(list)

    def add_counter(self, name: str, value: float = 1) -> None:
        with self._lock:
            self.counters[name] += value

    def set_gauge(self, name: str, value: float) -> None:
        with self._lock:
            self.gauges[name] = value

    def add_histogram(self, name: str, value: float) -> None:
        with self._lock:
            self.histograms[name].append(value)

    def snapshot(self) -> Dict[str, object]:
        with self._lock:
            return {
                "counters": dict(self.counters),
                "gauges": dict(self.gauges),
                "histograms": {
                    k: {"count": len(v),
                        "sum": sum(v),
                        "max": max(v) if v else None}
                    for k, v in self.histograms.items()},
            }

    def clear(self) -> None:
        with self._lock:
            self.counters.clear()
            self.gauges.clear()
            self.histograms.clear()


reporter = StatsReporter()

# named metrics the engine records (velox/common/base/Counters.h analog)
METRIC_TASK_EXECUTIONS = "velox_tpu.task_executions"
METRIC_BATCHES_PROCESSED = "velox_tpu.batches_processed"
METRIC_JIT_CACHE_SIZE = "velox_tpu.jit_cache_size"
METRIC_OPERATOR_WALL_S = "velox_tpu.operator_wall_s"
