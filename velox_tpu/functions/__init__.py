"""Function packages (Presto semantics).

Analog of velox/functions: a registry of scalar functions
(velox/functions/Registerer.h:44 registerFunction) and aggregate functions
(velox/exec/Aggregate.h:47). TPU-first: a scalar function is a pure JAX
array->array transform over (values, validity) lanes; an aggregate is a
(init, accumulate-into-groups, merge, extract) quadruple whose accumulate
step is a masked segment-reduction (scatter-add) rather than per-row
accumulator updates.
"""

from velox_tpu.functions.registry import (
    ScalarFunction, registry, register_function, lookup_function,
)
import velox_tpu.functions.scalar  # noqa: F401  (registers defaults)
from velox_tpu.functions.aggregates import (
    AggregateFunction, aggregate_registry, lookup_aggregate,
)
import velox_tpu.functions.aggregates_multi  # noqa: F401  (registers)
import velox_tpu.functions.aggregates_collect  # noqa: F401  (registers)
# approx_percentile gains digest lanes (partial/final companions) on
# top of the exact SINGLE-step collect path — register AFTER collect
from velox_tpu.functions.aggregates_digest import (  # noqa: E402
    register_percentile_digest,
)

register_percentile_digest()
from velox_tpu.functions.aggregates_wide import (  # noqa: E402
    register_wide_minmax,
)

register_wide_minmax()
import velox_tpu.functions.aggregates_noisy  # noqa: F401  (registers)

__all__ = [
    "ScalarFunction", "registry", "register_function", "lookup_function",
    "AggregateFunction", "aggregate_registry", "lookup_aggregate",
]
