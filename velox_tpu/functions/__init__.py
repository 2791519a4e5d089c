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

def all_scalar_function_names() -> "set[str]":
    """Every scalar function name reachable from an expression — the
    device registry plus the compiler's bind-time host tables
    (dictionary-value, multi-string, int-value, string-host) and the
    array/map/lambda special forms handled structurally by the
    compiler and ProjectOp. This is the introspection surface the
    parity count uses (reference scope:
    velox/functions/prestosql/registration/)."""
    from velox_tpu.expr import compiler as C

    names = set(registry)
    names |= set(C._DICT_VALUE_FNS)
    names |= {n[:-1] if n.endswith("2") and n[:-1] in (
        "trim", "ltrim", "rtrim") else n for n in C._STRING_MULTI_FNS}
    names |= set(C._STRING_HOST_FNS)
    names |= set(C._INT_VALUE_FNS)
    names |= set(getattr(C, "_ARRAY_FUNCS", ()) or ())
    names |= {
        # structural special forms (expr/compiler.py + exec/operators
        # ProjectOp array/map paths)
        "length", "concat", "substr", "substring", "cardinality",
        "element_at", "subscript", "date_format", "format_datetime",
        "any_match", "all_match", "none_match", "transform", "filter",
        "zip_with", "map_keys", "map_values", "map_entries",
        "map_filter", "map_concat", "transform_keys",
        "transform_values", "sequence", "slice", "repeat",
        "array_sort", "array_distinct", "array_intersect",
        "array_except", "array_union", "arrays_overlap", "split",
        "regexp_split", "regexp_extract_all", "at_timezone",
        "timezone_hour", "timezone_minute", "now", "current_date",
        "current_timestamp", "localtimestamp", "date_add",
        "date_diff", "date_trunc", "to_unixtime", "to_iso8601",
        "typeof", "current_timezone",
    }
    return names


__all__ = [
    "ScalarFunction", "registry", "register_function", "lookup_function",
    "AggregateFunction", "aggregate_registry", "lookup_aggregate",
    "all_scalar_function_names",
]
