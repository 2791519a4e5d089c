"""Type system for the TPU-native query engine.

Modeled on the behavioral contract of velox/type (reference:
velox/type/Type.h:74-96 TypeKind enum; velox/type/Type.h:528 Type tree), but
designed TPU-first: every scalar type maps to a fixed-width device dtype that
XLA can tile, strings are dictionary-encoded (int32 codes + host-side value
table) rather than StringView (velox/type/StringView.h), and decimals are
fixed-point int64/int128-free lanes (scaled int64) so money math never touches
float on the MXU/VPU.
"""

from velox_tpu.types.types import (
    TypeKind,
    DataType,
    BOOLEAN,
    TINYINT,
    SMALLINT,
    INTEGER,
    BIGINT,
    REAL,
    DOUBLE,
    VARCHAR,
    VARBINARY,
    DATE,
    TIMESTAMP,
    DECIMAL,
    ROW,
    ARRAY,
    MAP,
    UNKNOWN,
    RowType,
    ArrayType,
    MapType,
    DecimalType,
)
from velox_tpu.types.filters import (
    Filter,
    AlwaysTrue,
    AlwaysFalse,
    IsNull,
    IsNotNull,
    BigintRange,
    DoubleRange,
    BigintValuesUsingHashTable,
    BytesValues,
    NegatedBigintRange,
    MultiRange,
)

__all__ = [
    "TypeKind", "DataType", "RowType", "ArrayType", "MapType", "DecimalType",
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "REAL", "DOUBLE",
    "VARCHAR", "VARBINARY", "DATE", "TIMESTAMP", "DECIMAL", "ROW", "ARRAY", "MAP", "UNKNOWN",
    "Filter", "AlwaysTrue", "AlwaysFalse", "IsNull", "IsNotNull",
    "BigintRange", "DoubleRange", "BigintValuesUsingHashTable", "BytesValues",
    "NegatedBigintRange", "MultiRange",
]
