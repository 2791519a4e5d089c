"""Expression IR + compilation to XLA.

Analog of velox/expression (ITypedExpr velox/core/Expressions.h:61-566;
ExprSet/Expr velox/expression/Expr.h:133). TPU-first: instead of an
interpreter walking vectors with dictionary peeling and selectivity vectors,
expressions *compile* to pure JAX functions over (values, validity) pairs.
XLA then fuses the whole expression tree — including the filter mask — into
one pass over the batch, which is the speed-of-light version of Velox's
evalFlatNoNulls fast path (velox/expression/Expr.cpp:781).

Null semantics are Presto's: default-null-behavior functions return null if
any input is null (validity masks AND together); special forms (AND/OR with
Kleene logic, IF, COALESCE, IS NULL, TRY) manage validity explicitly.
"""

from velox_tpu.expr.ir import (
    Expr, FieldRef, Literal, Call, Cast, TryExpr, Lambda,
    field, lit, call, cast, and_, or_, not_, if_, switch, coalesce, try_,
    eq, neq, lt, lte, gt, gte, plus, minus, multiply, divide, is_null,
)
from velox_tpu.expr.compiler import compile_expr, compile_exprs, ExprSet
from velox_tpu.expr.parser import parse_expr

__all__ = [
    "Expr", "FieldRef", "Literal", "Call", "Cast", "TryExpr", "Lambda",
    "field", "lit", "call", "cast", "and_", "or_", "not_", "if_", "switch",
    "coalesce", "try_", "eq", "neq", "lt", "lte", "gt", "gte",
    "plus", "minus", "multiply", "divide", "is_null",
    "compile_expr", "compile_exprs", "ExprSet", "parse_expr",
]
