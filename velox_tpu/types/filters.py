"""Filter pushdown hierarchy.

Behavioral analog of velox/type/Filter.h:32-56 (24 filter kinds — ranges,
value sets, null tests, negations, multi-range). On TPU these become
*vectorized mask producers*: each filter knows how to turn a device value
array + validity mask into a boolean selection mask, so scans and dynamic
(join-produced) filters evaluate as fused elementwise XLA ops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Filter:
    """Base filter. ``null_allowed`` mirrors Velox's nullAllowed flag."""

    null_allowed: bool = False

    def mask(self, values, valid):
        """Return bool[n] selection mask given values + validity arrays."""
        m = self._test(values)
        if self.null_allowed:
            return jnp.where(valid, m, True)
        return jnp.logical_and(m, valid)

    def _test(self, values):  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass(frozen=True)
class AlwaysTrue(Filter):
    def mask(self, values, valid):
        return jnp.ones(values.shape, dtype=jnp.bool_)

    def _test(self, values):
        return jnp.ones(values.shape, dtype=jnp.bool_)


@dataclass(frozen=True)
class AlwaysFalse(Filter):
    def mask(self, values, valid):
        return jnp.zeros(values.shape, dtype=jnp.bool_)

    def _test(self, values):
        return jnp.zeros(values.shape, dtype=jnp.bool_)


@dataclass(frozen=True)
class IsNull(Filter):
    def mask(self, values, valid):
        return jnp.logical_not(valid)


@dataclass(frozen=True)
class IsNotNull(Filter):
    def mask(self, values, valid):
        return valid


@dataclass(frozen=True)
class BigintRange(Filter):
    """[lower, upper] inclusive on integer lanes (Filter.h kBigintRange)."""

    lower: int = -(2**63)
    upper: int = 2**63 - 1

    def _test(self, values):
        return jnp.logical_and(values >= self.lower, values <= self.upper)


@dataclass(frozen=True)
class NegatedBigintRange(Filter):
    lower: int = 0
    upper: int = 0

    def _test(self, values):
        return jnp.logical_or(values < self.lower, values > self.upper)


@dataclass(frozen=True)
class DoubleRange(Filter):
    """Float range with open/closed bounds (Filter.h kDoubleRange)."""

    lower: float = -np.inf
    lower_exclusive: bool = False
    upper: float = np.inf
    upper_exclusive: bool = False

    def _test(self, values):
        lo = values > self.lower if self.lower_exclusive else values >= self.lower
        hi = values < self.upper if self.upper_exclusive else values <= self.upper
        return jnp.logical_and(lo, hi)


@dataclass(frozen=True)
class BigintValuesUsingHashTable(Filter):
    """IN-list over integers (Filter.h kBigintValuesUsingHashTable).

    TPU realization: small lists compare-and-OR (fused by XLA); this covers
    pushdown from dictionary-encoded string predicates too, since those are
    int32 code comparisons.
    """

    values: Tuple[int, ...] = ()

    def _test(self, values):
        vals = np.asarray(self.values, dtype=np.asarray(values).dtype
                          if hasattr(values, "dtype") else np.int64)
        if len(vals) == 0:
            return jnp.zeros(values.shape, dtype=jnp.bool_)
        # compare against each constant; XLA fuses this into one pass
        m = values == vals[0]
        for v in vals[1:]:
            m = jnp.logical_or(m, values == v)
        return m


@dataclass(frozen=True)
class BytesValues(Filter):
    """IN-list over strings — applied to dictionary codes after the host
    translates string literals into codes for the column's dictionary."""

    values: Tuple[str, ...] = ()

    def _test(self, values):  # pragma: no cover — rewritten to code IN-list
        raise RuntimeError(
            "BytesValues must be rewritten to BigintValuesUsingHashTable over "
            "dictionary codes before device evaluation"
        )


@dataclass(frozen=True)
class MultiRange(Filter):
    """OR of disjoint filters (Filter.h kMultiRange)."""

    filters: Tuple[Filter, ...] = ()

    def mask(self, values, valid):
        m = self.filters[0].mask(values, valid)
        for f in self.filters[1:]:
            m = jnp.logical_or(m, f.mask(values, valid))
        if self.null_allowed:
            m = jnp.logical_or(m, jnp.logical_not(valid))
        return m
