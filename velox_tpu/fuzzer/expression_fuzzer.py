"""Expression fuzzer: engine vs independent host evaluator.

Analog of velox/expression/fuzzer/ExpressionFuzzer.h:33 with the
reference-runner role (velox/exec/fuzzer/ReferenceQueryRunner.h:53) played
by a from-scratch pandas/python evaluator implementing the same Presto
null semantics. Any value/validity mismatch on any generated tree is a
bug in one of the two evaluators.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from velox_tpu.expr.ir import (
    Call, Cast, Expr, FieldRef, Literal,
)
from velox_tpu.expr.compiler import ExprSet
from velox_tpu.fuzzer.vector_fuzzer import VectorFuzzer

_NUM_COLS = {"a": "bigint", "b": "bigint", "x": "double", "y": "double"}
_ALL_COLS = {**_NUM_COLS, "s": "varchar", "flag": "boolean"}


class ExpressionFuzzer:
    def __init__(self, seed: int = 0, num_cols=None, str_col="s",
                 bool_col="flag", int_col="a"):
        self.rng = np.random.default_rng(seed)
        self.num_cols = list(num_cols or _NUM_COLS)
        self.str_col = str_col
        self.bool_col = bool_col
        self.int_col = int_col

    # ------------------------------------------------------- generation
    def gen_numeric(self, depth: int) -> Expr:
        r = self.rng
        if depth <= 0 or r.random() < 0.35:
            if r.random() < 0.6:
                return FieldRef(None, str(r.choice(self.num_cols)))
            if r.random() < 0.5:
                return Literal(None, int(r.integers(-50, 50)))
            return Literal(None, float(np.round(r.normal(scale=20), 2)))
        roll = r.random()
        if roll < 0.15:
            # unary math (exact semantics)
            op = str(r.choice(["abs", "floor", "ceil", "sign"]))
            return Call(None, op, (self.gen_numeric(depth - 1),))
        if roll < 0.3:
            # probability cdfs (f32-internal: compared with loose tol)
            op = str(r.choice(["normal_cdf", "cauchy_cdf",
                               "laplace_cdf"]))
            return Call(None, op, (
                Literal(None, 0.0), Literal(None, 2.5),
                self.gen_numeric(depth - 1)))
        op = str(r.choice(["plus", "minus", "multiply"]))
        return Call(None, op, (
            self.gen_numeric(depth - 1), self.gen_numeric(depth - 1)))

    def gen_bool(self, depth: int) -> Expr:
        r = self.rng
        kind = str(r.choice(
            ["cmp", "and", "or", "not", "is_null", "between", "in",
             "streq", "flag"] if depth > 0 else ["cmp", "flag"]))
        if kind == "cmp":
            op = str(r.choice(["eq", "neq", "lt", "lte", "gt", "gte"]))
            return Call(None, op, (
                self.gen_numeric(depth - 1), self.gen_numeric(depth - 1)))
        if kind == "and" or kind == "or":
            return Call(None, kind, (
                self.gen_bool(depth - 1), self.gen_bool(depth - 1)))
        if kind == "not":
            return Call(None, "not", (self.gen_bool(depth - 1),))
        if kind == "is_null":
            return Call(None, "is_null", (self.gen_numeric(depth - 1),))
        if kind == "between":
            lo = int(self.rng.integers(-40, 0))
            hi = int(self.rng.integers(0, 40))
            return Call(None, "between", (
                FieldRef(None, self.int_col), Literal(None, lo),
                Literal(None, hi)))
        if kind == "in":
            vals = [int(v) for v in self.rng.integers(-20, 20, 3)]
            return Call(None, "in", (
                FieldRef(None, self.int_col),
                *[Literal(None, v) for v in vals]))
        if kind == "streq":
            return Call(None, "eq", (
                FieldRef(None, self.str_col),
                Literal(None, f"s{int(self.rng.integers(0, 14)):02d}")))
        return FieldRef(None, self.bool_col)

    def gen_string(self, depth: int) -> Expr:
        """String-valued exprs over the dictionary column (exercises
        DictTransform composition + CSE across transforms)."""
        r = self.rng
        if depth <= 0 or r.random() < 0.4:
            return FieldRef(None, self.str_col)
        kind = str(r.choice(
            ["upper", "lower", "reverse", "replace", "lpad", "rpad",
             "substr", "trim", "ltrim", "rtrim", "soundex",
             "translate", "concat"]))
        inner = self.gen_string(depth - 1)
        if kind in ("upper", "lower", "reverse", "trim", "ltrim",
                    "rtrim", "soundex"):
            return Call(None, kind, (inner,))
        if kind == "translate":
            return Call(None, "translate", (
                inner, Literal(None, "s01"), Literal(None, "z9")))
        if kind == "concat":
            return Call(None, "concat", (
                inner, Literal(None, str(r.choice(["_t", ""])))))
        if kind == "replace":
            a = str(r.choice(list("s0123")))
            b = str(r.choice(["", "x", "yy"]))
            return Call(None, "replace", (
                inner, Literal(None, a), Literal(None, b)))
        if kind in ("lpad", "rpad"):
            return Call(None, kind, (
                inner, Literal(None, int(r.integers(1, 8))),
                Literal(None, "*")))
        return Call(None, "substr", (
            inner, Literal(None, int(r.integers(1, 4))),
            Literal(None, int(r.integers(1, 4)))))

    def gen(self, depth: int = 3) -> Expr:
        if self.rng.random() < 0.15:
            # string -> scalar bridges: length/strpos/starts_with over a
            # composed transform
            k = str(self.rng.choice(
                ["length", "strpos", "starts_with",
                 "levenshtein_distance", "regexp_like"]))
            inner = self.gen_string(2)
            if k == "length":
                return Call(None, "length", (inner,))
            if k == "strpos":
                return Call(None, "strpos", (
                    inner, Literal(None, str(self.rng.choice(
                        list("s01x*"))))))
            if k == "levenshtein_distance":
                return Call(None, "levenshtein_distance", (
                    FieldRef(None, self.str_col),
                    Literal(None, "s05")))
            if k == "regexp_like":
                return Call(None, "regexp_like", (
                    FieldRef(None, self.str_col),
                    Literal(None, str(self.rng.choice(
                        [r"^s\\d+$", "0", r"\\p{Digit}{2}"])))))
            return Call(None, "starts_with", (
                inner, Literal(None, str(self.rng.choice(
                    ["s", "s0", "*", ""])))))
        if self.rng.random() < 0.5:
            return self.gen_bool(depth)
        e = self.gen_numeric(depth)
        if self.rng.random() < 0.3:
            return Call(None, "coalesce", (e, self.gen_numeric(1)))
        if self.rng.random() < 0.3:
            return Call(None, "if", (self.gen_bool(1), e,
                                     self.gen_numeric(1)))
        return e


# ---------------------------------------------------------------- oracle

def _oracle(e: Expr, df: pd.DataFrame):
    """Independent evaluator: returns pandas Series with NaN/None=null,
    implementing Presto default-null + Kleene AND/OR semantics."""
    n = len(df)
    if isinstance(e, FieldRef):
        return df[e.name]
    if isinstance(e, Literal):
        return pd.Series([e.value] * n)
    if isinstance(e, Call):
        name = e.name
        if name in ("and", "or"):
            args = [_oracle(a, df) for a in e.args]
            out = []
            for i in range(n):
                vals = [a.iloc[i] for a in args]
                vals = [None if pd.isna(v) else bool(v) for v in vals]
                if name == "and":
                    if any(v is False for v in vals):
                        out.append(False)
                    elif any(v is None for v in vals):
                        out.append(None)
                    else:
                        out.append(True)
                else:
                    if any(v is True for v in vals):
                        out.append(True)
                    elif any(v is None for v in vals):
                        out.append(None)
                    else:
                        out.append(False)
            return pd.Series(out, dtype=object)
        if name == "not":
            a = _oracle(e.args[0], df)
            return a.map(lambda v: None if pd.isna(v) else not bool(v))
        if name == "is_null":
            return _oracle(e.args[0], df).isna()
        if name == "coalesce":
            a, b = [_oracle(x, df) for x in e.args]
            return a.where(~a.isna(), b)
        if name == "if":
            c, t = _oracle(e.args[0], df), _oracle(e.args[1], df)
            f = (_oracle(e.args[2], df) if len(e.args) > 2
                 else pd.Series([None] * n))
            out = []
            for i in range(n):
                cv = c.iloc[i]
                if pd.isna(cv) or not cv:
                    out.append(f.iloc[i])
                else:
                    out.append(t.iloc[i])
            return pd.Series(out)
        if name == "between":
            v, lo, hi = [_oracle(x, df) for x in e.args]
            return pd.Series([
                None if (pd.isna(v.iloc[i]) or pd.isna(lo.iloc[i])
                         or pd.isna(hi.iloc[i]))
                else bool(lo.iloc[i] <= v.iloc[i] <= hi.iloc[i])
                for i in range(n)], dtype=object)
        if name == "in":
            v = _oracle(e.args[0], df)
            vals = [a.value for a in e.args[1:]]
            return v.map(lambda x: None if pd.isna(x) else x in vals)

        if name in ("abs", "floor", "ceil", "sign"):
            a = _oracle(e.args[0], df)
            f = {"abs": abs,
                 "floor": math.floor, "ceil": math.ceil,
                 "sign": lambda v: int(v > 0) - int(v < 0)}[name]
            def apply_unary(v):
                if pd.isna(v):
                    return None
                r = f(v)
                if name in ("floor", "ceil") and isinstance(v, float):
                    return float(r)
                if name == "sign" and isinstance(v, float):
                    return float(r)
                return r
            return a.map(apply_unary)
        if name in ("normal_cdf", "cauchy_cdf", "laplace_cdf"):
            import scipy.stats as st

            m, sd = e.args[0].value, e.args[1].value
            x = _oracle(e.args[2], df)
            dist = {"normal_cdf": st.norm, "cauchy_cdf": st.cauchy,
                    "laplace_cdf": st.laplace}[name](m, sd)
            return x.map(lambda v: None if pd.isna(v)
                         else float(dist.cdf(v)))
        if name in ("levenshtein_distance", "regexp_like"):
            from velox_tpu.functions import hostfns as H

            base = _oracle(e.args[0], df)
            lit = e.args[1].value
            hf = (H.levenshtein_distance
                  if name == "levenshtein_distance" else H.regexp_like)
            return base.map(
                lambda v: None if pd.isna(v) else hf(str(v), lit))
        if name in ("upper", "lower", "reverse", "replace", "lpad",
                    "rpad", "substr", "length", "strpos", "starts_with",
                    "trim", "ltrim", "rtrim", "soundex", "translate",
                    "concat"):
            def lpad_(s2, k, p):
                return (s2[:k] if len(s2) >= k
                        else (p * k)[: k - len(s2)] + s2)

            def rpad_(s2, k, p):
                return (s2[:k] if len(s2) >= k
                        else s2 + (p * k)[: k - len(s2)])

            from velox_tpu.functions.hostfns import soundex as _sx
            from velox_tpu.functions.hostfns import translate3 as _tr

            sfn = {
                "upper": lambda s2: s2.upper(),
                "lower": lambda s2: s2.lower(),
                "reverse": lambda s2: s2[::-1],
                "replace": lambda s2, a, b: s2.replace(a, b),
                "lpad": lpad_, "rpad": rpad_,
                "substr": lambda s2, st, ln: s2[st - 1: st - 1 + ln],
                "length": lambda s2: len(s2),
                "strpos": lambda s2, sub: s2.find(sub) + 1,
                "starts_with": lambda s2, p2: s2.startswith(p2),
                "trim": lambda s2: s2.strip(),
                "ltrim": lambda s2: s2.lstrip(),
                "rtrim": lambda s2: s2.rstrip(),
                "soundex": _sx,
                "translate": _tr,
                "concat": lambda s2, suf: s2 + suf,
            }[name]
            base = _oracle(e.args[0], df)
            extras = [a.value for a in e.args[1:]]
            return base.map(
                lambda v: None if pd.isna(v) else sfn(str(v), *extras))

        args = [_oracle(a, df) for a in e.args]
        fn = {
            "plus": lambda a, b: a + b,
            "minus": lambda a, b: a - b,
            "multiply": lambda a, b: a * b,
            "eq": lambda a, b: a == b, "neq": lambda a, b: a != b,
            "lt": lambda a, b: a < b, "lte": lambda a, b: a <= b,
            "gt": lambda a, b: a > b, "gte": lambda a, b: a >= b,
        }[name]
        out = []
        for i in range(n):
            vals = [a.iloc[i] for a in args]
            if any(pd.isna(v) for v in vals):
                out.append(None)
            else:
                out.append(fn(*vals))
        return pd.Series(out, dtype=object)
    raise TypeError(e)


def run_expression_fuzz(iterations: int = 100, seed: int = 0,
                        rows: int = 64) -> int:
    """Run the differential fuzz; returns #expressions checked. Raises on
    the first mismatch with a repro dump."""
    rng = np.random.default_rng(seed + 99)
    vf = VectorFuzzer(seed + 1)
    checked = 0
    for it in range(iterations):
        # randomized schema each iteration (the velox fuzzer generates
        # random input types; a fixed schema misses name/width variety)
        n_num = int(rng.integers(2, 6))
        names = [f"c{j}" for j in range(n_num)]
        kinds = [str(rng.choice(["bigint", "double"]))
                 for _ in range(n_num)]
        if "bigint" not in kinds:
            kinds[0] = "bigint"
        int_col = names[kinds.index("bigint")]
        sc = f"s{it % 3}"
        bc = f"b{it % 2}"
        schema = dict(zip(names, kinds))
        schema[sc] = "varchar"
        schema[bc] = "boolean"
        rows_it = int(rng.integers(max(rows // 2, 4), rows + 32))
        ef = ExpressionFuzzer(
            seed + it, num_cols=names, str_col=sc, bool_col=bc,
            int_col=int_col)
        batch = vf.batch(schema, rows_it)
        rows_cur = rows_it
        df = pd.DataFrame(batch.to_pydict())
        expr = ef.gen(3)
        try:
            es = ExprSet(
                [expr], batch.schema,
                {n: c.dictionary for n, c in batch.columns.items()
                 if c.dictionary is not None})
        except (TypeError, KeyError):
            continue  # untyped combination; generator can produce these
        arrays = {
            name: (batch.column(name).values, batch.column(name).valid)
            for name in es.field_names}
        (vals, valid) = es.evaluate(arrays)[0]
        got_vals = np.broadcast_to(
            np.asarray(vals), (max(rows_cur, 1),))[: rows_cur] \
            if np.asarray(vals).ndim == 0 \
            else np.asarray(vals)[: rows_cur]
        got_valid = (np.ones(rows_cur, bool) if valid is None
                     else np.broadcast_to(
                         np.asarray(valid), (rows_cur,))[: rows_cur]
                     if np.asarray(valid).ndim == 0
                     else np.asarray(valid)[: rows_cur])
        exp = _oracle(expr, df)
        for i in range(rows_cur):
            ev = exp.iloc[i]
            if pd.isna(ev):
                assert not got_valid[i], _repro(expr, df, i, got_vals[i], ev)
            else:
                assert got_valid[i], _repro(expr, df, i, None, ev)
                gv = got_vals[i]
                if isinstance(ev, (bool, np.bool_)):
                    assert bool(gv) == bool(ev), _repro(
                        expr, df, i, gv, ev)
                elif isinstance(ev, float) or isinstance(gv, float):
                    # f32-internal probability fns compare loosely
                    # (relative error survives downstream arithmetic)
                    tol = 3e-5 if _has_approx(expr) else 1e-9
                    assert math.isclose(
                        float(gv), float(ev), rel_tol=tol,
                        abs_tol=tol), _repro(expr, df, i, gv, ev)
                else:
                    assert int(gv) == int(ev), _repro(expr, df, i, gv, ev)
        checked += 1
    return checked


def expr_resolved(expr: Expr, batch) -> Expr:
    """The oracle consumes the UNRESOLVED tree (it does its own numeric
    coercions via python semantics)."""
    return expr


def _has_approx(e: Expr) -> bool:
    if isinstance(e, Call) and e.name in (
            "normal_cdf", "cauchy_cdf", "laplace_cdf"):
        return True
    return any(_has_approx(c) for c in e.children)


def _repro(expr, df, i, got, exp) -> str:
    return (
        f"fuzz mismatch at row {i}: got={got!r} expected={exp!r}\n"
        f"expr: {expr}\nrow: {df.iloc[i].to_dict()}")
