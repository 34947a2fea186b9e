"""Tiny vectorized expression layer: OTTL/expr-lang conditions -> Arrow masks.

The reference evaluates per-record boolean conditions in two places: OTTL
``where`` clauses (pkg/ottl/expression.go, compare rules in pkg/ottl/compare.go
and LANGUAGE.md "Comparison Rules") and expr-lang ``if``/router expressions
(pkg/stanza/operator/helper/expr_string.go). We compile the same shapes to
``pyarrow.compute`` boolean kernels evaluated over whole batches.

Comparison-rule fidelity notes (LANGUAGE.md):
  - cross-type comparisons are "not equal" -> we surface them as Arrow cast
    errors at compile time instead of silently false; our conformance tests
    pin the common same-type cases.
  - null (pcommon empty) compares not-equal to everything except null == null
    ("two nil values are equal", equality only): ``==`` fills null slots with
    both-null, ``!=`` with exactly-one-null (xor of validities), and ``~``
    inverts the OTTL truth value (null -> False first). ``== None`` /
    ``!= None`` dispatch to validity checks. Remaining kernels yield null for
    null inputs and ``mask()`` coerces null to False.

Usage:
    from opentelemetry_collector_contrib_ray.expr import col, lit
    e = (col("severity_number") >= 17) | col("tool").isin(["bash"])
    mask = e.mask(batch)   # pa.BooleanArray, null -> False
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class Expr:
    def evaluate(self, batch: pa.Table):  # pragma: no cover - abstract
        raise NotImplementedError

    def mask(self, batch: pa.Table) -> pa.Array:
        """Evaluate as a routing/filter mask: nulls coerce to False."""
        out = self.evaluate(batch)
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        return pc.fill_null(pc.cast(out, pa.bool_()), False)

    # comparisons
    def __eq__(self, other):  # type: ignore[override]
        if other is None:
            return _IsNull(self)
        return _Cmp("equal", self, _wrap(other))

    def __ne__(self, other):  # type: ignore[override]
        if other is None:
            return _Not(_IsNull(self))
        return _Cmp("not_equal", self, _wrap(other))

    def __lt__(self, other):
        return _Cmp("less", self, _wrap(other))

    def __le__(self, other):
        return _Cmp("less_equal", self, _wrap(other))

    def __gt__(self, other):
        return _Cmp("greater", self, _wrap(other))

    def __ge__(self, other):
        return _Cmp("greater_equal", self, _wrap(other))

    # boolean algebra (kleene, like SQL / OTTL and/or)
    def __and__(self, other):
        return _Bool("and_kleene", self, _wrap(other))

    def __or__(self, other):
        return _Bool("or_kleene", self, _wrap(other))

    def __invert__(self):
        return _Not(self)

    # helpers
    def isin(self, values):
        return _IsIn(self, list(values))

    def is_null(self):
        return _IsNull(self)

    def match_re(self, pattern: str):
        """OTTL IsMatch(target, pattern) (func_is_match.go): RE2 partial match."""
        return _MatchRe(self, pattern)

    def contains(self, sub: str):
        return _Contains(self, sub)

    def starts_with(self, prefix: str):
        return _StartsWith(self, prefix)

    def cast_string(self):
        """String form of the value (pcommon Value.AsString analogue) for
        regexp matching against non-string columns."""
        return _CastString(self)

    __hash__ = None  # type: ignore[assignment]


class Col(Expr):
    def __init__(self, name: str):
        self.name = name

    def evaluate(self, batch):
        c = batch[self.name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


class Lit(Expr):
    def __init__(self, value):
        self.value = value

    def evaluate(self, batch):
        return pa.scalar(self.value)


def _wrap(v) -> Expr:
    return v if isinstance(v, Expr) else Lit(v)


class _Cmp(Expr):
    def __init__(self, op, left, right):
        self.op, self.left, self.right = op, left, right

    def evaluate(self, batch):
        lhs = self.left.evaluate(batch)
        rhs = self.right.evaluate(batch)
        out = getattr(pc, self.op)(lhs, rhs)
        if self.op in ("equal", "not_equal"):
            out = _null_aware_eq(out, lhs, rhs, self.op == "not_equal")
        return out


def _null_aware_eq(out, lhs, rhs, negate: bool):
    """OTTL LANGUAGE.md "Comparison Rules": nil == nil is true (equality
    only); nil vs non-nil is not-equal. Arrow's equal/not_equal yield null
    whenever either side is null, so fill only those slots: equal gets
    both-null, not_equal gets exactly-one-null (xor of validities)."""
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    if isinstance(out, pa.Scalar):
        if out.is_valid:
            return out
    elif not out.null_count:
        return out
    lv = pc.is_valid(lhs)
    rv = pc.is_valid(rhs)
    if isinstance(lv, pa.ChunkedArray):
        lv = lv.combine_chunks()
    if isinstance(rv, pa.ChunkedArray):
        rv = rv.combine_chunks()
    if negate:
        fill = pc.xor(lv, rv)             # exactly one side null -> True
    else:
        fill = pc.invert(pc.or_(lv, rv))  # both null -> True
    return pc.if_else(pc.and_(lv, rv), out, fill)


class _Bool(Expr):
    def __init__(self, op, left, right):
        self.op, self.left, self.right = op, left, right

    def evaluate(self, batch):
        return getattr(pc, self.op)(self.left.evaluate(batch),
                                    self.right.evaluate(batch))


class _Not(Expr):
    def __init__(self, inner):
        self.inner = inner

    def evaluate(self, batch):
        # invert the OTTL truth value: a null condition is False, so its
        # negation must be True (plain pc.invert would keep it null)
        return pc.invert(pc.fill_null(self.inner.evaluate(batch), False))


class _FillNull(Expr):
    def __init__(self, inner, fill: bool):
        self.inner, self.fill = inner, fill

    def evaluate(self, batch):
        return pc.fill_null(self.inner.evaluate(batch), self.fill)


class _IsIn(Expr):
    def __init__(self, inner, values):
        self.inner, self.values = inner, values

    def evaluate(self, batch):
        return pc.is_in(self.inner.evaluate(batch), value_set=pa.array(self.values))


class _IsNull(Expr):
    def __init__(self, inner):
        self.inner = inner

    def evaluate(self, batch):
        return pc.is_null(self.inner.evaluate(batch))


class _MatchRe(Expr):
    def __init__(self, inner, pattern):
        self.inner, self.pattern = inner, pattern

    def evaluate(self, batch):
        return pc.match_substring_regex(self.inner.evaluate(batch), self.pattern)


class _Contains(Expr):
    def __init__(self, inner, sub):
        self.inner, self.sub = inner, sub

    def evaluate(self, batch):
        return pc.match_substring(self.inner.evaluate(batch), self.sub)


class _StartsWith(Expr):
    def __init__(self, inner, prefix):
        self.inner, self.prefix = inner, prefix

    def evaluate(self, batch):
        return pc.starts_with(self.inner.evaluate(batch), self.prefix)


class _CastString(Expr):
    def __init__(self, inner):
        self.inner = inner

    def evaluate(self, batch):
        out = self.inner.evaluate(batch)
        if pa.types.is_string(out.type) or pa.types.is_large_string(out.type):
            return out
        return pc.cast(out, pa.string())


def col(name: str) -> Col:
    return Col(name)


def lit(value) -> Lit:
    return Lit(value)
