"""Declarative filterprocessor matchers: strict/regexp include/exclude.

The collector's filterprocessor accepts, besides OTTL conditions, a
declarative match config that most users paste in:

  - MatchConfig {include, exclude} and MatchProperties {match_type,
    log_bodies, log_severity_texts, log_severity_number, attributes,
    resources}: internal/filter/filterconfig/config.go:22-140,243-252.
  - Skip logic (include checked before exclude, a record is dropped when
    it fails include OR hits exclude):
    internal/filter/filterlog/filterlog.go:30-50 (NewSkipExpr).
  - Property evaluation (all specified groups must match):
    internal/filter/filterlog/filterlog.go:113-130 (Eval).
  - Attribute matching (every listed key must exist; value compared
    strictly or by regexp; no-value entries are existence checks):
    internal/filter/filtermatcher/attributematcher.go:84-115.
  - Severity-number matching (undefined severity controlled by
    match_undefined, else >= min):
    internal/filter/filterlog/severity_matcher.go:24-35.
  - filterset semantics: ``strict`` is exact equality to any listed
    string, ``regexp`` is Go ``MatchString`` = unanchored search
    (internal/filter/filterset/filterset.go, regexp/regexpfilterset.go).

Here each MatchProperties compiles ONCE to a vectorized ``Expr`` tree
(pyarrow.compute kernels over whole batches); the skip expression is
``(include set AND NOT include) OR (exclude set AND exclude)`` and
``filter_logs`` applies ``keep = NOT skip`` inside ``map_batches``.

Flat-model mapping: the body is a designated string column (default
``text``), severity text/number are columns, and attributes/resources are
one column per key — a missing attribute is a null slot, so the
reference's "key must exist" check becomes a validity test.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ..expr import Expr, col, lit


class _ColIfPresent(Expr):
    """An attribute column that may not exist in the batch at all — the
    flat-model equivalent of a key no record carries. Evaluates to an
    all-null array so existence checks fail and comparisons are void."""

    def __init__(self, name: str):
        self.name = name

    def evaluate(self, batch: pa.Table):
        if self.name in batch.column_names:
            c = batch[self.name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        return pa.nulls(batch.num_rows, pa.string())

class _StrictValueEq(Expr):
    """Typed strict equality for attribute values. Arrow has no equality
    kernel across unrelated type families (e.g. the all-null string column
    a missing key materializes vs an int literal) — the reference's typed
    compare (attributematcher.go) simply doesn't match there, so kernel
    mismatch means False, never a task-killing raise."""

    def __init__(self, inner: Expr, value):
        self.inner = inner
        self.value = value

    def evaluate(self, batch: pa.Table):
        c = self.inner.evaluate(batch)
        try:
            return pc.equal(c, pa.scalar(self.value))
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid,
                pa.ArrowTypeError):
            return pa.array([False] * batch.num_rows, pa.bool_())


_MATCH_TYPES = ("strict", "regexp")


@dataclass
class AttributeMatch:
    """filterconfig.Attribute (config.go:215-228): key must exist; if
    ``value`` is not None it must also match (strict equality or regexp
    on the string form, per the parent's match_type)."""
    key: str
    value: object | None = None


@dataclass
class MatchProperties:
    """Log-relevant subset of filterconfig.MatchProperties
    (config.go:68-140). ``severity_min``/``severity_match_undefined``
    mirror LogSeverityNumberMatchProperties (config.go:243-252)."""
    match_type: str = "strict"
    log_bodies: list[str] = field(default_factory=list)
    log_severity_texts: list[str] = field(default_factory=list)
    severity_min: int | None = None
    severity_match_undefined: bool = False
    attributes: list[AttributeMatch] = field(default_factory=list)
    resources: list[AttributeMatch] = field(default_factory=list)

    def __post_init__(self):
        if self.match_type not in _MATCH_TYPES:
            raise ValueError(f"match_type must be one of {_MATCH_TYPES}")
        if (not self.log_bodies and not self.log_severity_texts
                and self.severity_min is None and not self.attributes
                and not self.resources):
            # config.go:189-196: at least one property is required
            raise ValueError("match properties are empty")


def match_properties_from_dict(d: dict) -> MatchProperties:
    """Build MatchProperties from the collector's YAML/mapstructure shape
    (filterconfig/config.go:68-140):

        match_type: strict | regexp
        log_bodies: [..]
        log_severity_texts: [..]
        log_severity_number: {min: N, match_undefined: bool}
        attributes: [{key: K, value: V}, ..]
        resources:  [{key: K, value: V}, ..]
    """
    sev = d.get("log_severity_number") or {}
    return MatchProperties(
        match_type=d.get("match_type", "strict"),
        log_bodies=list(d.get("log_bodies", [])),
        log_severity_texts=list(d.get("log_severity_texts", [])),
        severity_min=sev.get("min"),
        severity_match_undefined=bool(sev.get("match_undefined", False)),
        attributes=[AttributeMatch(a["key"], a.get("value"))
                    for a in d.get("attributes", [])],
        resources=[AttributeMatch(a["key"], a.get("value"))
                   for a in d.get("resources", [])],
    )


def _filterset(column: Expr, values: list[str], match_type: str) -> Expr:
    """filterset.FilterSet: strict = any exact equality, regexp = any
    unanchored pattern hit (Go regexp.MatchString)."""
    if match_type == "strict":
        return column.isin(values)
    e = column.match_re(values[0])
    for p in values[1:]:
        e = e | column.match_re(p)
    return e


def _attr_match(m: AttributeMatch, match_type: str) -> Expr:
    """attributematcher.go:97-113: key must exist (non-null column slot);
    with a value, strict compares typed equality and regexp searches the
    string form."""
    c = _ColIfPresent(m.key)
    exists = ~c.is_null()
    if m.value is None:
        return exists
    if match_type == "regexp":
        return exists & c.cast_string().match_re(str(m.value))
    return exists & _StrictValueEq(c, m.value)


def compile_match(mp: MatchProperties, *, body_col: str = "text",
                  severity_text_col: str = "severity_text",
                  severity_number_col: str = "severity_number") -> Expr:
    """Compile one MatchProperties to an Expr that is True where the
    record MATCHES (filterlog.go Eval: every specified group must pass)."""
    parts: list[Expr] = []
    if mp.log_bodies:
        parts.append(_filterset(col(body_col), mp.log_bodies,
                                mp.match_type))
    if mp.log_severity_texts:
        parts.append(_filterset(col(severity_text_col),
                                mp.log_severity_texts, mp.match_type))
    if mp.severity_min is not None:
        sev = col(severity_number_col)
        # severity_matcher.go:24-35 — undefined (unspecified==0; a null
        # column slot is the flat-model unspecified) is decided solely by
        # match_undefined; otherwise >= min.
        undefined = sev.is_null() | (sev == lit(0))
        defined_ok = ~undefined & (sev >= lit(mp.severity_min))
        parts.append((undefined & lit(mp.severity_match_undefined))
                     | defined_ok)
    for m in mp.attributes:
        parts.append(_attr_match(m, mp.match_type))
    for m in mp.resources:
        parts.append(_attr_match(m, mp.match_type))
    e = parts[0]
    for p in parts[1:]:
        e = e & p
    return e


def skip_expr(include: MatchProperties | None,
              exclude: MatchProperties | None, **cols) -> Expr:
    """filterlog.go:30-50 NewSkipExpr: skip = NOT include OR exclude."""
    if include is None and exclude is None:
        raise ValueError("at least one of include/exclude is required")
    parts: list[Expr] = []
    if include is not None:
        parts.append(~compile_match(include, **cols))
    if exclude is not None:
        parts.append(compile_match(exclude, **cols))
    e = parts[0]
    for p in parts[1:]:
        e = e | p
    return e


def filter_logs(ds, include: MatchProperties | None = None,
                exclude: MatchProperties | None = None, **cols):
    """Apply the declarative matcher to a Dataset: keep = NOT skip.

    The skip Expr compiles once on the driver; each batch evaluates it as
    Arrow kernels (no per-row Python). Null mask slots coerce to False
    via Expr.mask, matching the reference where a failed/void comparison
    never matches."""
    skip = skip_expr(include, exclude, **cols)

    def fn(batch):
        return batch.filter(pc.invert(skip.mask(batch)))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
