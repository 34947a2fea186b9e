"""Metric-structural OTTL editors for the transformprocessor metrics
contexts (processor/transformprocessor/internal/metrics/functions.go):
scale_metric, copy_metric, extract_sum_metric, extract_count_metric,
convert_sum_to_gauge, convert_gauge_to_sum, convert_summary_sum_val_to_sum,
convert_summary_count_val_to_sum, aggregate_on_attributes,
aggregate_on_attribute_value.

Flat datapoint envelope (one row per datapoint; SURVEY.md §1.3 flat-model
analogue of pmetric):

- ``metric_name`` / ``metric_unit`` / ``metric_description`` — strings
- ``metric_type`` — "Gauge" | "Sum" | "Histogram" | "ExponentialHistogram"
  | "Summary"; a missing column means all rows are number points ("Gauge")
- ``metric_temporality`` — "delta" | "cumulative" | null (unspecified)
- ``metric_is_monotonic`` — bool
- number points carry ``value``; histogram/summary points carry ``sum``,
  ``count``, ``min``, ``max``, ``explicit_bounds`` (list<double>),
  ``bucket_counts`` (list<int>), ``quantile_qs``/``quantile_vals``
  (list<double>); ``attributes`` (map), ``ts``, ``start_ts``

Batch-model deltas (documented, DIVERGENCES.md):

- appended rows (copy_metric / extract_* / convert_summary_*) land at the
  END of the batch and are seen by SUBSEQUENT statements only; the
  reference's grow-during-iteration slice also re-runs EARLIER statements
  of the same sequence on appended metrics.
- convert_summary_*_val_to_sum runs per gated datapoint row and emits ONE
  row per gated dp; the reference (a datapoint-context function) appends a
  whole metric carrying every dp of the summary once per dp invocation —
  identical output for single-dp summaries (the reference test corpus).
- pdata keeps int and double number points distinct; the flat model has
  one ``value`` column, so extracted counts / Count-aggregates are cast to
  that column's type.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import maps as M

NUM_TYPES = ("Gauge", "Sum")
AGG_FNS = ("sum", "mean", "min", "max", "median", "count")

# columns that belong to a specific point shape: nulled out on rows whose
# metric_type changes shape (extract_* / convert_summary_* outputs)
_SHAPE_COLS = ("sum", "count", "min", "max", "explicit_bounds",
               "bucket_counts", "quantile_qs", "quantile_vals")


def _st():  # lazy: statements.py imports this module at load time
    from . import statements as S
    return S


def _arr(col):
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _typ(ctx) -> pa.Array:
    b = ctx.batch
    if "metric_type" in b.column_names:
        return _arr(b["metric_type"])
    return pa.array(["Gauge"] * ctx.n, pa.string())


def _npmask(mask) -> np.ndarray:
    return pc.fill_null(mask, False).to_numpy(zero_copy_only=False)


def _scalar(node, ctx):
    v = _st().eval_expr(node, ctx)
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        raise ValueError("editor argument must be a literal")
    return v


def _value(node, ctx):
    """Getter argument: per-row array or scalar."""
    return _st().eval_expr(node, ctx)


def _set_col(batch: pa.Table, name: str, arr) -> pa.Table:
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)


def _masked_set(ctx, name: str, new, mask) -> pa.Table:
    """Set column `name` to `new` (array or scalar) on mask rows only."""
    b = ctx.batch
    if name in b.column_names:
        old = _arr(b[name])
    else:
        t = new.type if isinstance(new, pa.Array) else None
        old = pa.nulls(ctx.n, t or pa.scalar(new).type)
    if not isinstance(new, (pa.Array, pa.ChunkedArray)):
        new = pa.array([new] * ctx.n, old.type if old.type != pa.null()
                       else None)
    return _set_col(b, name, _st()._choose_rows(mask, _arr(new), old))


def _scale_list_col(col: pa.Array, mult: float) -> pa.Array:
    """Element-wise multiply inside a list<floating> column."""
    a = _arr(col)
    flat = pc.multiply(a.values, pa.scalar(float(mult), a.type.value_type))
    return pa.ListArray.from_arrays(a.offsets, flat)


def _mult_col(a: pa.Array, mult: float) -> pa.Array:
    """value * mult with pdata semantics: int points truncate
    (int64(float64(v) * mult), func_scale.go scaleMetric)."""
    if pa.types.is_integer(a.type):
        scaled = pc.multiply(pc.cast(a, pa.float64()), mult)
        return pc.cast(pc.trunc(scaled), a.type)
    return pc.multiply(a, pa.scalar(float(mult), a.type))


def _null_shape_cols(rows: pa.Table) -> pa.Table:
    for c in _SHAPE_COLS:
        if c in rows.column_names:
            i = rows.column_names.index(c)
            rows = rows.set_column(
                i, c, pa.nulls(rows.num_rows, rows.schema.field(c).type))
    return rows


def _append(batch: pa.Table, rows: pa.Table) -> pa.Table:
    if rows.num_rows == 0:
        return batch
    return pa.concat_tables([batch, rows.select(batch.column_names)])


def _temporality_scalar(s: str) -> str:
    if s not in ("delta", "cumulative"):
        raise ValueError(f"unknown aggregation temporality: {s}")
    return s


# ---------------------------------------------------------------------------
# scale_metric
# ---------------------------------------------------------------------------

def scale_metric(ctx, args, kwargs, mask):
    """func_scale.go Scale: value/sum/min/max/bounds/quantiles * multiplier
    per metric type; optional unit override; exponential histograms
    rejected."""
    mult = float(_scalar(args[0], ctx))
    unit = None
    if len(args) > 1:
        unit = args[1]
    elif "unit" in kwargs:
        unit = kwargs["unit"]
    typ = _typ(ctx)
    m = _npmask(mask)
    tv = typ.to_numpy(zero_copy_only=False)
    bad = m & (tv == "ExponentialHistogram")
    if bad.any():
        raise ValueError("exponential histograms are not supported by the "
                         "'scale_metric' function")
    unknown = m & ~np.isin(tv, ("Gauge", "Sum", "Histogram", "Summary")) \
        & (tv != None)  # noqa: E711 — numpy elementwise None compare
    if unknown.any():
        raise ValueError(
            f"unsupported metric type: '{tv[unknown.argmax()]}'")
    b = ctx.batch
    num = pa.array(m & np.isin(tv, NUM_TYPES))
    hist = pa.array(m & (tv == "Histogram"))
    summ = pa.array(m & (tv == "Summary"))
    if "value" in b.column_names:
        old = _arr(b["value"])
        b = _set_col(b, "value",
                     _st()._choose_rows(num, _mult_col(old, mult), old))
    for c, mk in (("sum", pc.or_(hist, summ)), ("min", hist), ("max", hist)):
        if c in b.column_names:
            old = _arr(b[c])
            b = _set_col(b, c,
                         _st()._choose_rows(mk, _mult_col(old, mult), old))
    for c, mk in (("explicit_bounds", hist), ("quantile_vals", summ)):
        if c in b.column_names:
            old = _arr(b[c])
            b = _set_col(b, c,
                         _st()._choose_rows(mk, _scale_list_col(old, mult),
                                            old))
    ctx.batch = b
    if unit is not None:
        u = _value(unit, ctx)
        return _masked_set(ctx, "metric_unit", u, mask)
    return b


# ---------------------------------------------------------------------------
# copy_metric
# ---------------------------------------------------------------------------

def copy_metric(ctx, args, kwargs, mask):
    """func_copy_metric.go: duplicate the gated metric's datapoints with
    optional name/description/unit overrides, appended at batch end."""
    if args:
        raise ValueError("copy_metric takes only named arguments "
                         "(name=, description=, unit=)")
    overrides = {}
    for k, node in kwargs.items():
        if k not in ("name", "description", "unit"):
            raise ValueError(f"copy_metric: unknown argument {k!r}")
        overrides["metric_" + k] = _value(node, ctx)
    rows = ctx.batch.filter(mask)
    for col, v in overrides.items():
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            v = _arr(v).filter(mask)
        else:
            v = pa.array([v] * rows.num_rows, pa.string())
        if col in rows.column_names:
            rows = rows.set_column(rows.column_names.index(col), col,
                                   pc.cast(v, rows.schema.field(col).type))
        else:
            rows = rows.append_column(col, v)
    return _append(ctx.batch, rows)


# ---------------------------------------------------------------------------
# extract_sum_metric / extract_count_metric
# ---------------------------------------------------------------------------

def _extract(ctx, args, mask, what: str):
    monotonic = bool(_scalar(args[0], ctx))
    typ = _typ(ctx)
    tv = typ.to_numpy(zero_copy_only=False)
    m = _npmask(mask)
    ok_types = ("Histogram", "ExponentialHistogram", "Summary")
    bad = m & ~np.isin(tv, ok_types)
    if bad.any():
        raise ValueError(
            f"extract_{what}_metric requires an input metric of type "
            f"Histogram, ExponentialHistogram or Summary, got "
            f"{tv[bad.argmax()]}")
    b = ctx.batch
    # temporality: histograms carry their own; summaries are cumulative by
    # spec (func_extract_sum_metric.go getAggregationTemporality)
    if "metric_temporality" in b.column_names:
        temp = _arr(b["metric_temporality"])
    else:
        temp = pa.nulls(ctx.n, pa.string())
    is_summ = tv == "Summary"
    temp = _st()._choose_rows(pa.array(is_summ),
                              pa.array(["cumulative"] * ctx.n), temp)
    unspec = m & ~is_summ & np.asarray(pc.is_null(temp))
    if unspec.any():
        raise ValueError(f"extract_{what}_metric: aggregation temporality "
                         "is unspecified")
    src = m.copy()
    if what == "sum" and "sum" in b.column_names:
        # histograms only contribute dps that HAVE a sum
        has = np.asarray(pc.is_valid(_arr(b["sum"])))
        src &= has | is_summ
    rows = b.filter(pa.array(src))
    if rows.num_rows == 0:
        return b
    name = pc.binary_join_element_wise(
        pc.cast(rows["metric_name"], pa.string()), f"_{what}", "")
    srccol = _arr(rows[what]) if what in rows.column_names \
        else pa.nulls(rows.num_rows, pa.float64())
    vtype = b.schema.field("value").type if "value" in b.column_names \
        else pa.float64()
    value = pc.cast(srccol, vtype)
    rows = _set_col(rows, "metric_name", name)
    rows = _set_col(rows, "metric_type",
                    pa.array(["Sum"] * rows.num_rows))
    rows = _set_col(rows, "metric_temporality",
                    _arr(temp).filter(pa.array(src)))
    rows = _set_col(rows, "metric_is_monotonic",
                    pa.array([monotonic] * rows.num_rows))
    rows = _null_shape_cols(rows)
    rows = _set_col(rows, "value", value)
    return _append(b, rows)


def extract_sum_metric(ctx, args, kwargs, mask):
    return _extract(ctx, args, mask, "sum")


def extract_count_metric(ctx, args, kwargs, mask):
    return _extract(ctx, args, mask, "count")


# ---------------------------------------------------------------------------
# convert_* editors
# ---------------------------------------------------------------------------

def convert_sum_to_gauge(ctx, args, kwargs, mask):
    """func_convert_sum_to_gauge.go: Sum -> Gauge in place (temporality and
    monotonicity are gauge-less, cleared)."""
    typ = _typ(ctx)
    sel = pc.and_(mask, pc.equal(typ, "Sum"))
    ctx.batch = _masked_set(ctx, "metric_type", "Gauge", sel)
    if "metric_temporality" in ctx.batch.column_names:
        old = _arr(ctx.batch["metric_temporality"])
        ctx.batch = _set_col(
            ctx.batch, "metric_temporality",
            _st()._choose_rows(sel, pa.nulls(ctx.n, old.type), old))
    if "metric_is_monotonic" in ctx.batch.column_names:
        old = _arr(ctx.batch["metric_is_monotonic"])
        ctx.batch = _set_col(
            ctx.batch, "metric_is_monotonic",
            _st()._choose_rows(sel, pa.nulls(ctx.n, old.type), old))
    return ctx.batch


def convert_gauge_to_sum(ctx, args, kwargs, mask):
    temp = _temporality_scalar(str(_scalar(args[0], ctx)))
    mono = bool(_scalar(args[1], ctx))
    typ = _typ(ctx)
    sel = pc.and_(mask, pc.equal(typ, "Gauge"))
    ctx.batch = _masked_set(ctx, "metric_type", "Sum", sel)
    ctx.batch = _masked_set(ctx, "metric_temporality", temp, sel)
    return _masked_set(ctx, "metric_is_monotonic", mono, sel)


def _convert_summary(ctx, args, mask, what: str):
    temp = _temporality_scalar(str(_scalar(args[0], ctx)))
    mono = bool(_scalar(args[1], ctx))
    typ = _typ(ctx)
    src = pc.and_(mask, pc.equal(typ, "Summary"))
    rows = ctx.batch.filter(src)
    if rows.num_rows == 0:
        return ctx.batch
    n = rows.num_rows
    name = pc.binary_join_element_wise(
        pc.cast(rows["metric_name"], pa.string()), f"_{what}", "")
    srccol = _arr(rows[what]) if what in rows.column_names \
        else pa.nulls(n, pa.float64())
    vtype = ctx.batch.schema.field("value").type \
        if "value" in ctx.batch.column_names else pa.int64()
    rows = _set_col(rows, "metric_name", name)
    rows = _set_col(rows, "metric_type", pa.array(["Sum"] * n))
    rows = _set_col(rows, "metric_temporality", pa.array([temp] * n))
    rows = _set_col(rows, "metric_is_monotonic", pa.array([mono] * n))
    rows = _null_shape_cols(rows)
    rows = _set_col(rows, "value", pc.cast(srccol, vtype))
    return _append(ctx.batch, rows)


def convert_summary_sum_val_to_sum(ctx, args, kwargs, mask):
    return _convert_summary(ctx, args, mask, "sum")


def convert_summary_count_val_to_sum(ctx, args, kwargs, mask):
    return _convert_summary(ctx, args, mask, "count")


# ---------------------------------------------------------------------------
# aggregate_on_attributes / aggregate_on_attribute_value
# ---------------------------------------------------------------------------

def _attrs_key(attrs: pa.Array, n: int) -> np.ndarray:
    """Order-insensitive canonical string per attributes map (pdatautil
    MapHash analogue): sorted k=v joined. Vectorized via a flattened
    lexsort + pandas C-level group-join."""
    if attrs is None:
        return np.full(n, "", object)
    a = _arr(attrs)
    off = np.asarray(a.offsets, np.int64)
    keys = np.asarray(a.keys.cast(pa.string()).to_numpy(
        zero_copy_only=False), object)
    items = np.asarray(pc.cast(a.items, pa.string()).to_numpy(
        zero_copy_only=False), object)
    row = np.repeat(np.arange(n), off[1:] - off[:-1])
    if len(row) == 0:
        return np.full(n, "", object)
    order = np.lexsort((keys, row))
    kv = pd.Series(keys[order].astype(str)) + "\x1d" + \
        pd.Series(items[order].astype(str))
    joined = kv.groupby(row[order]).agg("\x1e".join)
    out = np.full(n, "", object)
    out[joined.index.to_numpy()] = joined.to_numpy()
    return out


def _identity_key(b: pa.Table, n: int) -> pd.Series:
    parts = []
    for c in ("metric_name", "metric_unit", "metric_description",
              "metric_type", "metric_temporality", "metric_is_monotonic"):
        if c in b.column_names:
            parts.append(pd.Series(
                _arr(b[c]).cast(pa.string()).to_pandas()).fillna("\x00"))
    if not parts:
        return pd.Series(np.full(n, "", object))
    out = parts[0]
    for p in parts[1:]:
        out = out + "\x1f" + p
    return out


def _group_key(rows: pa.Table) -> np.ndarray:
    """aggregateutil dataPointHashKey: attributes + timestamp, plus start
    timestamp for delta-temporality metrics — prefixed with the metric
    identity (the reference groups within one metric; a batch can hold
    many)."""
    n = rows.num_rows
    key = _identity_key(rows, n)
    attrs = rows["attributes"] if "attributes" in rows.column_names else None
    key = key + "\x1f" + pd.Series(_attrs_key(attrs, n)).astype(str)
    for c in ("ts",):
        if c in rows.column_names:
            key = key + "\x1f" + pd.Series(
                _arr(rows[c]).cast(pa.string()).to_pandas()).fillna("\x00")
    if "metric_temporality" in rows.column_names and \
            "start_ts" in rows.column_names:
        is_delta = pd.Series(np.asarray(pc.fill_null(pc.equal(
            _arr(rows["metric_temporality"]), "delta"), False)))
        st = pd.Series(_arr(rows["start_ts"]).cast(pa.string())
                       .to_pandas()).fillna("\x00")
        key = key + "\x1f" + st.where(is_delta, "")
    return key.to_numpy()


def _merge_number(rows: pa.Table, codes: np.ndarray, firsts: np.ndarray,
                  aggfn: str) -> pa.Table:
    """mergeNumberDataPoints: one row per group (first dp as base), value
    merged by aggfn, start_ts = min."""
    out = rows.take(pa.array(firsts))
    if "value" in rows.column_names:
        vals = _arr(rows["value"])
        is_int = pa.types.is_integer(vals.type)
        s = pd.Series(vals.to_pandas())
        g = s.groupby(codes)
        if aggfn in ("sum", "min", "max"):
            merged = getattr(g, aggfn)()
        elif aggfn == "count":
            merged = g.size().astype("float64")
        elif aggfn == "mean":
            if is_int:  # Go: integer division of the running total
                merged = (g.sum() // g.size()).astype("int64")
            else:
                merged = g.mean()
        elif aggfn == "median":
            if is_int:  # Go int median: (a+b)/2 integer division
                def _imed(x):
                    v = np.sort(x.to_numpy())
                    mid = len(v) // 2
                    if len(v) % 2:
                        return int(v[mid])
                    return int((int(v[mid - 1]) + int(v[mid])) // 2)
                merged = g.agg(_imed)
            else:
                merged = g.median()
        arr = pa.array(merged.to_numpy())
        out = _set_col(out, "value", pc.cast(arr, vals.type))
    if "start_ts" in rows.column_names:
        st = pd.Series(_arr(rows["start_ts"]).to_pandas())
        mn = st.groupby(codes).min()
        stype = rows.schema.field("start_ts").type
        out = _set_col(out, "start_ts", pc.cast(pa.array(mn), stype))
    return out


def _merge_hist(rows: pa.Table, codes: np.ndarray,
                firsts: np.ndarray) -> pa.Table:
    """mergeHistogramDataPoints: base = first dp; other dps with count==0
    are skipped entirely (including their start_ts); count/sum add,
    min/max extend, bucket_counts add element-wise."""
    out = rows.take(pa.array(firsts))
    n = rows.num_rows
    cnt = np.asarray(pc.fill_null(pc.cast(
        _arr(rows["count"]), pa.int64()), 0).to_numpy()) \
        if "count" in rows.column_names else np.zeros(n, np.int64)
    is_first = np.zeros(n, bool)
    is_first[firsts] = True
    contrib = is_first | (cnt != 0)
    cwhere = np.where(contrib, cnt, 0)
    if "count" in rows.column_names:
        merged = pd.Series(cwhere).groupby(codes).sum()
        out = _set_col(out, "count", pc.cast(
            pa.array(merged.to_numpy()),
            rows.schema.field("count").type))
    for c, red in (("sum", "sum"), ("min", "min"), ("max", "max")):
        if c not in rows.column_names:
            continue
        s = pd.Series(_arr(rows[c]).to_pandas())
        s = s.where(contrib)
        merged = getattr(s.groupby(codes), red)()
        out = _set_col(out, c, pc.cast(pa.array(merged),
                                       rows.schema.field(c).type))
    if "bucket_counts" in rows.column_names:
        bc = _arr(rows["bucket_counts"])
        off = np.asarray(bc.offsets, np.int64)
        flat = np.asarray(pc.fill_null(pc.cast(
            bc.values, pa.int64()), 0).to_numpy())
        ln = off[1:] - off[:-1]
        row_of = np.repeat(np.arange(n), ln)
        pos = np.arange(len(flat)) - np.repeat(off[:-1], ln)
        use = np.repeat(contrib, ln)
        dfk = codes[row_of].astype(np.int64) * (pos.max() + 1 if len(pos)
                                                else 1) + pos
        sums = pd.Series(np.where(use, flat, 0)).groupby(dfk).sum()
        base_len = ln[firsts]
        new_off = np.concatenate([[0], np.cumsum(base_len)])
        base_keys = np.repeat(np.arange(len(firsts), dtype=np.int64),
                              base_len) * (pos.max() + 1 if len(pos)
                                           else 1) + \
            (np.arange(new_off[-1]) - np.repeat(new_off[:-1], base_len))
        vals = sums.reindex(base_keys).fillna(0).to_numpy()
        new = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()),
            pc.cast(pa.array(vals), bc.type.value_type))
        out = _set_col(out, "bucket_counts", new)
    if "start_ts" in rows.column_names:
        st = pd.Series(_arr(rows["start_ts"]).to_pandas()).where(contrib)
        mn = st.groupby(codes).min()
        out = _set_col(out, "start_ts", pc.cast(
            pa.array(mn), rows.schema.field("start_ts").type))
    return out


def _group_merge(ctx, gated_mask, aggfn: str) -> pa.Table:
    b = ctx.batch
    m = _npmask(gated_mask)
    rest = b.filter(pa.array(~m))
    rows = b.filter(pa.array(m))
    if rows.num_rows == 0:
        return b
    keys = _group_key(rows)
    codes, _uniq = pd.factorize(pd.Series(keys))
    # first occurrence index of each code, in code order
    firsts = pd.Series(np.arange(len(codes))).groupby(codes).min() \
        .sort_index().to_numpy()
    tv = _typ_of(rows)
    num_rows_mask = np.isin(tv, NUM_TYPES) | (tv == None)  # noqa: E711
    merged_parts = []
    for shape_mask, merger in ((num_rows_mask, "num"),
                               (tv == "Histogram", "hist"),
                               (tv == "ExponentialHistogram", "hist")):
        if not shape_mask.any():
            continue
        sel = pa.array(shape_mask)
        sub = rows.filter(sel)
        sub_codes = codes[shape_mask]
        # re-factorize within the shape subset
        c2, _ = pd.factorize(pd.Series(sub_codes))
        f2 = pd.Series(np.arange(len(c2))).groupby(c2).min() \
            .sort_index().to_numpy()
        if merger == "num":
            merged_parts.append(_merge_number(sub, c2, f2, aggfn))
        else:
            merged_parts.append(_merge_hist(sub, c2, f2))
    merged = pa.concat_tables([p.select(b.column_names)
                               for p in merged_parts]) \
        if merged_parts else rows.slice(0, 0)
    return pa.concat_tables([rest, merged.select(b.column_names)])


def _typ_of(rows: pa.Table) -> np.ndarray:
    if "metric_type" in rows.column_names:
        return _arr(rows["metric_type"]).to_numpy(zero_copy_only=False)
    return np.full(rows.num_rows, "Gauge", object)


def aggregate_on_attributes(ctx, args, kwargs, mask):
    """func_aggregate_on_attributes_metrics.go: optionally filter dp
    attributes to a keep-list, then group dps by (attrs, ts[, start_ts])
    within each metric and merge values by the aggregation function."""
    aggfn = str(_scalar(args[0], ctx))
    if aggfn not in AGG_FNS:
        raise ValueError(f"invalid aggregation function: '{aggfn}', valid "
                         f"options: {list(AGG_FNS)}")
    keep = None
    if len(args) > 1:
        keep = _scalar(args[1], ctx)
    elif "attributes" in kwargs:
        keep = _scalar(kwargs["attributes"], ctx)
    tv = _typ(ctx).to_numpy(zero_copy_only=False)
    m = _npmask(mask)
    if (m & (tv == "Summary")).any():
        raise ValueError("aggregate_on_attributes does not support "
                         "aggregating Summary metrics")
    if keep is not None and "attributes" in ctx.batch.column_names:
        old = _arr(ctx.batch["attributes"])
        new = M.keep_keys(old, [str(k) for k in keep])
        ctx.batch = _set_col(ctx.batch, "attributes",
                             _st()._choose_rows(mask, new, old))
    return _group_merge(ctx, mask, aggfn)


def aggregate_on_attribute_value(ctx, args, kwargs, mask):
    """func_agregate_on_attribute_value_metrics.go: rewrite the given
    attribute's listed values to newValue on gated dps, then group+merge
    by full attribute sets. Gated Summary dps are dropped, matching the
    reference (GroupDataPoints/MergeDataPoints have no Summary arm, so
    the rebuilt metric has zero datapoints)."""
    aggfn = str(_scalar(args[0], ctx))
    if aggfn not in AGG_FNS:
        raise ValueError(f"invalid aggregation function: '{aggfn}', valid "
                         f"options: {list(AGG_FNS)}")
    attr = str(_scalar(args[1], ctx))
    values = [str(v) for v in _scalar(args[2], ctx)]
    new_value = str(_scalar(args[3], ctx))
    b = ctx.batch
    if "attributes" in b.column_names:
        attrs = _arr(b["attributes"])
        cur = M.map_get(attrs, attr)
        hit = pc.and_(mask, pc.is_in(pc.cast(cur, pa.string()),
                                     value_set=pa.array(values)))
        rewritten = M.map_set(attrs, attr,
                              pa.array([new_value] * ctx.n))
        ctx.batch = _set_col(b, "attributes",
                             _st()._choose_rows(hit, rewritten, attrs))
    tv = _typ(ctx).to_numpy(zero_copy_only=False)
    m = _npmask(mask)
    drop_summary = m & (tv == "Summary")
    if drop_summary.any():
        ctx.batch = ctx.batch.filter(pa.array(~drop_summary))
        m = m[~drop_summary]
    return _group_merge(ctx, pa.array(m), aggfn)


# ---------------------------------------------------------------------------
# convert_exponential_histogram_to_histogram
# ---------------------------------------------------------------------------

def _exp_bucket_matrix(scale, offset, bc_list, zero_count, bounds,
                       fn: str) -> np.ndarray:
    """Vectorized calculateBucketCounts over all converted rows at once:
    explode positive bucket counts to (row, pos) entries, compute each
    exp-bucket's [lower, upper) from scale/offset, then route counts into
    the explicit bounds by the distribution algorithm
    (func_convert_exponential_hist_to_explicit_hist.go:110-263)."""
    nb = len(bounds)
    nrows = len(scale)
    mat = np.zeros((nrows, nb), np.int64)
    barr = np.asarray(bounds, np.float64)
    # zero bucket -> bounds[0] when it starts at zero
    if barr[0] == 0:
        mat[:, 0] += zero_count
    off_l = np.asarray(bc_list.offsets, np.int64)
    counts = np.asarray(pc.fill_null(pc.cast(bc_list.values, pa.int64()),
                                     0).to_numpy())
    ln = off_l[1:] - off_l[:-1]
    row = np.repeat(np.arange(nrows), ln)
    pos = np.arange(len(counts)) - np.repeat(off_l[:-1], ln)
    if len(counts) == 0:
        return mat
    idx = offset[row] + pos
    factor = np.log(2.0) * np.exp2(-scale[row].astype(np.float64))
    upper = np.exp((idx + 1) * factor)
    lower = np.exp(idx * factor)
    live = counts > 0
    # overflow: lower beyond the last boundary -> last bucket
    over = live & (lower > barr[-1])
    np.add.at(mat, (row[over], nb - 1), counts[over])
    rest = live & ~over
    L = np.searchsorted(barr, lower, side="left")  # bounds[L-1] < lo <= [L]
    U = np.searchsorted(barr, upper, side="left")  # first j: up <= bounds[j]
    # single-bucket fit: smallest bIndex in 1..nb-1 with lo > bounds[b-1]
    # and up <= bounds[b]
    b = np.maximum(U, 1)
    single = rest & (b <= L) & (b <= nb - 1)
    np.add.at(mat, (row[single], b[single] - 1), counts[single])
    spread = rest & ~single
    if not spread.any():
        return mat
    if fn == "upper":
        dest = np.minimum(U, nb - 1)
        np.add.at(mat, (row[spread], dest[spread]), counts[spread])
    elif fn == "midpoint":
        mid = (upper + lower) / 2.0
        jm = np.searchsorted(barr, mid, side="left")
        dest = np.where(jm >= nb, nb - 1, np.maximum(jm - 1, 0))
        np.add.at(mat, (row[spread], dest[spread]), counts[spread])
    else:  # uniform ("random" maps here: deterministic batch analogue)
        start = L
        end = np.minimum(np.maximum(U, start), nb - 1)
        sp = np.nonzero(spread)[0]
        width = end[sp] - start[sp] + 1
        base = counts[sp] // width
        rem = counts[sp] % width
        # diff-array trick: add base on [start..end], +1 on the first
        # `rem` buckets, then prefix-sum along the bounds axis
        diff = np.zeros((nrows, nb + 1), np.int64)
        np.add.at(diff, (row[sp], start[sp]), base)
        np.add.at(diff, (row[sp], end[sp] + 1), -base)
        np.add.at(diff, (row[sp], start[sp]), np.minimum(rem, 1))
        np.add.at(diff, (row[sp], np.minimum(start[sp] + rem, nb)),
                  -np.minimum(rem, 1))
        # remainder may span multiple buckets (rem > 1): the two add.at
        # calls above only handle rem as a contiguous +1 run, which is
        # exactly the reference's behavior (one extra per bucket from
        # start until the remainder is exhausted)
        mat += np.cumsum(diff, axis=1)[:, :nb]
        # rows where the range collapsed (end == start handled by width=1)
    return mat


def convert_exponential_histogram_to_histogram(ctx, args, kwargs, mask):
    """func_convert_exponential_hist_to_explicit_hist.go: rewrite gated
    ExponentialHistogram rows as explicit-bounds Histogram rows. The
    'random' distribution maps to 'uniform' here — a batch engine must be
    deterministic (rerun-stable sinks), and uniform is random's expected
    value; documented in DIVERGENCES #32."""
    fn = str(_scalar(args[0], ctx)) if args else "random"
    bounds = [float(x) for x in _scalar(args[1], ctx)] if len(args) > 1 \
        else [float(x) for x in _scalar(kwargs["explicit_bounds"], ctx)] \
        if "explicit_bounds" in kwargs else []
    if fn not in ("upper", "midpoint", "random", "uniform"):
        raise ValueError(f"invalid conversion function: {fn}, must be one "
                         "of [upper, midpoint, random, uniform]")
    if not bounds:
        raise ValueError(f"explicit bounds cannot be empty: {bounds}")
    if fn == "random":
        fn = "uniform"
    typ = _typ(ctx)
    sel = pc.and_(mask, pc.equal(typ, "ExponentialHistogram"))
    m = _npmask(sel)
    if not m.any():
        return ctx.batch
    b = ctx.batch
    rows = b.filter(pa.array(m))
    nconv = rows.num_rows

    def _ivals(name):
        if name in rows.column_names:
            return np.asarray(pc.fill_null(pc.cast(
                _arr(rows[name]), pa.int64()), 0).to_numpy())
        return np.zeros(nconv, np.int64)

    scale = _ivals("scale")
    offset = _ivals("positive_offset")
    zc = _ivals("zero_count")
    if "positive_bucket_counts" in rows.column_names:
        bc = _arr(rows["positive_bucket_counts"])
        if bc.null_count:
            bc = pc.fill_null(bc, [])
        bc = _arr(bc)
    else:
        bc = pa.array([[]] * nconv, pa.list_(pa.int64()))
    mat = _exp_bucket_matrix(scale, offset, bc, zc, bounds, fn)
    nb = len(bounds)
    new_counts = pa.ListArray.from_arrays(
        pa.array(np.arange(nconv + 1, dtype=np.int32) * nb),
        pa.array(mat.reshape(-1)))
    new_bounds = pa.ListArray.from_arrays(
        pa.array(np.arange(nconv + 1, dtype=np.int32) * nb),
        pa.array(np.tile(np.asarray(bounds, np.float64), nconv)))
    # write back: type flips to Histogram, bounds/buckets land, the
    # exponential-only fields null out on converted rows
    sel_pa = pa.array(m)
    ctx.batch = _masked_set(ctx, "metric_type", "Histogram", sel_pa)

    def _scatter(colname, new_vals, value_type):
        cur = _arr(ctx.batch[colname]) if colname in \
            ctx.batch.column_names else pa.nulls(ctx.n,
                                                 pa.list_(value_type))
        n = ctx.n
        idx = np.where(m, np.cumsum(m) - 1 + n, np.arange(n))
        combined = pa.concat_arrays([
            cur.cast(pa.list_(value_type)) if pa.types.is_list(cur.type)
            else pa.nulls(n, pa.list_(value_type)),
            new_vals.cast(pa.list_(value_type))])
        ctx.batch = _set_col(ctx.batch, colname,
                             combined.take(pa.array(idx)))

    _scatter("explicit_bounds", new_bounds, pa.float64())
    _scatter("bucket_counts", new_counts, pa.int64())
    for c in ("scale", "zero_count", "positive_offset", "negative_offset",
              "positive_bucket_counts", "negative_bucket_counts"):
        if c in ctx.batch.column_names:
            old = _arr(ctx.batch[c])
            ctx.batch = _set_col(
                ctx.batch, c,
                _st()._choose_rows(sel_pa, pa.nulls(ctx.n, old.type), old))
    return ctx.batch


METRIC_EDITORS = {
    "scale_metric": scale_metric,
    "copy_metric": copy_metric,
    "extract_sum_metric": extract_sum_metric,
    "extract_count_metric": extract_count_metric,
    "convert_sum_to_gauge": convert_sum_to_gauge,
    "convert_gauge_to_sum": convert_gauge_to_sum,
    "convert_summary_sum_val_to_sum": convert_summary_sum_val_to_sum,
    "convert_summary_count_val_to_sum": convert_summary_count_val_to_sum,
    "aggregate_on_attributes": aggregate_on_attributes,
    "aggregate_on_attribute_value": aggregate_on_attribute_value,
    "convert_exponential_histogram_to_histogram":
        convert_exponential_histogram_to_histogram,
}
