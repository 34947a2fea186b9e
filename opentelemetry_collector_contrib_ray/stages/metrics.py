"""Metrics-connector family re-expressed (SURVEY.md §2.6-2.7):

- histogram_by: spanmetricsconnector's explicit-bucket duration histogram
  keyed by dimensions (connector/spanmetricsconnector) — vectorized bucket
  assignment + the count_by partial/merge plan.
- transition_edges: servicegraphconnector's client->server edge metrics —
  in transcript form, consecutive-turn (service -> service) transitions per
  conversation (the batch analogue of pairing client/server spans by id:
  complete conversations are available, so the TTL pair-store collapses to
  an ordered scan).
- cumulative_per_key: deltatocumulativeprocessor — per-series running sum
  ordered by time (coarse-partition scan, same plan as sessionize).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from .aggregate import _merge_partials
from .shuffle import adaptive_n_parts, key_partitioner


def histogram_by(ds: Dataset, keys: list[str], value_col: str,
                 bounds: list[float], *, count_col: str = "n") -> Dataset:
    """Explicit-bucket histogram: one output row per (keys..., bucket) with
    counts; bucket label = '<=X' / '>last'. Null values are skipped (the
    reference counts only recorded durations)."""
    if not bounds:
        raise ValueError("histogram_by: bounds must be non-empty")
    bounds_arr = np.asarray(bounds, np.float64)
    labels = [f"<={b:g}" for b in bounds] + [f">{bounds[-1]:g}"]
    labels_arr = pa.array(labels, pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        valid = pc.is_valid(v)
        batch = batch.filter(valid)
        if batch.num_rows == 0:
            return pa.table({**{k: pa.array([], batch[k].type) for k in keys},
                             "bucket": pa.array([], pa.string()),
                             "_partial": pa.array([], pa.int64())})
        vv = pc.cast(batch[value_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        if np.isnan(vv).any():
            # NaN is valid/non-null in Arrow but just as unrecorded as a
            # null (searchsorted would bucket it into '>last')
            keep = ~np.isnan(vv)
            batch, vv = batch.filter(pa.array(keep)), vv[keep]
        idx = np.searchsorted(bounds_arr, vv, side="left")
        b = pc.take(labels_arr, pa.array(idx.astype(np.int64)))
        t = batch.select(keys).append_column("bucket", b)
        out = t.group_by(keys + ["bucket"]).aggregate([([], "count_all")])
        return out.rename_columns(keys + ["bucket", "_partial"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _merge_partials(partials, keys + ["bucket"],
                           [("_partial", "sum")], [count_col])


def expo_index(v: np.ndarray, scale: int) -> np.ndarray:
    """go-expohisto LogarithmMapping.MapToIndex for positive values — the
    OTel base-2 exponential histogram mapping used by
    connector/spanmetricsconnector (internal/metrics/metrics.go:225
    Observe -> lightstep structure.Histogram): bucket i covers
    (base^i, base^(i+1)] with base = 2^(2^-scale), so
    index = floor(ln(v) * 2^scale/ln2), and an exact power of two
    2^m maps to (m << scale) - 1 (the boundary belongs to the lower
    bucket). Supported scales: 0..20 (the logarithm mapping range; a
    160-bucket histogram at scale 0 already spans 2^160 of dynamic
    range, so negative scales are never reached by the fit)."""
    sf = (2.0 ** scale) / math.log(2.0)
    idx = np.floor(np.log(v) * sf).astype(np.int64)
    frac, ex = np.frexp(v)
    exact = frac == 0.5
    if exact.any():
        idx[exact] = ((ex[exact].astype(np.int64) - 1) << scale) - 1
    return idx


def _fit_scales(vmin: np.ndarray, vmax: np.ndarray, max_size: int,
                s_max: int = 20) -> np.ndarray:
    """Largest scale in [0, s_max] whose bucket-index range for
    [vmin, vmax] fits max_size buckets — the batch analogue of
    go-expohisto's downscale-on-overflow (the final scale depends only
    on the value RANGE, not arrival order, so one min/max pass
    reproduces it deterministically)."""
    k = len(vmin)
    out = np.zeros(k, np.int64)
    done = np.zeros(k, bool)
    for s in range(s_max, -1, -1):
        need = expo_index(vmax, s) - expo_index(vmin, s) + 1
        newly = (~done) & (need <= max_size)
        out[newly] = s
        done |= newly
    return out


def exp_histogram_by(ds: Dataset, keys: list[str], value_col: str, *,
                     max_size: int = 160, scale: int | None = None,
                     count_col: str = "n", s_max: int = 20) -> Dataset:
    """spanmetricsconnector `histogram: exponential` — per-key base-2
    exponential bucket counts (connector/spanmetricsconnector/config.go
    `Exponential.MaxSize`, connector.go:160-165).

    Output rows: (keys..., scale, sign, bucket_idx, count) with sign
    +1/-1 for the positive/negative range and a (sign=0, bucket_idx=0)
    row carrying the zero_count. ``scale=None`` (the reference shape)
    derives each key's scale from its value range to fit ``max_size``
    buckets per range — one extra min/max aggregation pass over the
    input (tiny result: 2 rows per key), the deterministic analogue of
    expohisto's incremental downscaling. Pass an explicit ``scale`` for
    a single-pass fixed-scale histogram. Null/NaN values are skipped
    like the explicit-bounds histogram."""
    from .aggregate import canonical_identity

    if scale is None:
        scale_by_cid = _expo_scale_map(ds, keys, value_col, max_size, s_max)
        ref = ray.put(scale_by_cid) if ray.is_initialized() else scale_by_cid
    else:
        ref = None

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({**{k: pa.array([], batch[k].type) for k in keys},
                          "scale": pa.array([], pa.int64()),
                          "sign": pa.array([], pa.int64()),
                          "bucket_idx": pa.array([], pa.int64()),
                          "_partial": pa.array([], pa.int64())})
        v0 = batch[value_col]
        if isinstance(v0, pa.ChunkedArray):
            v0 = v0.combine_chunks()
        keep = pc.is_valid(v0)
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return empty
        v = pc.cast(batch[value_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        if not ok.all():
            batch, v = batch.filter(pa.array(ok)), v[ok]
        if batch.num_rows == 0:
            return empty
        n = len(v)
        scales = np.full(n, scale if scale is not None else 0, np.int64)
        if scale is None:
            smap = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            cid = pc.dictionary_encode(canonical_identity(batch, keys))
            cid = cid.combine_chunks() if isinstance(cid, pa.ChunkedArray) \
                else cid
            per_uniq = np.asarray(
                [smap.get(c, 0) for c in cid.dictionary.to_pylist()],
                np.int64)
            scales = per_uniq[cid.indices.to_numpy(zero_copy_only=False)]
        sign = np.sign(v).astype(np.int64)
        idx = np.zeros(n, np.int64)
        for s in np.unique(scales):
            m = scales == s
            pos = m & (sign != 0)
            if pos.any():
                idx[pos] = expo_index(np.abs(v[pos]), int(s))
        t = batch.select(keys).append_column(
            "scale", pa.array(scales, pa.int64())).append_column(
            "sign", pa.array(sign, pa.int64())).append_column(
            "bucket_idx", pa.array(idx, pa.int64()))
        out = t.group_by(keys + ["scale", "sign", "bucket_idx"]) \
            .aggregate([([], "count_all")])
        return out.rename_columns(keys + ["scale", "sign", "bucket_idx",
                                          "_partial"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    return _merge_partials(partials, keys + ["scale", "sign", "bucket_idx"],
                           [("_partial", "sum")], [count_col])


def _expo_scale_map(ds: Dataset, keys: list[str], value_col: str,
                    max_size: int, s_max: int) -> dict:
    """Pass 1 of the auto-scale plan: per-key |value| min/max per sign ->
    fitted scale keyed by the canonical key identity. The merged table is
    2 rows per key — driver-side materialization is bounded by key
    cardinality, never input size. The shared scale is the MIN of the
    two signs' fits (expohisto shares one scale across both ranges)."""
    from .aggregate import _merge_partials as merge
    from .aggregate import canonical_identity

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"_cid": pa.array([], pa.string()),
                          "sign": pa.array([], pa.int64()),
                          "_vmin": pa.array([], pa.float64()),
                          "_vmax": pa.array([], pa.float64())})
        v0 = batch[value_col]
        if isinstance(v0, pa.ChunkedArray):
            v0 = v0.combine_chunks()
        batch = batch.filter(pc.is_valid(v0))
        if batch.num_rows == 0:
            return empty
        v = pc.cast(batch[value_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v) & (v != 0.0)
        if not ok.any():
            return empty
        batch, v = batch.filter(pa.array(ok)), v[ok]
        cid = canonical_identity(batch, keys)
        t = pa.table({"_cid": cid,
                      "sign": pa.array(np.sign(v).astype(np.int64)),
                      "_v": pa.array(np.abs(v), pa.float64())})
        out = t.group_by(["_cid", "sign"]).aggregate(
            [("_v", "min"), ("_v", "max")])
        return out.rename_columns(["_cid", "sign", "_vmin", "_vmax"])

    merged = merge(ds.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None),
                   ["_cid", "sign"], [("_vmin", "min"), ("_vmax", "max")],
                   ["_vmin", "_vmax"])
    # bounded driver-side materialization: 2 rows per distinct key
    t = pa.concat_tables(ray.get(merged.to_arrow_refs()))
    cids = t["_cid"].to_pylist()
    fits = _fit_scales(t["_vmin"].to_numpy(zero_copy_only=False),
                       t["_vmax"].to_numpy(zero_copy_only=False),
                       max_size, s_max)
    out: dict[str, int] = {}
    for c, s in zip(cids, fits):
        out[c] = min(out.get(c, s_max), int(s))
    return out


def transition_edges(ds: Dataset, *, key_col: str = "conv_id",
                     order_col: str = "turn_idx", node_col: str = "service",
                     n_parts: int | None = None, count_col: str = "n",
                     size_bytes: int | None = None) -> Dataset:
    """Edges (from_node -> to_node) between consecutive rows of each key,
    counted globally — servicegraph's client/server pairing in batch form.
    Adaptive coarse partitioning (cluster CPUs / input bytes)."""
    n_parts = n_parts or adaptive_n_parts(size_bytes)
    add_part = key_partitioner(key_col, n_parts)

    def per_partition(group: pa.Table) -> pa.Table:
        group = group.sort_by([(key_col, "ascending"),
                               (order_col, "ascending")])
        n = group.num_rows
        empty = pa.table({"from_node": pa.array([], pa.string()),
                          "to_node": pa.array([], pa.string()),
                          "_partial": pa.array([], pa.int64())})
        if n < 2:
            return empty
        keys = group[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        nodes = group[node_col]
        if isinstance(nodes, pa.ChunkedArray):
            nodes = nodes.combine_chunks()
        same_key = pc.equal(keys.slice(1), keys.slice(0, n - 1))
        frm = nodes.slice(0, n - 1).filter(same_key)
        to = nodes.slice(1).filter(same_key)
        t = pa.table({"from_node": frm, "to_node": to})
        out = t.group_by(["from_node", "to_node"]).aggregate([([], "count_all")])
        return out.rename_columns(["from_node", "to_node", "_partial"])

    tagged = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    partials = tagged.groupby("_part").map_groups(per_partition,
                                                  batch_format="pyarrow")
    return _merge_partials(partials, ["from_node", "to_node"],
                           [("_partial", "sum")], [count_col])


def cumulative_per_key(ds: Dataset, *, key_col: str, order_col: str,
                       value_col: str, out_col: str = "cumulative",
                       n_parts: int | None = None,
                       size_bytes: int | None = None) -> Dataset:
    """deltatocumulative: running per-key sum in order — one coarse-
    partitioned sort + vectorized segmented cumsum. Adaptive partitioning."""
    n_parts = n_parts or adaptive_n_parts(size_bytes)
    add_part = key_partitioner(key_col, n_parts)

    def per_partition(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["_part"]).sort_by(
            [(key_col, "ascending"), (order_col, "ascending")])
        n = group.num_rows
        if n == 0:
            return group.append_column(out_col, pa.array([], pa.float64()))
        v = pc.cast(group[value_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        v = np.nan_to_num(v, nan=0.0)
        change = key_change_mask(group[key_col], n)
        cs = np.cumsum(v)
        # forward-fill each segment's base (cumsum before the segment) by
        # index so negative values can't break the fill
        idx = np.arange(n)
        start_idx = np.maximum.accumulate(np.where(change, idx, 0))
        base = (cs - v)[start_idx]
        out = cs - base
        return group.append_column(out_col, pa.array(out, pa.float64()))

    tagged = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return tagged.groupby("_part").map_groups(per_partition,
                                              batch_format="pyarrow")


def _per_key_scan(ds: Dataset, key_col: str, order_col: str, fn,
                  n_parts: int | None = None,
                  size_bytes: int | None = None) -> Dataset:
    """Shared coarse-partition ordered scan: hash-co-locate keys, sort each
    partition by (key, order), apply the vectorized segment fn."""
    n_parts = n_parts or adaptive_n_parts(size_bytes)
    add_part = key_partitioner(key_col, n_parts)

    def per_partition(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["_part"]).sort_by(
            [(key_col, "ascending"), (order_col, "ascending")])
        return fn(group)

    tagged = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return tagged.groupby("_part").map_groups(per_partition,
                                              batch_format="pyarrow")


def key_change_mask(keys: pa.Array, n: int) -> np.ndarray:
    """True where row i starts a new key segment, with NULLS-EQUAL
    semantics (consecutive null keys are ONE series — matching SQL
    PARTITION BY, which groups nulls together; pc.not_equal alone yields
    null for any null operand and would split every null row)."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    a, b = keys.slice(1), keys.slice(0, n - 1)
    va = np.asarray(pc.is_valid(a))
    vb = np.asarray(pc.is_valid(b))
    ne = np.asarray(pc.fill_null(pc.not_equal(a, b), False)).astype(bool)
    return np.concatenate([[True], (va != vb) | (va & vb & ne)])


def _segment_starts(group: pa.Table, key_col: str) -> np.ndarray:
    return key_change_mask(group[key_col], group.num_rows)


def cumulative_to_delta(ds: Dataset, *, key_col: str, order_col: str,
                        value_col: str, out_col: str = "delta",
                        initial: str = "keep",
                        n_parts: int | None = None,
                        size_bytes: int | None = None) -> Dataset:
    """cumulativetodeltaprocessor: per-series delta = v - lag(v) in order.

    ``initial`` mirrors the reference's initial_value knob
    (processor/cumulativetodeltaprocessor/config.go:31-36 +
    internal/tracking/value.go InitialValueAuto|Keep|Drop): 'keep' emits
    the first point's value as its own delta, 'drop' nulls it (the caller
    filters). Monotonic resets (v < lag) re-baseline like the reference's
    tracker: the raw difference is emitted, callers clamp if desired.
    """
    if initial not in ("keep", "drop"):
        raise ValueError("initial must be keep|drop")

    def seg(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return group.append_column(out_col, pa.array([], pa.float64()))
        starts = _segment_starts(group, key_col)
        v = pc.cast(group[value_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        has_v = ~np.isnan(v)
        idx = np.arange(n)
        seg_first = np.maximum.accumulate(np.where(starts, idx, 0))
        # last VALID point per row (exclusive of the row itself); a null
        # value is a gap: its delta is null and it does not become prev —
        # without this one null poisons its own AND the next delta as
        # non-null NaN floats
        lastv = np.maximum.accumulate(np.where(has_v, idx, -1))
        lastv_excl = np.concatenate([[-1], lastv[:-1]])
        is_first = lastv_excl < seg_first  # no valid predecessor in series
        prev = np.where(is_first, 0.0, v[np.maximum(lastv_excl, 0)])
        delta = v - prev
        emit = has_v & (~is_first if initial == "drop"
                        else np.ones(n, bool))
        out = pc.if_else(pa.array(emit),
                         pa.array(np.nan_to_num(delta, nan=0.0)),
                         pa.nulls(n, pa.float64()))
        return group.append_column(out_col, out)

    return _per_key_scan(ds, key_col, order_col, seg, n_parts, size_bytes)


def delta_to_rate(ds: Dataset, *, key_col: str, order_col: str,
                  value_col: str, ts_col: str | None = None,
                  out_col: str = "rate",
                  n_parts: int | None = None,
                  size_bytes: int | None = None) -> Dataset:
    """deltatorateprocessor: delta value / elapsed seconds since the
    series' previous point (first point of each series -> null: no
    interval). ``ts_col`` defaults to ``order_col``."""
    ts_col = ts_col or order_col

    def seg(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return group.append_column(out_col, pa.array([], pa.float64()))
        starts = _segment_starts(group, key_col)
        v = pc.cast(group[value_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        tsc = group[ts_col]
        if isinstance(tsc, pa.ChunkedArray):
            tsc = tsc.combine_chunks()
        # normalize the unit before the /1e6 seconds conversion (a bare
        # integer epoch column is taken as already-us)
        if pa.types.is_timestamp(tsc.type):
            tsc = pc.cast(tsc, pa.timestamp("us"), safe=False)
        ts = pc.cast(tsc, pa.int64()).to_numpy(zero_copy_only=False)
        dt_us = ts - np.concatenate([[0], ts[:-1]])
        dt_s = dt_us / 1e6
        with np.errstate(divide="ignore", invalid="ignore"):
            rate = np.where(dt_s > 0, v / dt_s, np.nan)
        valid = (~starts) & (dt_s > 0) & ~np.isnan(v)
        out = pc.if_else(pa.array(valid), pa.array(rate),
                         pa.nulls(n, pa.float64()))
        return group.append_column(out_col, out)

    return _per_key_scan(ds, key_col, order_col, seg, n_parts, size_bytes)


def metric_start_time(ds: Dataset, *, key_col: str, order_col: str,
                      value_col: str, ts_col: str | None = None,
                      strategy: str = "true_reset_point",
                      out_start: str = "start_ts",
                      n_parts: int | None = None,
                      size_bytes: int | None = None) -> Dataset:
    """metricstarttimeprocessor: stamp per-series start timestamps on
    cumulative points (processor/metricstarttimeprocessor/config.go:26-35).

    - true_reset_point: the first observed point of each series becomes the
      True Reset point (start == its own timestamp); subsequent points
      reuse that start timestamp (README 'Strategy: True Reset Point').
    - subtract_initial_point: the first point is the baseline — it is
      DROPPED, subsequent values are rebased (v - v_first) and their start
      is the baseline point's timestamp (internal/subtractinitial).
    """
    if strategy not in ("true_reset_point", "subtract_initial_point"):
        raise ValueError(f"bad strategy {strategy!r}")
    ts_col = ts_col or order_col

    def seg(group: pa.Table) -> pa.Table:
        n = group.num_rows
        ts_t = group[ts_col].type if n else pa.timestamp("us")
        if n == 0:
            return group.append_column(out_start, pa.array([], ts_t))
        starts = _segment_starts(group, key_col)
        ts_i = pc.cast(group[ts_col], pa.int64())
        # keep int64 end-to-end: to_numpy on a null-bearing int column
        # falls back to float64 (NaN crashes the int cast back, and ns
        # epochs past 2^53 lose precision)
        ts_ok = pc.is_valid(ts_i).to_numpy(zero_copy_only=False)
        ts = pc.fill_null(ts_i, 0).to_numpy(zero_copy_only=False)
        idx = np.arange(n)
        first_idx = np.maximum.accumulate(np.where(starts, idx, 0))
        start_ts = ts[first_idx]
        start_arr = pa.array(start_ts, pa.int64(),
                             mask=~ts_ok[first_idx])
        if strategy == "true_reset_point":
            return group.append_column(
                out_start, pc.cast(start_arr, ts_t))
        # subtract_initial_point
        v = pc.cast(group[value_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        base = v[first_idx]
        out = group.append_column(out_start, pc.cast(start_arr, ts_t))
        i = out.column_names.index(value_col)
        out = out.set_column(i, value_col, pa.array(v - base, pa.float64()))
        return out.filter(pa.array(~starts))

    return _per_key_scan(ds, key_col, order_col, seg, n_parts, size_bytes)


# --- metricstransformprocessor ---------------------------------------------

def metrics_transform(ds: Dataset, transforms: list[dict], *,
                      name_col: str = "metric_name",
                      value_col: str = "value") -> Dataset:
    """metricstransformprocessor (processor/metricstransformprocessor) on
    the flat metric model (one row = one datapoint: name column + label
    columns + value column).

    Each transform: ``{include, match_type: strict|regexp, action:
    update|insert, new_name?, operations: [...]}`` with the operation set
    add_label, update_label (+value_actions), delete_label_value,
    toggle_scalar_data_type, experimental_scale_value, aggregate_labels,
    aggregate_label_values (operation_*.go). ``insert`` appends the
    transformed COPY of matched datapoints; ``update`` edits them in
    place. The OTLP-structural actions combine/group (merge metric
    objects / regroup ResourceMetrics) are out of flat-table scope
    (DIVERGENCES.md).

    Scale notes: row ops are one vectorized map_batches; aggregate ops
    run the partial/merge plan (per-block group_by then a keyed merge),
    and transforms containing an aggregate (or action=insert) split the
    stream, so the input is materialized once to avoid re-executing
    upstream lineage per branch. toggle_scalar_data_type promotes the
    shared value COLUMN to float64 when any unmatched rows remain
    (a flat column has one type; int truncation still applies to the
    matched rows' values)."""
    for t in transforms:
        ds = _apply_metric_transform(ds, t, name_col, value_col)
    return ds


def _name_capture_groups(pattern: str) -> tuple[str, dict]:
    """Give every unnamed capture group in ``pattern`` a name (RE2 keeps
    semantics; pc.extract_regex only exposes NAMED groups) and return the
    rewritten pattern plus {reference -> field name} for both numeric
    ($1) and named ($foo) template references. Group 0 (the whole match)
    is exposed by wrapping the pattern."""
    out: list[str] = []
    names: dict[str, str] = {"0": "_g0"}
    i, gi, in_class = 0, 0, False
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(pattern[i:i + 2])
            i += 2
            continue
        if in_class:
            out.append(c)
            in_class = c != "]"
            i += 1
            continue
        if c == "[":
            in_class = True
            out.append(c)
            i += 1
            continue
        if c == "(":
            if pattern.startswith("(?P<", i):
                j = pattern.index(">", i)
                nm = pattern[i + 4:j]
                gi += 1
                names[str(gi)] = nm
                names[nm] = nm
                out.append(pattern[i:j + 1])
                i = j + 1
                continue
            if pattern.startswith("(?", i):  # non-capturing / flags
                out.append(c)
                i += 1
                continue
            gi += 1
            fn = f"_g{gi}"
            names[str(gi)] = fn
            out.append(f"(?P<{fn}>")
            i += 1
            continue
        out.append(c)
        i += 1
    return "(?P<_g0>" + "".join(out) + ")", names


def _expand_template_parts(template: str) -> list[tuple[str, str]]:
    """Split a Go Regexp.Expand template into ('lit', text) / ('ref', name)
    parts: $name / ${name} with name = longest \\w+ run, $$ -> literal $
    (regexp/regexp.go Expand)."""
    import re as _re

    parts: list[tuple[str, str]] = []
    lit = ""
    i = 0
    while i < len(template):
        c = template[i]
        if c == "$" and i + 1 < len(template):
            nxt = template[i + 1]
            if nxt == "$":
                lit += "$"
                i += 2
                continue
            if nxt == "{":
                j = template.find("}", i + 2)
                body = template[i + 2:j] if j > 0 else ""
                if j > 0 and _re.fullmatch(r"\w+", body):
                    ref, i = body, j + 1
                else:  # malformed ${ -> literal, as Go does
                    lit += c
                    i += 1
                    continue
            else:
                m = _re.match(r"\w+", template[i + 1:])
                if m:
                    ref = m.group(0)
                    i += 1 + len(ref)
                else:
                    lit += c
                    i += 1
                    continue
            if lit:
                parts.append(("lit", lit))
                lit = ""
            parts.append(("ref", ref))
            continue
        lit += c
        i += 1
    if lit:
        parts.append(("lit", lit))
    return parts


def _expand_regexp_rename(name: pa.Array, pattern: str,
                          template: str) -> pa.Array:
    """Go ``re.ExpandString(nil, newName, name, firstMatch)`` as a column
    op: the WHOLE metric name becomes ``template`` with $N/${N}/$name
    submatch references filled from the first (unanchored) match of
    ``pattern`` (metrics_transform_processor_otlp.go:540-545); references
    to groups that did not participate (or do not exist) expand to ''.
    Non-matching rows keep their original name."""
    named, names = _name_capture_groups(pattern)
    st = pc.extract_regex(name, named)
    matched = pc.is_valid(st)
    args = []
    for kind, val in _expand_template_parts(template):
        if kind == "lit":
            args.append(pa.scalar(val, pa.string()))
        elif val in names:
            args.append(pc.fill_null(pc.struct_field(st, names[val]), ""))
        # unknown reference -> appends nothing (Go Expand skips it)
    if not args:
        args.append(pa.scalar("", pa.string()))
    joined = pc.binary_join_element_wise(*args, "") if len(args) > 1 \
        else (pc.binary_join_element_wise(args[0], "", "")
              if isinstance(args[0], pa.Scalar) else args[0])
    if isinstance(joined, pa.Scalar):
        joined = pa.nulls(len(name), pa.string()).fill_null(joined.as_py())
    return pc.if_else(matched, joined, name)


def _metric_match(name: pa.Array, t: dict):
    inc = t["include"]
    if t.get("match_type", "strict") == "regexp":
        return pc.fill_null(pc.match_substring_regex(name, inc), False)
    return pc.fill_null(pc.equal(name, inc), False)


def _metric_rowfn(t: dict, name_col: str, value_col: str):
    ops = t.get("operations") or []
    new_name = t.get("new_name")
    regexp = t.get("match_type", "strict") == "regexp"
    inc = t["include"]

    def fn(batch: pa.Table, only_matched: bool = False) -> pa.Table:
        name = batch[name_col]
        if isinstance(name, pa.ChunkedArray):
            name = name.combine_chunks()
        m = _metric_match(name, t)
        if only_matched:
            batch = batch.filter(m)
            name = batch[name_col]
            if isinstance(name, pa.ChunkedArray):
                name = name.combine_chunks()
            m = pa.array([True] * batch.num_rows, pa.bool_())
        if new_name is not None:
            # regexp rename = full-name Expand of $N submatch templates
            # (NOT substring replacement — see _expand_regexp_rename)
            renamed = _expand_regexp_rename(name, inc, new_name) \
                if regexp else pa.nulls(len(name), pa.string()) \
                .fill_null(new_name)
            batch = batch.set_column(
                batch.column_names.index(name_col), name_col,
                pc.if_else(m, renamed, name))
        for op in ops:
            batch, m = _apply_row_op(batch, m, op, name_col, value_col)
        return batch
    return fn


def _col(batch: pa.Table, name: str) -> pa.Array:
    c = batch[name]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _apply_row_op(batch: pa.Table, m, op: dict, name_col: str,
                  value_col: str):
    act = op["action"]
    n = batch.num_rows
    if act == "add_label":
        newc = pa.nulls(n, pa.string()) if op["new_label"] \
            not in batch.column_names else _col(batch, op["new_label"])
        val = pc.if_else(m, pa.scalar(str(op["new_value"]), pa.string()),
                         pc.cast(newc, pa.string()))
        if op["new_label"] in batch.column_names:
            batch = batch.set_column(
                batch.column_names.index(op["new_label"]),
                op["new_label"], val)
        else:
            batch = batch.append_column(op["new_label"], val)
        return batch, m
    if act == "update_label":
        old = op["label"]
        if old not in batch.column_names:
            return batch, m
        cur = _col(batch, old)
        vas = op.get("value_actions") or []
        if vas:
            # ONE lookup against the original values (Go builds a
            # valueActionsMapping then maps each datapoint once,
            # operation_update_label.go) — chained rewrites would let
            # [{a->b},{b->c}] turn an original 'a' into 'c'
            mapping = {str(va["value"]): str(va["new_value"]) for va in vas}
            keys = pa.array(list(mapping.keys()), pa.string())
            vals = pa.array(list(mapping.values()), pa.string())
            cur_s = pc.cast(cur, pa.string())
            idx = pc.index_in(cur_s, value_set=keys)
            cur = pc.if_else(pc.and_(m, pc.is_valid(idx)),
                             pc.take(vals, idx), cur_s)
        new = op.get("new_label")
        if new and new != old:
            dest = _col(batch, new) if new in batch.column_names \
                else pa.nulls(n, cur.type)
            moved = pc.if_else(m, cur, dest)
            left = pc.if_else(m, pa.nulls(n, cur.type), cur)
            if new in batch.column_names:
                batch = batch.set_column(batch.column_names.index(new),
                                         new, moved)
            else:
                batch = batch.append_column(new, moved)
            batch = batch.set_column(batch.column_names.index(old), old,
                                     left)
        else:
            batch = batch.set_column(batch.column_names.index(old), old,
                                     cur)
        return batch, m
    if act == "delete_label_value":
        lab = op["label"]
        if lab not in batch.column_names:
            return batch, m
        kill = pc.and_(m, pc.equal(pc.cast(_col(batch, lab), pa.string()),
                                   str(op["label_value"])))
        keep = pc.invert(pc.fill_null(kill, False))
        return batch.filter(keep), pc.fill_null(m, False).filter(keep)
    if act == "toggle_scalar_data_type":
        v = pc.cast(_col(batch, value_col), pa.float64())
        if pa.types.is_integer(batch[value_col].type):
            out = v  # int -> double
        else:
            out = pc.if_else(m, pc.trunc(v), v)  # double -> int (flat col
            # stays float64 when unmatched rows share it)
        return batch.set_column(batch.column_names.index(value_col),
                                value_col, out), m
    if act == "experimental_scale_value":
        v = pc.cast(_col(batch, value_col), pa.float64())
        out = pc.if_else(m, pc.multiply(v, float(op["experimental_scale"])),
                         v)
        return batch.set_column(batch.column_names.index(value_col),
                                value_col, out), m
    if act in ("aggregate_labels", "aggregate_label_values"):
        raise ValueError("aggregate ops are planned at dataset level")
    raise ValueError(f"unknown metricstransform operation {act!r}")


def _apply_metric_transform(ds: Dataset, t: dict, name_col: str,
                            value_col: str) -> Dataset:
    action = t.get("action", "update")
    if action == "group":
        return _group_metric_transform(ds, t, name_col)
    if action == "combine":
        return _combine_metric_transform(ds, t, name_col, value_col)
    if action not in ("update", "insert"):
        raise ValueError(f"unknown metricstransform action {action!r}")
    ops = t.get("operations") or []
    agg_ops = [o for o in ops if o["action"] in
               ("aggregate_labels", "aggregate_label_values")]
    row_t = {**t, "operations": [o for o in ops if o["action"] not in
                                 ("aggregate_labels",
                                  "aggregate_label_values")]}
    rowfn = _metric_rowfn(row_t, name_col, value_col)

    if not agg_ops and action == "update":
        return ds.map_batches(lambda b: rowfn(b), batch_format="pyarrow",
                              batch_size=None)

    # stream splits below: materialize once so upstream lineage is not
    # re-executed per branch
    ds = ds.materialize()

    def unmatched_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(_metric_match(_col(b, name_col), t)))

    matched = ds.map_batches(lambda b: rowfn(b, only_matched=True),
                             batch_format="pyarrow", batch_size=None)
    col_order = matched.schema().names
    for op in agg_ops:
        matched = _agg_metric_op(matched, op, name_col, value_col,
                                 col_order)
    if action == "insert":
        return ds.union(matched)
    passthrough = ds.map_batches(unmatched_only, batch_format="pyarrow",
                                 batch_size=None)
    return passthrough.union(matched)


def _group_metric_transform(ds: Dataset, t: dict, name_col: str) -> Dataset:
    """action=group: move matched metrics into a new resource group —
    flat analogue stamps ``group_resource_labels`` as resource columns on
    the matched rows (the new ResourceMetrics copies the original resource
    then appends the labels, metrics_transform_processor_otlp.go:240-243);
    unmatched rows keep those columns' prior values (or null). One
    vectorized pass, no shuffle."""
    labels = {str(k): str(v)
              for k, v in (t.get("group_resource_labels") or {}).items()}

    def fn(b: pa.Table) -> pa.Table:
        m = _metric_match(_col(b, name_col), t)
        for k, v in labels.items():
            cur = pc.cast(_col(b, k), pa.string()) \
                if k in b.column_names else pa.nulls(b.num_rows, pa.string())
            val = pc.if_else(m, pa.scalar(v, pa.string()), cur)
            if k in b.column_names:
                b = b.set_column(b.column_names.index(k), k, val)
            else:
                b = b.append_column(k, val)
        return b

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _combine_metric_transform(ds: Dataset, t: dict, name_col: str,
                              value_col: str) -> Dataset:
    """action=combine: matched metrics are removed, their datapoints merge
    into ONE metric named ``new_name`` (metrics_transform_processor_otlp.go:
    397-440). Regexp capture groups become new label columns (key = group
    name, or ``$i`` for unnamed groups) whose values are the submatches of
    each source metric's NAME, case-folded per ``submatch_case``; empty
    submatches stay unset (null). Datapoints then aggregate by the full
    label set with ``aggregation_type``, and the transform's operations
    apply to the combined metric. Plan: one pass to split + stamp, then
    the partial/merge aggregate — scale-safe (the merge sees one row per
    distinct label tuple)."""
    if not t.get("new_name"):
        raise ValueError("combine requires new_name")
    regexp = t.get("match_type", "strict") == "regexp"
    sub_case = t.get("submatch_case", "")
    named, names = _name_capture_groups(t["include"]) if regexp \
        else (None, {})
    # capture-group attr keys in group order: name if named, else $i
    gkeys: list[tuple[str, str]] = []
    for ref, field in names.items():
        if ref == "0" or field == names.get("0"):
            continue
        if ref.isdigit():
            nm = field if not field.startswith("_g") else f"${ref}"
            gkeys.append((nm, field))

    ds = ds.materialize()

    def unmatched_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(_metric_match(_col(b, name_col), t)))

    def matched_stamp(b: pa.Table) -> pa.Table:
        name = _col(b, name_col)
        b = b.filter(_metric_match(name, t))
        name = _col(b, name_col)
        if regexp and gkeys:
            st = pc.extract_regex(name, named)
            for attr, field in gkeys:
                v = pc.struct_field(st, field)
                if sub_case == "lower":
                    v = pc.utf8_lower(v)
                elif sub_case == "upper":
                    v = pc.utf8_upper(v)
                # empty submatch -> attribute not set (":428-431")
                v = pc.if_else(pc.equal(v, ""), pa.nulls(len(v), v.type), v)
                if attr in b.column_names:
                    b = b.set_column(b.column_names.index(attr), attr, v)
                else:
                    b = b.append_column(attr, v)
        new = pa.nulls(b.num_rows, pa.string()).fill_null(t["new_name"])
        return b.set_column(b.column_names.index(name_col), name_col, new)

    matched = ds.map_batches(matched_stamp, batch_format="pyarrow",
                             batch_size=None)
    col_order = matched.schema().names
    all_labels = [c for c in col_order if c not in (name_col, value_col)]
    matched = _agg_metric_op(
        matched, {"action": "aggregate_labels", "label_set": all_labels,
                  "aggregation_type": t.get("aggregation_type", "sum")},
        name_col, value_col, col_order)
    ops = t.get("operations") or []
    if ops:
        rowfn = _metric_rowfn({**t, "match_type": "strict",
                               "include": t["new_name"], "new_name": None,
                               "operations": [o for o in ops if o["action"]
                                              not in ("aggregate_labels",
                                                      "aggregate_label_values")]},
                              name_col, value_col)
        matched = matched.map_batches(lambda b: rowfn(b),
                                      batch_format="pyarrow",
                                      batch_size=None)
        agg_ops = [o for o in ops if o["action"] in
                   ("aggregate_labels", "aggregate_label_values")]
        if agg_ops:
            # refresh the column order: row ops above may have added
            # labels (add_label) the aggregate must carry through
            col_order = matched.schema().names
            for op in agg_ops:
                matched = _agg_metric_op(matched, op, name_col, value_col,
                                         col_order)
    passthrough = ds.map_batches(unmatched_only, batch_format="pyarrow",
                                 batch_size=None)
    return _union_aligned(passthrough, matched)


def _union_aligned(left: Dataset, right: Dataset) -> Dataset:
    """Union two branches whose label column SETS may differ (per-metric
    label sets are legal in OTLP; the flat model represents an absent
    label as a typed-null column) — pad each side with the other's
    missing columns and emit one column order."""
    ls, rs = left.schema(), right.schema()
    # an empty branch (e.g. combine matched nothing) has no schema —
    # union contributes no rows, so the other branch IS the result
    if rs is None:
        return left
    if ls is None:
        return right
    ltypes = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))
    order = list(ls.names) + [n for n in rs.names if n not in ltypes]

    def pad(missing: list[tuple[str, pa.DataType]]):
        def fn(b: pa.Table) -> pa.Table:
            for n, typ in missing:
                b = b.append_column(n, pa.nulls(b.num_rows, typ))
            return b.select(order)
        return fn

    add_l = [(n, rtypes[n]) for n in rs.names if n not in ltypes]
    add_r = [(n, ltypes[n]) for n in ls.names if n not in rtypes]
    if add_l or list(ls.names) != order:
        left = left.map_batches(pad(add_l), batch_format="pyarrow",
                                batch_size=None)
    if add_r or list(rs.names) != order:
        right = right.map_batches(pad(add_r), batch_format="pyarrow",
                                  batch_size=None)
    return left.union(right)


_AGG_FINALIZE = {"sum", "mean", "min", "max", "count"}


def _agg_metric_op(ds: Dataset, op: dict, name_col: str,
                   value_col: str, col_order: list[str]) -> Dataset:
    """aggregate_labels / aggregate_label_values via the partial/merge
    plan (sum+count partials cover mean; min/max compose). ``col_order``
    is the pre-aggregation column order: the merge re-emits it so the
    aggregated branch's blocks share one schema with the pass-through
    branch at the union."""
    aggr = op.get("aggregation_type", "sum")
    if aggr not in _AGG_FINALIZE:
        raise ValueError(f"aggregation_type {aggr!r} unsupported "
                         "(sum/mean/min/max/count)")
    label_set = op.get("label_set")
    remap_label = op.get("label")
    remap_vals = set(map(str, op.get("aggregated_values") or []))
    remap_new = op.get("new_value")

    def partial(batch: pa.Table) -> pa.Table:
        labels = [c for c in batch.column_names
                  if c not in (name_col, value_col)]
        if op["action"] == "aggregate_label_values" and remap_label and \
                remap_label in batch.column_names:
            cur = pc.cast(_col(batch, remap_label), pa.string())
            hit = pc.is_in(cur, value_set=pa.array(sorted(remap_vals),
                                                   pa.string()))
            batch = batch.set_column(
                batch.column_names.index(remap_label), remap_label,
                pc.if_else(hit, pa.scalar(str(remap_new), pa.string()),
                           cur))
            keys = [name_col] + labels
        else:
            keep = label_set if label_set is not None else []
            keys = [name_col] + [c for c in labels if c in keep]
        v = pc.cast(_col(batch, value_col), pa.float64())
        t2 = batch.select(keys).append_column("_v", v)
        out = t2.group_by(keys).aggregate(
            [("_v", "sum"), ("_v", "count"), ("_v", "min"), ("_v", "max")])
        out = out.rename_columns(keys + ["_s", "_c", "_mn", "_mx"])
        # carry dropped label columns as typed nulls so the union with
        # pass-through rows keeps ONE schema
        for c in labels:
            if c not in keys:
                out = out.append_column(c, pa.nulls(out.num_rows,
                                                    batch[c].type))
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def merge(batch: pa.Table) -> pa.Table:
        keys = [c for c in batch.column_names
                if c not in ("_s", "_c", "_mn", "_mx")]
        out = batch.group_by(keys).aggregate(
            [("_s", "sum"), ("_c", "sum"), ("_mn", "min"), ("_mx", "max")])
        out = out.rename_columns(keys + ["_s", "_c", "_mn", "_mx"])
        if aggr == "sum":
            v = out["_s"]
        elif aggr == "count":
            v = pc.cast(out["_c"], pa.float64())
        elif aggr == "mean":
            v = pc.divide(out["_s"], pc.cast(out["_c"], pa.float64()))
        elif aggr == "min":
            v = out["_mn"]
        else:
            v = out["_mx"]
        res = out.drop_columns(["_s", "_c", "_mn", "_mx"]) \
            .append_column(value_col, v)
        return res.select([c for c in col_order if c in res.column_names])

    return partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None)
