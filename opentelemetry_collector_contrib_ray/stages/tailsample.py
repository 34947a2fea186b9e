"""tailsamplingprocessor policy vocabulary — the batch analogue.

The reference buffers spans per trace for ``decision_wait``, then a policy
list votes per complete trace (processor/tailsamplingprocessor/
config.go:17-45 for the policy vocabulary, processor.go for the vote loop,
internal/sampling/*.go for each policy); the trace is kept when ANY
top-level policy samples it. In batch mode complete groups are available
(SURVEY.md §2.11), so the gather becomes: hash-partition rows on the trace
key, evaluate every policy vectorized over each partition's sorted groups,
keep sampled groups' rows. No span-level state survives outside a
partition, so the plan scales with partition count.

Policy configs mirror the reference mapstructure shapes (log-model
analogues where the span concept has no direct column):

  {"type": "always_sample"}
  {"type": "latency", "threshold_ms": L, "upper_threshold_ms": U}
      internal/sampling/latency.go: duration = max(ts)-min(ts) in
      [L, U) ms; U == 0 means unbounded.
  {"type": "span_count", "min_spans": m, "max_spans": M}   (M 0 = inf)
  {"type": "numeric_attribute", "key": k, "min_value": lo,
   "max_value": hi, "invert_match": bool}
      sampled when ANY row's k lies in [lo, hi]; inverted -> when NONE
      does (internal/sampling/numeric_tag_filter.go).
  {"type": "string_attribute", "key": k, "values": [...],
   "enabled_regex_matching": bool, "invert_match": bool}
  {"type": "boolean_attribute", "key": k, "value": bool}
  {"type": "status_code", "status_codes": ["ERROR", "OK", "UNSET"]}
      log analogue of internal/sampling/status_code.go on severity:
      ERROR = any row severity >= 17, OK = any in [1,17), UNSET = any
      0/null (the OTel severity<->status convention).
  {"type": "probabilistic", "sampling_percentage": P}
      group-key hash threshold; uses the md5%10000 identity that is
      reproducible in ANSI SQL (same scheme as md5_mod_sampler).
  {"type": "ottl_condition", "conditions": [Expr, ...]}
      sampled when ANY row matches ANY condition
      (internal/sampling/ottl.go); conditions are this repo's Expr
      objects (the OTTL condition compiler's output).
  {"type": "and", "and_sub_policy": [...]}
  {"type": "rate_limiting", "spans_per_second": R}      TOP LEVEL only
  {"type": "composite", "max_total_spans_per_second": R,
   "composite_sub_policy": [...named policies...],
   "rate_allocation": [{"policy": name, "percent": p}]}  TOP LEVEL only

Rate-limited policies need cross-partition coordination, but only within
one second of trace start time, so the scale path is: (1) per-partition
trace-level vote rows (one tiny row per trace), (2) per-second-window
budget allocation over the trace table (cumulative span count in
(t0, key) order — deterministic), (3) exact reduce-side semi-join of the
sampled keys back onto the rows. rate_limiting/composite nested under
``and`` is rejected (DIVERGENCES.md) — the reference meters them per
policy tick, which has no faithful batch meaning below top level.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..expr import Expr
from .metrics import key_change_mask
from .shuffle import SINGLE_TASK_BYTES as _SINGLE_TASK_BYTES, adaptive_n_parts, key_partitioner

_RATE_TYPES = ("rate_limiting", "composite")


class _GroupCtx:
    """Per-partition group view: rows sorted by (key, ts); aggregates are
    numpy reduceat slices shared across policies."""

    def __init__(self, table: pa.Table, key_col: str, ts_col: str):
        self.table = table
        self.key_col = key_col
        n = table.num_rows
        keys = table[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        self.keys = keys
        change = key_change_mask(keys, n) if n else np.zeros(0, bool)
        self.starts = np.nonzero(change)[0]
        self.ends = np.concatenate([self.starts[1:], [n]])
        self.counts = self.ends - self.starts
        self.n_groups = len(self.starts)
        ts = table[ts_col]
        tsc = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
        # normalize any timestamp unit to microseconds before the int64
        # view (latency /1000 -> ms and window //1e6 -> s below assume us);
        # a bare integer epoch column is taken as already-us
        if pa.types.is_timestamp(tsc.type):
            tsc = pc.cast(tsc, pa.timestamp("us"), safe=False)
        ts_int = pc.cast(tsc, pa.int64())
        valid = pc.is_valid(ts_int).to_numpy(zero_copy_only=False)
        tsv = pc.fill_null(ts_int, 0).to_numpy(zero_copy_only=False)
        # rows are (key, ts)-sorted with null ts at the group tail, so the
        # non-null group min is the first row; the max needs a null-masked
        # reduce. An all-null group's latency is meaningless and must
        # never sample (the reference cannot see spans without timestamps
        # at all): the raw max/min sentinels would WRAP in t1-t0 to +1us,
        # so pin both to 0 and record the mask for the latency policy.
        if self.n_groups:
            self.t0 = np.minimum.reduceat(
                np.where(valid, tsv, np.iinfo(np.int64).max), self.starts)
            self.t1 = np.maximum.reduceat(
                np.where(valid, tsv, np.iinfo(np.int64).min), self.starts)
            self.has_ts = np.add.reduceat(
                valid.astype(np.int64), self.starts) > 0
            self.t0[~self.has_ts] = 0
            self.t1[~self.has_ts] = 0
        else:
            self.t0 = self.t1 = np.zeros(0, np.int64)
            self.has_ts = np.zeros(0, bool)

    def group_any(self, row_mask: np.ndarray) -> np.ndarray:
        if self.n_groups == 0:
            return np.zeros(0, bool)
        return np.add.reduceat(row_mask.astype(np.int64), self.starts) > 0

    def col(self, name: str) -> pa.Array:
        """Attribute column, or an all-null column when the batch schema
        lacks it — the flat model encodes 'no record carries this key' as
        a missing column, and the reference treats a missing attribute as
        no-match, not an error (same rule as filtermatch._ColIfPresent)."""
        if name not in self.table.column_names:
            return pa.nulls(self.table.num_rows, pa.string())
        c = self.table[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    def group_keys(self) -> pa.Array:
        return self.keys.take(pa.array(self.starts.astype(np.int64)))


def _md5_group_hash(keys: pa.Array, percent: float) -> np.ndarray:
    """md5-threshold sampling vote per group key — hashing cost
    O(distinct keys) via dictionary encoding (the md5_hex trick,
    stages/dedup.py), not O(groups)."""
    cut = int(percent * 100)
    d = pc.dictionary_encode(pc.cast(keys, pa.string()))
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    uniq = np.array([
        int(hashlib.md5(v.encode()).hexdigest()[:8], 16) % 10000 < cut
        for v in d.dictionary.to_pylist()], bool)
    idx = d.indices.to_numpy(zero_copy_only=False)  # float64 when nulls
    ok = ~np.isnan(idx) if idx.dtype.kind == "f" else np.ones(len(idx), bool)
    out = np.zeros(len(idx), bool)
    if uniq.size:
        out[ok] = uniq[idx[ok].astype(np.int64)]
    return out


def _eval_policy(p: dict, ctx: _GroupCtx) -> np.ndarray:
    t = p["type"]
    if t == "always_sample":
        return np.ones(ctx.n_groups, bool)
    if t == "latency":
        dur_ms = (ctx.t1 - ctx.t0) / 1000.0
        m = dur_ms >= float(p.get("threshold_ms", 0))
        hi = float(p.get("upper_threshold_ms", 0))
        if hi:
            m &= dur_ms < hi
        return m & ctx.has_ts  # unmeasurable groups never sample
    if t == "span_count":
        m = ctx.counts >= int(p.get("min_spans", 0))
        mx = int(p.get("max_spans", 0))
        if mx:
            m &= ctx.counts <= mx
        return m
    if t == "numeric_attribute":
        col = ctx.col(p["key"])
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # non-numeric strings simply don't match
            # (numeric_tag_filter.go skips attrs that aren't numbers);
            # pc.cast would abort the task on the first bad value
            import polars as pl
            v = pl.from_arrow(col).cast(pl.Float64, strict=False) \
                .to_numpy().astype(np.float64)
        else:
            v = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
        row = ~np.isnan(v)
        if p.get("min_value") is not None:
            row &= v >= float(p["min_value"])
        if p.get("max_value") is not None:
            row &= v <= float(p["max_value"])
        m = ctx.group_any(row)
        return ~m if p.get("invert_match") else m
    if t == "string_attribute":
        col = pc.cast(ctx.col(p["key"]), pa.string())
        if p.get("enabled_regex_matching"):
            row = np.zeros(len(col), bool)
            for pat in p["values"]:
                row |= np.asarray(pc.fill_null(
                    pc.match_substring_regex(col, pat), False))
        else:
            row = np.asarray(pc.fill_null(
                pc.is_in(col, value_set=pa.array(p["values"], pa.string())),
                False))
        m = ctx.group_any(row)
        return ~m if p.get("invert_match") else m
    if t == "boolean_attribute":
        col = pc.cast(ctx.col(p["key"]), pa.bool_())
        want = bool(p.get("value", True))
        row = np.asarray(pc.fill_null(pc.equal(col, want), False))
        return ctx.group_any(row)
    if t == "status_code":
        sev = pc.cast(ctx.col(p.get("key", "severity_number")), pa.int64())
        v = pc.fill_null(sev, 0).to_numpy(zero_copy_only=False)
        m = np.zeros(ctx.n_groups, bool)
        for code in p["status_codes"]:
            if code == "ERROR":
                m |= ctx.group_any(v >= 17)
            elif code == "OK":
                m |= ctx.group_any((v >= 1) & (v < 17))
            elif code == "UNSET":
                m |= ctx.group_any(v == 0)
            else:
                raise ValueError(f"status_code: unknown code {code!r}")
        return m
    if t == "probabilistic":
        return _md5_group_hash(ctx.group_keys(),
                               float(p["sampling_percentage"]))
    if t == "ottl_condition":
        row = np.zeros(ctx.table.num_rows, bool)
        for cond in p["conditions"]:
            if not isinstance(cond, Expr):
                raise TypeError("ottl_condition: conditions must be "
                                "compiled Expr objects")
            row |= np.asarray(cond.mask(ctx.table))
        return ctx.group_any(row)
    if t == "and":
        subs = p["and_sub_policy"]
        m = np.ones(ctx.n_groups, bool)
        for sp in subs:
            if sp["type"] in _RATE_TYPES:
                raise ValueError(f"{sp['type']} is only supported as a "
                                 "top-level policy (DIVERGENCES.md)")
            m &= _eval_policy(sp, ctx)
        return m
    raise ValueError(f"unknown tail-sampling policy type {t!r}")


def _sorted_partition(group: pa.Table, key_col: str, ts_col: str,
                      drop: list[str]) -> pa.Table:
    # null ts rows are KEPT (they sort to their group's tail and are
    # ignored by the time-based aggregates in _GroupCtx) so both plans —
    # direct filter and semi-join — return the same rows for a sampled
    # group: a sampler decides keep/drop per trace, it never edits rows
    group = group.drop_columns(drop)
    return group.sort_by([(key_col, "ascending"), (ts_col, "ascending")])


def tail_sample(ds: Dataset, policies: list[dict], *,
                key_col: str = "conv_id", ts_col: str = "ts",
                n_parts: int | None = None,
                size_bytes: int | None = None,
                pre_grouped: bool = False) -> Dataset:
    """Keep the rows of every group sampled by ANY policy (the reference's
    top-level OR across the policy list). Rate-limited policies take the
    three-stage windowed-budget plan; everything else decides in ONE pass
    over the key-partitioned rows.

    ``pre_grouped=True`` declares that every group's rows are contained in
    a single input block (the same partitioning assumption as
    ``recombine_blocks``; produce such blocks with
    ``sources.grouped.read_file_blocks`` — a plain ``read_parquet``
    re-splits blocks at arbitrary rows and silently voids the contract).
    Plain policies then decide block-locally with ZERO shuffle;
    the rated plan computes its skinny per-trace vote rows block-locally,
    dropping one full-data exchange (the data still shuffles once, in the
    decision semi-join)."""
    n_parts = n_parts or adaptive_n_parts(size_bytes)
    # tiny-input hybrid (same pattern as dedup's connected-components):
    # below ~32 MB on disk the three-shuffle plan is pure fixed cost —
    # collapse to one block and decide in a single task. The distributed
    # plan is untouched for real inputs (size unknown -> distributed).
    if (size_bytes is not None and size_bytes <= _SINGLE_TASK_BYTES
            and not pre_grouped):
        return _tail_sample_single(ds, policies, key_col=key_col,
                                   ts_col=ts_col)
    if any(p["type"] in _RATE_TYPES for p in policies):
        return _tail_sample_rated(ds, policies, key_col=key_col,
                                  ts_col=ts_col, n_parts=n_parts,
                                  pre_grouped=pre_grouped)

    def decide(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group
        ctx = _GroupCtx(group, key_col, ts_col)
        m = np.zeros(ctx.n_groups, bool)
        for p in policies:
            m |= _eval_policy(p, ctx)
        return group.filter(pa.array(np.repeat(m, ctx.counts)))

    if pre_grouped:
        return ds.map_batches(
            lambda b: decide(_sorted_partition(b, key_col, ts_col, [])),
            batch_format="pyarrow", batch_size=None)

    add_part = key_partitioner(key_col, n_parts)

    def per_partition(group: pa.Table) -> pa.Table:
        return decide(_sorted_partition(group, key_col, ts_col, ["_part"]))

    tagged = ds.map_batches(add_part, batch_format="pyarrow",
                            batch_size=None)
    return tagged.groupby("_part").map_groups(per_partition,
                                              batch_format="pyarrow")


def _tail_sample_rated(ds: Dataset, policies: list[dict], *, key_col: str,
                       ts_col: str, n_parts: int,
                       pre_grouped: bool = False) -> Dataset:
    """Rate-limited plan: trace-level votes -> per-second budget ->
    semi-join sampled keys back. The budget is deterministic: traces
    consume their second-window's span budget in (t0, key) order
    (internal/sampling/rate_limiting.go meters spans per second of
    processing time; batch replays it against trace start time)."""
    plain = [p for p in policies if p["type"] not in _RATE_TYPES]
    rated = [p for p in policies if p["type"] in _RATE_TYPES]
    add_part = key_partitioner(key_col, n_parts)

    def votes(group: pa.Table, drop: list[str] = ("_part",)) -> pa.Table:
        group = _sorted_partition(group, key_col, ts_col, list(drop))
        return _trace_votes(group, key_col, ts_col, plain, rated)

    if pre_grouped:
        # groups are block-contained: one skinny vote row per trace comes
        # straight off each block, no full-data exchange
        trace_tbl = ds.map_batches(lambda b: votes(b, drop=()),
                                   batch_format="pyarrow", batch_size=None)
    else:
        trace_tbl = (ds.map_batches(add_part, batch_format="pyarrow",
                                    batch_size=None)
                     .groupby("_part").map_groups(votes,
                                                  batch_format="pyarrow"))

    # budget stage: windows are independent -> partition on the window id
    win_parts = max(32, n_parts // 4)

    def add_win(b: pa.Table) -> pa.Table:
        win = pc.divide(b["_t0"], 1_000_000)
        from .shuffle import int_partition_ids
        wb = b.append_column("_win", pc.cast(win, pa.int64()))
        part = int_partition_ids(wb, ["_win"], win_parts)
        return wb.append_column("_wpart", pa.array(part))

    def allocate(g: pa.Table) -> pa.Table:
        return _allocate(g, rated)

    sampled_keys = (trace_tbl.map_batches(add_win, batch_format="pyarrow",
                                          batch_size=None)
                    .groupby("_wpart").map_groups(allocate,
                                                  batch_format="pyarrow"))
    return semi_join_keys(ds, sampled_keys, key_col=key_col,
                          keys_col="_tkey", n_parts=n_parts)


def _trace_votes(group: pa.Table, key_col: str, ts_col: str,
                 plain: list[dict], rated: list[dict]) -> pa.Table:
    """One skinny row per trace: key, start ts, span count, plain-policy
    pre-vote, and per-rated-policy sub-policy assignment."""
    cols: dict = {}
    ctx = _GroupCtx(group, key_col, ts_col)
    cols["_tkey"] = pc.cast(ctx.group_keys(), pa.string())
    cols["_t0"] = pa.array(ctx.t0, pa.int64())
    cols["_n"] = pa.array(ctx.counts.astype(np.int64))
    pre = np.zeros(ctx.n_groups, bool)
    for p in plain:
        pre |= _eval_policy(p, ctx)
    cols["_pre"] = pa.array(pre)
    for j, p in enumerate(rated):
        if p["type"] == "composite":
            # assignment = first sub-policy that votes (factory.go's
            # ordered evaluation); -1 = no sub-policy matched
            assign = np.full(ctx.n_groups, -1, np.int64)
            for i, sp in enumerate(p["composite_sub_policy"]):
                sub = _eval_policy(
                    {k: v for k, v in sp.items() if k != "name"}, ctx)
                assign = np.where((assign < 0) & sub, i, assign)
            cols[f"_r{j}"] = pa.array(assign)
        else:
            cols[f"_r{j}"] = pa.array(np.zeros(ctx.n_groups, np.int64))
    return pa.table(cols)


def _allocate(g: pa.Table, rated: list[dict]) -> pa.Table:
    """Per-second-window budget allocation over trace vote rows (needs a
    ``_win`` column); returns the sampled ``_tkey`` rows."""
    g = g.sort_by([("_win", "ascending"), ("_t0", "ascending"),
                   ("_tkey", "ascending")])
    win = g["_win"].to_numpy(zero_copy_only=False)
    n = g["_n"].to_numpy(zero_copy_only=False)
    change = np.concatenate([[True], win[1:] != win[:-1]])
    starts = np.nonzero(change)[0]
    sampled = pc.fill_null(g["_pre"], False) \
        .to_numpy(zero_copy_only=False).copy()
    for j, p in enumerate(rated):
        rcol = g[f"_r{j}"].to_numpy(zero_copy_only=False)
        if p["type"] == "rate_limiting":
            budget = int(p["spans_per_second"])
            cum = _windowed_cumsum(n, starts)
            sampled |= cum <= budget
        else:  # composite
            total = int(p["max_total_spans_per_second"])
            alloc = {a["policy"]: a["percent"]
                     for a in p.get("rate_allocation", [])}
            subs = p["composite_sub_policy"]
            for i, sp in enumerate(subs):
                pct = alloc.get(sp.get("name"),
                                100.0 / max(1, len(subs)))
                budget = int(total * pct / 100.0)
                mine = rcol == i
                cum = _windowed_cumsum(np.where(mine, n, 0), starts)
                sampled |= mine & (cum <= budget)
    keep = g.filter(pa.array(sampled))
    return pa.table({"_tkey": keep["_tkey"]})


def _tail_sample_single(ds: Dataset, policies: list[dict], *,
                        key_col: str, ts_col: str) -> Dataset:
    """Tiny-input plan: all rows in one block, one task runs the whole
    vote -> budget -> filter chain exactly (the distributed plans'
    semantics over a single partition)."""
    plain = [p for p in policies if p["type"] not in _RATE_TYPES]
    rated = [p for p in policies if p["type"] in _RATE_TYPES]

    def one_task(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        b = _sorted_partition(b, key_col, ts_col, [])
        if not rated:
            ctx = _GroupCtx(b, key_col, ts_col)
            m = np.zeros(ctx.n_groups, bool)
            for p in policies:
                m |= _eval_policy(p, ctx)
            return b.filter(pa.array(np.repeat(m, ctx.counts)))
        v = _trace_votes(b, key_col, ts_col, plain, rated)
        v = v.append_column("_win", pc.cast(
            pc.divide(v["_t0"], 1_000_000), pa.int64()))
        keys = _allocate(v, rated)["_tkey"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return b.filter(pc.is_in(pc.cast(b[key_col], pa.string()),
                                 value_set=keys))

    return ds.repartition(1).map_batches(one_task, batch_format="pyarrow",
                                         batch_size=None)


def _windowed_cumsum(n: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each window start index."""
    c = np.cumsum(n)
    base = np.zeros_like(c)
    base[starts] = np.concatenate([[0], c[starts[1:] - 1]]) \
        if len(starts) > 1 else 0
    np.maximum.accumulate(base, out=base)
    return c - base


def semi_join_keys(ds: Dataset, keys_ds: Dataset, *, key_col: str,
                   keys_col: str, n_parts: int | None = None) -> Dataset:
    """Exact reduce-side semi-join: keep ``ds`` rows whose key appears in
    ``keys_ds``. Both sides hash-partition on the key (same seed), union,
    and each partition filters with one vectorized is_in — no driver-side
    key set, no broadcast of O(keys) state."""
    n_parts = n_parts or adaptive_n_parts()
    add_part = key_partitioner(key_col, n_parts)

    def tag_keys(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: pc.cast(b[keys_col], pa.string())})
        return key_partitioner(key_col, n_parts)(t) \
            .append_column("_side_k", pa.array([True] * t.num_rows))

    def tag_data(b: pa.Table) -> pa.Table:
        return add_part(b).append_column(
            "_side_k", pa.array([False] * b.num_rows))

    def filter_group(g: pa.Table) -> pa.Table:
        is_key = pc.fill_null(g["_side_k"], False) \
            .to_numpy(zero_copy_only=False)
        data = g.filter(pa.array(~is_key))
        keyset = pc.cast(g.filter(pa.array(is_key))[key_col], pa.string())
        if isinstance(keyset, pa.ChunkedArray):
            keyset = keyset.combine_chunks()
        keep = pc.is_in(pc.cast(data[key_col], pa.string()),
                        value_set=pc.unique(keyset))
        out = data.filter(pc.fill_null(keep, False))
        return out.drop_columns(["_part", "_side_k"])

    # schema alignment for the union: key rows carry only (key, part, side);
    # data columns are null-filled on the key side (ray Schema wraps the
    # arrow names/types)
    sch = ds.schema()
    col_types = dict(zip(sch.names, sch.types))

    def widen_keys(b: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in col_types.items():
            if name == key_col:
                cols[name] = pc.cast(b[key_col], typ)
            else:
                cols[name] = pa.nulls(b.num_rows, typ)
        cols["_part"] = b["_part"]
        cols["_side_k"] = b["_side_k"]
        return pa.table(cols)

    keys_tagged = keys_ds.map_batches(tag_keys, batch_format="pyarrow",
                                      batch_size=None) \
        .map_batches(widen_keys, batch_format="pyarrow", batch_size=None)
    data_tagged = ds.map_batches(tag_data, batch_format="pyarrow",
                                 batch_size=None)
    return data_tagged.union(keys_tagged).groupby("_part") \
        .map_groups(filter_group, batch_format="pyarrow")
