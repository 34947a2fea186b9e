"""tailsamplingprocessor batch analogue — policy vocabulary unit tests.

Policy semantics sources:
  - latency window [threshold, upper): internal/sampling/latency.go
  - numeric/string/boolean attribute any-row matching + invert:
    internal/sampling/{numeric,string,boolean}_tag_filter.go
  - span_count min/max: internal/sampling/span_count_sampler.go
  - status_code vocabulary: internal/sampling/status_code.go (severity
    analogue documented in stages/tailsample.py)
  - rate_limiting per-second budget: internal/sampling/rate_limiting.go
  - composite ordered sub-policies with rate allocation:
    internal/sampling/composite.go
  - top-level OR + and policy: processor.go decision loop
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opentelemetry_collector_contrib_ray.expr import col
from opentelemetry_collector_contrib_ray.stages.tailsample import (
    _GroupCtx, _eval_policy, semi_join_keys, tail_sample)

US = 1_000_000


def _tbl(rows):
    cols = {k: [r.get(k) for r in rows] for k in rows[0]}
    t = {k: pa.array(v) for k, v in cols.items()}
    if "ts" in t:
        t["ts"] = pa.array(cols["ts"], pa.timestamp("us"))
    return pa.table(t)


def _ctx(rows):
    t = _tbl(rows).sort_by([("k", "ascending"), ("ts", "ascending")])
    return _GroupCtx(t, "k", "ts")


BASE = [
    # trace a: 3 rows, 5s duration, severities 17/5/0, tool bash
    {"k": "a", "ts": 0, "sev": 17, "tool": "bash", "ms": 10.0, "ok": True},
    {"k": "a", "ts": 3 * US, "sev": 5, "tool": "edit", "ms": None,
     "ok": False},
    {"k": "a", "ts": 5 * US, "sev": 0, "tool": None, "ms": 50.0,
     "ok": None},
    # trace b: 1 row, 0s duration, severity 9
    {"k": "b", "ts": 10 * US, "sev": 9, "tool": "web", "ms": 200.0,
     "ok": False},
]


@pytest.mark.parametrize("policy,want", [
    ({"type": "always_sample"}, [True, True]),
    ({"type": "latency", "threshold_ms": 4000}, [True, False]),
    ({"type": "latency", "threshold_ms": 0, "upper_threshold_ms": 1},
     [False, True]),
    ({"type": "span_count", "min_spans": 2}, [True, False]),
    ({"type": "span_count", "min_spans": 1, "max_spans": 1},
     [False, True]),
    ({"type": "numeric_attribute", "key": "ms", "min_value": 100},
     [False, True]),
    ({"type": "numeric_attribute", "key": "ms", "min_value": 0,
      "max_value": 60, "invert_match": True}, [False, True]),
    ({"type": "string_attribute", "key": "tool", "values": ["bash"]},
     [True, False]),
    ({"type": "string_attribute", "key": "tool", "values": ["w.b"],
      "enabled_regex_matching": True}, [False, True]),
    ({"type": "string_attribute", "key": "tool", "values": ["bash"],
      "invert_match": True}, [False, True]),
    ({"type": "boolean_attribute", "key": "ok", "value": True},
     [True, False]),
    ({"type": "boolean_attribute", "key": "ok", "value": False},
     [True, True]),
    ({"type": "status_code", "key": "sev", "status_codes": ["ERROR"]}, [True, False]),
    ({"type": "status_code", "key": "sev", "status_codes": ["UNSET"]}, [True, False]),
    ({"type": "status_code", "key": "sev", "status_codes": ["OK"]}, [True, True]),
    ({"type": "and", "and_sub_policy": [
        {"type": "status_code", "key": "sev", "status_codes": ["ERROR"]},
        {"type": "span_count", "min_spans": 2}]}, [True, False]),
])
def test_policy_decisions(policy, want):
    assert _eval_policy(policy, _ctx(BASE)).tolist() == want


def test_ottl_condition_policy():
    got = _eval_policy({"type": "ottl_condition",
                        "conditions": [col("sev") >= 17]}, _ctx(BASE))
    assert got.tolist() == [True, False]


def test_probabilistic_matches_md5_identity():
    import hashlib
    ctx = _ctx(BASE)
    got = _eval_policy({"type": "probabilistic",
                        "sampling_percentage": 50}, ctx)
    want = [int(hashlib.md5(k.encode()).hexdigest()[:8], 16) % 10000 < 5000
            for k in ["a", "b"]]
    assert got.tolist() == want


def test_rate_policy_rejected_under_and():
    with pytest.raises(ValueError):
        _eval_policy({"type": "and", "and_sub_policy": [
            {"type": "rate_limiting", "spans_per_second": 1}]}, _ctx(BASE))


def test_tail_sample_dataset(ray_session):
    ds = ray.data.from_arrow(_tbl(BASE))
    out = tail_sample(ds, [{"type": "status_code", "key": "sev",
                            "status_codes": ["ERROR"]}],
                      key_col="k", ts_col="ts").to_pandas()
    assert sorted(out["k"].unique()) == ["a"]
    assert len(out) == 3  # whole trace kept


def test_tail_sample_rate_budget(ray_session):
    # two traces start in the same second: n=3 then n=1 in (t0, key)
    # order; budget 3 keeps only trace a. trace c starts in a later
    # second with a fresh budget.
    rows = BASE + [{"k": "c", "ts": 2_000_000 * US, "sev": 1,
                    "tool": None, "ms": None, "ok": None}]
    # make a and b share a start second
    rows = [dict(r) for r in rows]
    for r in rows:
        if r["k"] == "b":
            r["ts"] = int(0.5 * US)
    ds = ray.data.from_arrow(_tbl(rows))
    out = tail_sample(ds, [{"type": "rate_limiting",
                            "spans_per_second": 3}],
                      key_col="k", ts_col="ts").to_pandas()
    assert sorted(out["k"].unique()) == ["a", "c"]


def test_tail_sample_composite(ray_session):
    # composite: errors policy gets the whole budget, latency second in
    # order; trace a assigned to errors (first match), b to latency
    rows = [dict(r) for r in BASE]
    policy = {"type": "composite", "max_total_spans_per_second": 100,
              "composite_sub_policy": [
                  {"name": "errs", "type": "status_code", "key": "sev",
                   "status_codes": ["ERROR"]},
                  {"name": "slow", "type": "numeric_attribute",
                   "key": "ms", "min_value": 100}],
              "rate_allocation": [{"policy": "errs", "percent": 50},
                                  {"policy": "slow", "percent": 50}]}
    out = tail_sample(ray.data.from_arrow(_tbl(rows)), [policy],
                      key_col="k", ts_col="ts").to_pandas()
    assert sorted(out["k"].unique()) == ["a", "b"]
    # zero allocation for 'slow' -> b dropped
    policy2 = dict(policy,
                   rate_allocation=[{"policy": "errs", "percent": 100},
                                    {"policy": "slow", "percent": 0}])
    out2 = tail_sample(ray.data.from_arrow(_tbl(rows)), [policy2],
                       key_col="k", ts_col="ts").to_pandas()
    assert sorted(out2["k"].unique()) == ["a"]


def test_semi_join_keys(ray_session):
    data = ray.data.from_items(
        [{"k": f"k{i % 5}", "v": i} for i in range(100)])
    keys = ray.data.from_items([{"key": "k1"}, {"key": "k3"},
                                {"key": "nope"}])
    out = semi_join_keys(data, keys, key_col="k", keys_col="key",
                         n_parts=8).to_pandas()
    assert sorted(out["k"].unique()) == ["k1", "k3"]
    assert len(out) == 40


def test_group_ctx_normalizes_timestamp_unit():
    """A ns-unit ts column must not inflate durations 1000x: a 5ms trace
    fails threshold_ms=4000 and passes threshold_ms=5."""
    t = pa.table({"k": ["a", "a"],
                  "ts": pa.array([0, 5_000_000], pa.timestamp("ns"))})
    ctx = _GroupCtx(t, "k", "ts")
    assert _eval_policy({"type": "latency", "threshold_ms": 4000},
                        ctx).tolist() == [False]
    assert _eval_policy({"type": "latency", "threshold_ms": 5},
                        ctx).tolist() == [True]


def test_numeric_attribute_skips_non_numeric_strings():
    """numeric_tag_filter.go skips attributes that aren't numbers — a
    malformed string value must not abort the partition task."""
    rows = [
        {"k": "a", "ts": 0, "ms": "250"},
        {"k": "a", "ts": US, "ms": "fast"},
        {"k": "b", "ts": 0, "ms": "10"},
    ]
    got = _eval_policy({"type": "numeric_attribute", "key": "ms",
                        "min_value": 100}, _ctx(rows))
    assert got.tolist() == [True, False]


def test_null_ts_rows_kept_in_both_plans(ray_session):
    """A sampler decides keep/drop per trace and never edits rows: a
    sampled trace's null-ts row survives the direct plan exactly like the
    semi-join (rated) plan."""
    rows = [
        {"k": "a", "ts": 0, "sev": 17},
        {"k": "a", "ts": None, "sev": 5},
        {"k": "b", "ts": 0, "sev": 9},
    ]
    ds = ray.data.from_arrow(_tbl(rows))
    pol = {"type": "status_code", "key": "sev", "status_codes": ["ERROR"]}
    direct = tail_sample(ds, [pol], key_col="k", n_parts=4).to_pandas()
    rated = tail_sample(
        ds, [{"type": "and", "and_sub_policy": [pol]},
             {"type": "rate_limiting", "spans_per_second": 0}],
        key_col="k", n_parts=4).to_pandas()
    assert len(direct) == 2 and set(direct["k"]) == {"a"}
    assert direct["ts"].isna().sum() == 1
    assert len(rated) == 2 and rated["ts"].isna().sum() == 1


def test_pre_grouped_plans_match_shuffle_plans(ray_session, tmp_path):
    """pre_grouped=True (block-contained groups) must return exactly the
    shuffle plan's rows — plain and rated — with the groups spread over
    MULTIPLE blocks (read via read_file_blocks, the supported entry)."""
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.sources.grouped import (
        read_file_blocks)
    groups = {
        "f0": [{"k": "a", "ts": 0, "sev": 17, "tool": "bash"},
               {"k": "a", "ts": US, "sev": 5, "tool": "edit"}],
        "f1": [{"k": "b", "ts": 0, "sev": 9, "tool": "bash"},
               {"k": "c", "ts": 2 * US, "sev": 3, "tool": "web"}],
        "f2": [{"k": "d", "ts": 3 * US, "sev": 17, "tool": "bash"}],
    }
    for name, rows in groups.items():
        pq.write_table(_tbl(rows), str(tmp_path / f"{name}.parquet"))
    ds = read_file_blocks(str(tmp_path))
    pols = [{"type": "string_attribute", "key": "tool",
             "values": ["bash"]}]

    def key_set(d):
        return sorted(map(tuple, d[["k", "ts"]].itertuples(index=False)))

    a = tail_sample(ds, pols, key_col="k", n_parts=4).to_pandas()
    b = tail_sample(ds, pols, key_col="k", pre_grouped=True).to_pandas()
    assert key_set(a) == key_set(b) and len(a) == 4

    rpols = pols + [{"type": "rate_limiting", "spans_per_second": 100}]
    c = tail_sample(ds, rpols, key_col="k", n_parts=4).to_pandas()
    d = tail_sample(ds, rpols, key_col="k", n_parts=4,
                    pre_grouped=True).to_pandas()
    assert key_set(c) == key_set(d)


def test_read_file_blocks_preserves_file_boundaries(ray_session, tmp_path):
    """read_file_blocks: one file -> one block, so group-contained files
    stay group-contained blocks (read_parquet would re-split them)."""
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.sources.grouped import (
        read_file_blocks)
    for i in range(3):
        pq.write_table(
            pa.table({"k": [f"g{i}"] * 4, "v": list(range(4))}),
            str(tmp_path / f"part-{i}.parquet"))
    ds = read_file_blocks(str(tmp_path), columns=["k"])
    sizes = [b.num_rows for b in ds.iter_batches(batch_format="pyarrow",
                                                 batch_size=None)]
    assert sorted(sizes) == [4, 4, 4]
    assert ds.count() == 12


def test_read_file_blocks_group_safe_spans(ray_session, tmp_path):
    """group_col+target_rows: files split into ~target-row blocks at
    statistics-proven group boundaries — every block still holds whole
    groups, parallelism exceeds the file count, no rows lost."""
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.sources.grouped import (
        read_file_blocks)
    # one file, 10 groups x 50 rows, row groups of 100 (group-aligned)
    t = pa.table({
        "k": [f"g{i:02d}" for i in range(10) for _ in range(50)],
        "v": list(range(500))})
    pq.write_table(t, str(tmp_path / "part-0.parquet"), row_group_size=100)
    ds = read_file_blocks(str(tmp_path), group_col="k", target_rows=150)
    blocks = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    assert len(blocks) > 1
    assert sum(b.num_rows for b in blocks) == 500
    seen: dict[str, int] = {}
    for bi, b in enumerate(blocks):
        for k in set(b["k"].to_pylist()):
            assert seen.setdefault(k, bi) == bi  # group in exactly 1 block


def test_read_file_blocks_unaligned_row_groups_fall_back(ray_session,
                                                         tmp_path):
    """A straddling row-group boundary (stats max == next min) is never
    chosen as a cut — the groups stay together in one block."""
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.sources.grouped import (
        read_file_blocks)
    # 2 groups x 100 rows, row groups of 60: every boundary straddles
    t = pa.table({"k": ["a"] * 100 + ["b"] * 100, "v": list(range(200))})
    pq.write_table(t, str(tmp_path / "part-0.parquet"), row_group_size=60)
    ds = read_file_blocks(str(tmp_path), group_col="k", target_rows=50)
    blocks = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    assert sum(b.num_rows for b in blocks) == 200
    # the a|b boundary at row 100 sits inside row group 1 (60..120), so
    # no cut is provable; 'a' and 'b' may share a block but no group may
    # be SPLIT across blocks
    import collections
    cnt: dict[str, set[int]] = collections.defaultdict(set)
    for bi, b in enumerate(blocks):
        for k in set(b["k"].to_pylist()):
            cnt[k].add(bi)
    assert all(len(v) == 1 for v in cnt.values())


def test_group_safe_spans_refuse_unsorted_files(ray_session, tmp_path):
    """A file that is not row-group-monotone on group_col gets NO cuts:
    a group may recur in a non-adjacent row group, so no boundary is
    provably safe (review finding: {a,c}|{b,c} used to 'prove' a cut)."""
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.sources.grouped import (
        _group_safe_spans, read_file_blocks)
    t = pa.table({"k": ["a", "c", "b", "c"], "v": [1, 2, 3, 4]})
    f = str(tmp_path / "part-0.parquet")
    pq.write_table(t, f, row_group_size=2)  # rg0={a,c}, rg1={b,c}
    assert _group_safe_spans(f, "k", 1) == [(0, 2)]  # whole file
    ds = read_file_blocks(str(tmp_path), group_col="k", target_rows=1)
    blocks = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    import collections
    cnt = collections.defaultdict(set)
    for bi, b in enumerate(blocks):
        for k in set(b["k"].to_pylist()):
            cnt[k].add(bi)
    assert all(len(v) == 1 for v in cnt.values())


def test_group_safe_spans_nested_column_before_group_col(ray_session,
                                                         tmp_path):
    """group_col must resolve to its parquet LEAF column even when an
    earlier column is nested (review finding: the arrow field index
    pointed the stats at struct leaf s.y and split group g0)."""
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.sources.grouped import (
        _group_safe_spans)
    t = pa.table({
        "s": pa.array([{"x": i, "y": i} for i in range(6)]),
        "k": pa.array(["g0", "g0", "g0", "g0", "g1", "g1"]),
        "v": pa.array(range(6))})
    f = str(tmp_path / "part-0.parquet")
    pq.write_table(t, f, row_group_size=2)  # g0 spans rg0-rg1
    spans = _group_safe_spans(f, "k", 1)
    # the only k-safe cut is after rg1 (g0|g1 boundary at row 4)
    assert spans == [(0, 2), (2, 3)]


def test_read_file_blocks_half_specified_args_raise(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pytest
    from opentelemetry_collector_contrib_ray.sources.grouped import (
        read_file_blocks)
    pq.write_table(pa.table({"k": ["a"], "v": [1]}),
                   str(tmp_path / "p.parquet"))
    with pytest.raises(ValueError, match="together"):
        read_file_blocks(str(tmp_path), group_col="k")
    with pytest.raises(ValueError, match="together"):
        read_file_blocks(str(tmp_path), target_rows=10)


def test_latency_policy_all_null_ts_never_samples(ray_session):
    """An all-null-timestamp group has no measurable latency and must not
    sample (review finding: int64 sentinel wrap made t1-t0 == 1us, so
    threshold_ms=0 falsely sampled it)."""
    from opentelemetry_collector_contrib_ray.stages.tailsample import (
        _GroupCtx, _eval_policy)
    t = pa.table({
        "k": ["g1", "g1", "g2"],
        "ts": pa.array([None, None, 1_000_000], pa.timestamp("us"))})
    ctx = _GroupCtx(t, "k", "ts")
    m = _eval_policy({"type": "latency", "threshold_ms": 0}, ctx)
    assert list(m) == [False, True]  # g1 unmeasurable, g2 measurable


def test_attribute_policy_missing_column_is_no_match(ray_session):
    """A policy key absent from the batch schema means no record carries
    that attribute: no-match (and all-match when inverted), never a
    KeyError that kills the task (review finding)."""
    from opentelemetry_collector_contrib_ray.stages.tailsample import (
        _GroupCtx, _eval_policy)
    t = pa.table({"k": ["g1", "g2"],
                  "ts": pa.array([0, 1], pa.timestamp("us"))})
    ctx = _GroupCtx(t, "k", "ts")
    p = {"type": "string_attribute", "key": "tool", "values": ["bash"]}
    assert list(_eval_policy(p, ctx)) == [False, False]
    assert list(_eval_policy({**p, "invert_match": True}, ctx)) == \
        [True, True]
    pn = {"type": "numeric_attribute", "key": "rc", "min_value": 0}
    assert list(_eval_policy(pn, ctx)) == [False, False]
    pb = {"type": "boolean_attribute", "key": "ok", "value": True}
    assert list(_eval_policy(pb, ctx)) == [False, False]
