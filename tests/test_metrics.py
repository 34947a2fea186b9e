"""Metrics-connector family tests: histogram, service graph edges,
delta->cumulative (SURVEY.md §2.6-2.7)."""

import pyarrow as pa
import ray.data

import pandas as pd

from opentelemetry_collector_contrib_ray.stages.metrics import (
    cumulative_per_key,
    cumulative_to_delta,
    delta_to_rate,
    histogram_by,
    metric_start_time,
    transition_edges,
)


def test_histogram_buckets_and_null_skip():
    t = pa.table({
        "svc": ["a", "a", "a", "b", "b"],
        "v": pa.array([5, 10, 11, 9999, None], pa.int64()),
    })
    out = histogram_by(ray.data.from_arrow(t), ["svc"], "v",
                       [10.0, 100.0]).to_pandas()
    got = {(r.svc, r.bucket): r.n for r in out.itertuples()}
    # 5 and 10 both <=10 (searchsorted left == CASE <=); 11 -> <=100;
    # 9999 -> >100; null skipped entirely
    assert got == {("a", "<=10"): 2, ("a", "<=100"): 1, ("b", ">100"): 1}


def test_transition_edges():
    t = pa.table({
        "conv_id": ["c1"] * 4 + ["c2"] * 2,
        "turn_idx": pa.array([0, 1, 2, 3, 0, 1], pa.int32()),
        "service": ["client", "agent", "client", "agent", "client", "client"],
    })
    out = transition_edges(ray.data.from_arrow(t)).to_pandas()
    got = {(r.from_node, r.to_node): r.n for r in out.itertuples()}
    # c1: client->agent, agent->client, client->agent; c2: client->client
    assert got == {("client", "agent"): 2, ("agent", "client"): 1,
                   ("client", "client"): 1}


def test_cumulative_per_key_with_negatives():
    t = pa.table({
        "k": ["a", "a", "a", "b"],
        "o": pa.array([0, 1, 2, 0], pa.int64()),
        "v": pa.array([1.0, -2.0, 3.0, 7.0], pa.float64()),
    })
    out = cumulative_per_key(ray.data.from_arrow(t), key_col="k",
                             order_col="o", value_col="v").to_pandas() \
        .sort_values(["k", "o"], ignore_index=True)
    assert out["cumulative"].tolist() == [1.0, -1.0, 2.0, 7.0]


def test_cumulative_to_delta_keep_and_drop(ray_session):
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.metrics import (
        cumulative_to_delta,
    )

    t = pa.table({
        "k": ["a", "a", "a", "b", "b"],
        "ts": pa.array([1, 2, 3, 1, 2], pa.int64()),
        "v": pa.array([10.0, 15.0, 30.0, 5.0, 4.0]),
    })
    ds = ray.data.from_arrow(t)
    keep = cumulative_to_delta(ds, key_col="k", order_col="ts", value_col="v",
                               initial="keep", n_parts=2).to_pandas()
    keep = keep.sort_values(["k", "ts"])
    assert list(keep.delta) == [10.0, 5.0, 15.0, 5.0, -1.0]
    drop = cumulative_to_delta(ray.data.from_arrow(t), key_col="k",
                               order_col="ts", value_col="v",
                               initial="drop", n_parts=2).to_pandas()
    drop = drop.sort_values(["k", "ts"])
    import math
    assert math.isnan(drop.delta.iloc[0]) and math.isnan(drop.delta.iloc[3])
    assert list(drop.delta.iloc[[1, 2, 4]]) == [5.0, 15.0, -1.0]


def test_delta_to_rate(ray_session):
    import datetime
    import math

    import ray.data

    from opentelemetry_collector_contrib_ray.stages.metrics import (
        delta_to_rate,
    )

    base = datetime.datetime(2024, 1, 1)
    t = pa.table({
        "k": ["a", "a", "a"],
        "ts": pa.array([base, base + datetime.timedelta(seconds=10),
                        base + datetime.timedelta(seconds=12)],
                       pa.timestamp("us")),
        "v": pa.array([100.0, 50.0, 10.0]),
    })
    out = delta_to_rate(ray.data.from_arrow(t), key_col="k", order_col="ts",
                        value_col="v", n_parts=2).to_pandas()
    out = out.sort_values("ts")
    assert math.isnan(out.rate.iloc[0])  # no previous point
    assert out.rate.iloc[1] == 5.0       # 50 / 10s
    assert out.rate.iloc[2] == 5.0       # 10 / 2s


def test_metric_start_time_strategies(ray_session):
    import datetime

    import ray.data

    from opentelemetry_collector_contrib_ray.stages.metrics import (
        metric_start_time,
    )

    base = datetime.datetime(2024, 1, 1)
    t = pa.table({
        "k": ["a", "a", "b"],
        "ts": pa.array([base, base + datetime.timedelta(seconds=5), base],
                       pa.timestamp("us")),
        "v": pa.array([10.0, 25.0, 7.0]),
    })
    trp = metric_start_time(ray.data.from_arrow(t), key_col="k",
                            order_col="ts", value_col="v",
                            strategy="true_reset_point",
                            n_parts=2).to_pandas().sort_values(["k", "ts"])
    assert list(trp.start_ts) == [base, base, base]
    assert len(trp) == 3

    sub = metric_start_time(ray.data.from_arrow(t), key_col="k",
                            order_col="ts", value_col="v",
                            strategy="subtract_initial_point",
                            n_parts=2).to_pandas().sort_values(["k", "ts"])
    # first point of each series dropped; values rebased to the baseline
    assert len(sub) == 1
    assert list(sub.v) == [15.0] and list(sub.start_ts) == [base]


def test_key_change_mask_nulls_equal():
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        key_change_mask,
    )

    keys = pa.array(["a", "a", None, None, "b"])
    mask = key_change_mask(keys, 5)
    assert list(mask) == [True, False, True, False, True]


def test_delta_to_rate_normalizes_timestamp_unit(ray_session):
    """A ms-unit ts column must not inflate rates 1000x."""
    import pyarrow as pa
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        delta_to_rate)
    t = pa.table({
        "k": ["a", "a"],
        "ts": pa.array([0, 2000], pa.timestamp("ms")),  # 2s apart
        "v": [0.0, 10.0],
    })
    out = delta_to_rate(ray.data.from_arrow(t), key_col="k",
                        order_col="ts", value_col="v",
                        n_parts=2).to_pandas().sort_values("ts")
    assert out["rate"].dropna().tolist() == [5.0]  # 10 / 2s


def test_cumulative_to_delta_null_value_is_gap(ray_session):
    """A null value is a gap: its delta is null (not a valid NaN float)
    and the NEXT point diffs against the last VALID point (review
    finding: one null poisoned two deltas with NaN)."""
    import ray.data as rd
    t = pa.table({
        "k": ["a"] * 3, "o": [1, 2, 3],
        "v": pa.array([10.0, None, 30.0], pa.float64())})
    out = cumulative_to_delta(rd.from_arrow(t), key_col="k", order_col="o",
                              value_col="v").to_pandas().sort_values("o")
    d = list(out["delta"])
    assert d[0] == 10.0
    assert pd.isna(d[1])
    assert d[2] == 20.0  # 30 - last valid (10), not NaN


def test_delta_to_rate_null_value_yields_null(ray_session):
    """A null value must give a NULL rate, not a valid NaN that survives
    is_valid filters (review finding)."""
    import ray.data as rd
    t = pa.table({
        "k": ["a"] * 3,
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000],
                       pa.timestamp("us")),
        "v": pa.array([5.0, None, 7.0], pa.float64())})
    out = delta_to_rate(rd.from_arrow(t), key_col="k", order_col="ts",
                        value_col="v").to_pandas().sort_values("ts")
    r = list(out["rate"])
    assert pd.isna(r[0]) and pd.isna(r[1])
    assert r[2] == 7.0


def test_metric_start_time_null_ts(ray_session):
    """Null timestamps must not crash the int64 round-trip or corrupt
    start stamps (review finding: float64 fallback -> NaN cast crash)."""
    import ray.data as rd
    t = pa.table({
        "k": ["a", "a", "b"],
        "o": [1, 2, 1],
        "ts": pa.array([None, 2_000_000, 3_000_000], pa.timestamp("us")),
        "v": pa.array([1.0, 2.0, 3.0], pa.float64())})
    out = metric_start_time(rd.from_arrow(t), key_col="k", order_col="o",
                            value_col="v", ts_col="ts") \
        .to_pandas().sort_values(["k", "o"])
    s = list(out["start_ts"])
    assert pd.isna(s[0]) and pd.isna(s[1])  # series start ts unknown
    assert s[2] == pd.Timestamp("1970-01-01 00:00:03")


def test_histogram_skips_nan_values(ray_session):
    """NaN is as unrecorded as null — it must not inflate the overflow
    bucket (review finding)."""
    import ray.data as rd
    t = pa.table({"k": ["x"] * 4,
                  "v": pa.array([1.0, float("nan"), 100.0, None],
                                pa.float64())})
    out = histogram_by(rd.from_arrow(t), ["k"], "v", [10.0]) \
        .to_pandas().set_index("bucket")["n"]
    assert out.get("<=10", 0) == 1
    assert out.get(">10", 0) == 1


def test_expo_index_reference_mapping():
    """OTel base-2 exponential mapping (go-expohisto LogarithmMapping):
    bucket i covers (base^i, base^(i+1)]; exact powers of two land in
    the LOWER bucket."""
    import numpy as np
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        expo_index)
    # scale 0: base 2 -> 4 is the top of bucket 1 (2,4]; 5 is in (4,8]
    assert list(expo_index(np.array([4.0, 5.0, 1.0, 0.5, 3.0]), 0)) == \
        [1, 2, -1, -2, 1]
    # scale 3: base 2^(1/8); 2.0 = base^8 exactly -> index 7
    assert list(expo_index(np.array([2.0]), 3)) == [7]
    # scale 1: sqrt(2) base
    assert list(expo_index(np.array([2.0, 2.8, 4.0]), 1)) == [1, 2, 3]


def test_expo_fit_scales_downscale_to_max_size():
    import numpy as np
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        _fit_scales)
    # log2 range ~9.97 decades: 160 buckets fit at scale 3 (81 needed),
    # not at 4 (161 needed) — expohisto would downscale to exactly this
    assert list(_fit_scales(np.array([1.0]), np.array([1000.0]), 160)) \
        == [3]
    # single value fits at s_max
    assert list(_fit_scales(np.array([7.0]), np.array([7.0]), 4)) == [20]


def test_exp_histogram_by_signs_zero_and_autoscale(ray_session):
    import ray.data as rd
    t = pa.table({
        "k": ["a"] * 6 + ["b"] * 3,
        "v": pa.array([1.0, 2.0, 4.0, 5.0, 0.0, -3.0,
                       100.0, 200.0, None], pa.float64()),
    })
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        exp_histogram_by)
    out = exp_histogram_by(rd.from_arrow(t), ["k"], "v", scale=0) \
        .to_pandas().sort_values(["k", "sign", "bucket_idx"],
                                 ignore_index=True)
    a = out[out.k == "a"]
    # zero row, negative range row, positive buckets; null skipped
    assert list(map(tuple, a[["sign", "bucket_idx", "n"]].values)) == [
        (-1, 1, 1), (0, 0, 1), (1, -1, 1), (1, 0, 1), (1, 1, 1), (1, 2, 1)]
    # auto-scale: key b (range 100..200) refits to scale 1 under
    # max_size=4 while key a's mixed range forces scale 0
    out2 = exp_histogram_by(rd.from_arrow(t), ["k"], "v", max_size=4) \
        .to_pandas()
    assert set(out2[out2.k == "b"]["scale"]) == {1}
    assert set(out2[out2.k == "a"]["scale"]) == {0}
    assert list(out2[out2.k == "b"].sort_values("bucket_idx")
                ["bucket_idx"]) == [13, 15]


def _mt_table():
    return pa.table({
        "metric_name": ["cpu", "cpu", "mem", "cpu"],
        "host": ["a", "b", "a", "a"],
        "core": ["0", "1", None, "1"],
        "value": pa.array([1.0, 2.0, 5.0, 3.0], pa.float64()),
    })


def test_metrics_transform_update_rename_scale_addlabel(ray_session):
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        metrics_transform)
    out = metrics_transform(rd.from_arrow(_mt_table()), [{
        "include": "cpu", "action": "update", "new_name": "cpu.total",
        "operations": [
            {"action": "experimental_scale_value",
             "experimental_scale": 10},
            {"action": "add_label", "new_label": "unit",
             "new_value": "ms"},
        ]}]).to_pandas().sort_values(["metric_name", "host", "core"],
                                     ignore_index=True)
    assert list(out.metric_name) == ["cpu.total"] * 3 + ["mem"]
    assert list(out.value) == [10.0, 30.0, 20.0, 5.0]
    assert list(out.unit) == ["ms"] * 3 + [None]  # unmatched untouched


def test_metrics_transform_aggregate_labels_sum_and_mean(ray_session):
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        metrics_transform)
    out = metrics_transform(rd.from_arrow(_mt_table()), [{
        "include": "cpu", "action": "update",
        "operations": [{"action": "aggregate_labels",
                        "label_set": ["host"],
                        "aggregation_type": "sum"}]}]) \
        .to_pandas().sort_values(["metric_name", "host"],
                                 ignore_index=True)
    # core aggregated away (typed null), values summed per host
    assert list(out.value) == [4.0, 2.0, 5.0]
    assert out.core.isna().all()  # mem row carries a null core in the fixture
    mean = metrics_transform(rd.from_arrow(_mt_table()), [{
        "include": "cpu", "action": "update",
        "operations": [{"action": "aggregate_labels", "label_set": [],
                        "aggregation_type": "mean"}]}]).to_pandas()
    assert sorted(mean.value) == [2.0, 5.0]


def test_metrics_transform_insert_update_label_delete_value(ray_session):
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        metrics_transform)
    out = metrics_transform(rd.from_arrow(_mt_table()), [{
        "include": "^cpu$", "match_type": "regexp", "action": "insert",
        "new_name": "cpu_copy", "operations": []}]).to_pandas()
    assert sorted(out.metric_name) == \
        ["cpu"] * 3 + ["cpu_copy"] * 3 + ["mem"]
    # update_label: rename host->node with a value remap, matched only
    out2 = metrics_transform(rd.from_arrow(_mt_table()), [{
        "include": "cpu", "action": "update",
        "operations": [{"action": "update_label", "label": "host",
                        "new_label": "node",
                        "value_actions": [{"value": "a",
                                           "new_value": "alpha"}]}]}]) \
        .to_pandas().sort_values(["metric_name", "core"],
                                 ignore_index=True)
    cpu = out2[out2.metric_name == "cpu"]
    assert sorted(cpu.node) == ["alpha", "alpha", "b"]
    assert cpu.host.isna().all()
    assert out2[out2.metric_name == "mem"].host.tolist() == ["a"]
    # delete_label_value drops matched datapoints carrying the value
    out3 = metrics_transform(rd.from_arrow(_mt_table()), [{
        "include": "cpu", "action": "update",
        "operations": [{"action": "delete_label_value", "label": "host",
                        "label_value": "a"}]}]).to_pandas()
    assert len(out3) == 2  # cpu/b + mem/a survive
    assert sorted(out3.metric_name) == ["cpu", "mem"]


def test_metrics_transform_aggregate_label_values(ray_session):
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        metrics_transform)
    t = pa.table({"metric_name": ["m"] * 3, "env": ["dev", "test", "prod"],
                  "value": pa.array([1.0, 2.0, 4.0], pa.float64())})
    out = metrics_transform(rd.from_arrow(t), [{
        "include": "m", "action": "update",
        "operations": [{"action": "aggregate_label_values",
                        "label": "env",
                        "aggregated_values": ["dev", "test"],
                        "new_value": "nonprod",
                        "aggregation_type": "sum"}]}]) \
        .to_pandas().sort_values("env", ignore_index=True)
    assert list(out.env) == ["nonprod", "prod"]
    assert list(out.value) == [3.0, 4.0]


def test_metrics_transform_regexp_rename_submatch_expansion(ray_session):
    # metrics_transform_processor_otlp.go:540-545: the WHOLE name becomes
    # ExpandString(new_name) with Go $-submatch templates; unmatched
    # prefix/suffix must NOT survive, and ${1}/$1 must expand.
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        metrics_transform)
    t = pa.table({
        "metric_name": ["system.cpu.usage", "system.mem.usage", "other"],
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    out = metrics_transform(rd.from_arrow(t), [{
        "include": r"^system\.(\w+)\.usage$", "match_type": "regexp",
        "action": "update", "new_name": "${1}_total",
    }]).to_pandas().sort_values("value", ignore_index=True)
    assert list(out.metric_name) == ["cpu_total", "mem_total", "other"]
    # named-group + $0 references and $$ literal
    out2 = metrics_transform(rd.from_arrow(t), [{
        "include": r"^system\.(?P<part>\w+)\.usage$", "match_type": "regexp",
        "action": "update", "new_name": "$part/$0$$",
    }]).to_pandas().sort_values("value", ignore_index=True)
    assert list(out2.metric_name) == [
        "cpu/system.cpu.usage$", "mem/system.mem.usage$", "other"]


def test_metrics_transform_value_actions_single_lookup(ray_session):
    # operation_update_label.go builds one valueActionsMapping: original
    # 'a' maps to 'b' and stops — NOT chained a->b->c.
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        metrics_transform)
    t = pa.table({
        "metric_name": ["m", "m", "m"],
        "env": ["a", "b", "x"],
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    out = metrics_transform(rd.from_arrow(t), [{
        "include": "m", "action": "update", "operations": [
            {"action": "update_label", "label": "env", "value_actions": [
                {"value": "a", "new_value": "b"},
                {"value": "b", "new_value": "c"},
            ]},
        ]}]).to_pandas().sort_values("value", ignore_index=True)
    assert list(out.env) == ["b", "c", "x"]


def test_metrics_transform_combine_submatch_labels(ray_session):
    # testcases 'combine' + 'combine_single_match'
    # (metrics_transform_processor_testcases_test.go:1218-1280): matched
    # metrics collapse into new_name; capture groups become labels named
    # by the group (or $i), values = case-folded submatches of the NAME.
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        metrics_transform)
    t = pa.table({
        "metric_name": ["Metric1", "metric2", "metric3"],
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    out = metrics_transform(rd.from_arrow(t), [{
        "include": "^([mM]etric)(?P<namedsubmatch>[12])$",
        "match_type": "regexp", "action": "combine", "new_name": "new",
        "submatch_case": "lower",
    }]).to_pandas().sort_values("value", ignore_index=True)
    assert list(out.metric_name) == ["new", "new", "metric3"]
    assert list(out["$1"].fillna("-")) == ["metric", "metric", "-"]
    assert list(out["namedsubmatch"].fillna("-")) == ["1", "2", "-"]
    # single match, upper
    out2 = metrics_transform(rd.from_arrow(t), [{
        "include": "^([mM]etric)(?P<namedsubmatch>[1])$",
        "match_type": "regexp", "action": "combine", "new_name": "new",
        "submatch_case": "upper",
    }]).to_pandas().sort_values("value", ignore_index=True)
    assert list(out2.metric_name) == ["new", "metric2", "metric3"]
    assert list(out2["$1"].fillna("-")) == ["METRIC", "-", "-"]


def test_metrics_transform_combine_aggregate_and_no_match(ray_session):
    # testcases 'combine_aggregate' (same label tuple -> one summed dp)
    # and 'combine_no_matches' (nothing changes).
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        metrics_transform)
    t = pa.table({
        "metric_name": ["metric1", "metric2", "metric3"],
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    out = metrics_transform(rd.from_arrow(t), [{
        "include": "^metric[12]$", "match_type": "regexp",
        "action": "combine", "new_name": "new", "aggregation_type": "sum",
    }]).to_pandas().sort_values("metric_name", ignore_index=True)
    assert list(out.metric_name) == ["metric3", "new"]
    assert list(out.value) == [3.0, 3.0]
    out2 = metrics_transform(rd.from_arrow(t), [{
        "include": "^Xmetric[12]$", "match_type": "regexp",
        "action": "combine", "new_name": "new",
    }]).to_pandas().sort_values("metric_name", ignore_index=True)
    assert list(out2.metric_name) == ["metric1", "metric2", "metric3"]


def test_metrics_transform_combine_with_operations(ray_session):
    # testcase 'combine_with_operations': combine, then add_label, then
    # aggregate_labels over {$1, new_label} sums away namedsubmatch.
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        metrics_transform)
    t = pa.table({
        "metric_name": ["metric1", "metric2", "metric3"],
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    out = metrics_transform(rd.from_arrow(t), [{
        "include": "^(metric)(?P<namedsubmatch>[12])$",
        "match_type": "regexp", "action": "combine", "new_name": "new",
        "operations": [
            {"action": "add_label", "new_label": "new_label",
             "new_value": "new_label_value"},
            {"action": "aggregate_labels", "aggregation_type": "sum",
             "label_set": ["$1", "new_label"]},
        ]}]).to_pandas().sort_values("metric_name", ignore_index=True)
    new = out[out.metric_name == "new"]
    assert len(new) == 1
    assert list(new["$1"]) == ["metric"]
    assert list(new["new_label"]) == ["new_label_value"]
    assert list(new["value"]) == [3.0]


def test_metrics_transform_group_resource_labels(ray_session):
    # metrics_transform_processor_group_test.go: matched metrics move to a
    # new resource group carrying group_resource_labels; flat analogue
    # stamps the labels on matched rows only.
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.metrics import (
        metrics_transform)
    t = pa.table({
        "metric_name": ["container.cpu", "k8s.pod.mem", "other"],
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    out = metrics_transform(rd.from_arrow(t), [
        {"include": "^container\\.(.*)$", "match_type": "regexp",
         "action": "group",
         "group_resource_labels": {"resource.type": "container"}},
        {"include": "^k8s\\.pod\\.(.*)$", "match_type": "regexp",
         "action": "group",
         "group_resource_labels": {"resource.type": "k8s.pod"}},
    ]).to_pandas().sort_values("value", ignore_index=True)
    assert list(out["resource.type"].fillna("-")) == \
        ["container", "k8s.pod", "-"]
