"""Metric-structural OTTL editors: replays of the reference's
processor/transformprocessor/internal/metrics/processor_test.go cases
over the flat datapoint envelope (constructMetrics fixture,
processor_test.go:1959-2086), plus error-path and batch-model cases."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from opentelemetry_collector_contrib_ray.pipelines.statements import (
    transform_processor,
)

ST = 1_557_441_000  # StartTimestamp
TS = 1_581_452_772  # TestTimeStamp


def metrics_fixture() -> pa.Table:
    """Flat-model constructMetrics(): operationA Sum(double x2),
    operationB Histogram delta (dp0 count=1 sum=5, dp1 count=3 no sum),
    operationC ExponentialHistogram, operationD Summary (count=1234
    sum=12.34, quantiles .99->123 / .95->321), operationE Sum."""
    attrsA = [("attr1", "test1"), ("attr2", "test2"), ("attr3", "test3"),
              ("flags", "A|B|C"), ("total.string", "123456789")]
    attrsB = [("attr1", "test1"), ("attr2", "test2"), ("attr3", "test3"),
              ("flags", "C|D"), ("total.string", "345678")]
    attrsC = [("attr1", "test1"), ("attr2", "test2"), ("attr3", "test3")]
    mt = pa.map_(pa.string(), pa.string())
    names = (["operationA"] * 2 + ["operationB"] * 2 + ["operationC"] * 2 +
             ["operationD"] + ["operationE"] * 2)
    return pa.table({
        "metric_name": pa.array(names),
        "metric_description": pa.array([n + " description" for n in names]),
        "metric_unit": pa.array([n + " unit" for n in names]),
        "metric_type": pa.array(
            ["Sum", "Sum", "Histogram", "Histogram", "ExponentialHistogram",
             "ExponentialHistogram", "Summary", "Sum", "Sum"]),
        "metric_temporality": pa.array(
            [None, None, "delta", "delta", None, None, None, None, None]),
        "metric_is_monotonic": pa.array(
            [False, False, None, None, None, None, None, False, False]),
        "value": pa.array([1.0, 3.7, None, None, None, None, None,
                           1.0, 3.7]),
        "sum": pa.array([None, None, 5.0, None, None, None, 12.34,
                         None, None]),
        "count": pa.array([None, None, 1, 3, 1, 0, 1234, None, None],
                          pa.int64()),
        "explicit_bounds": pa.array(
            [None, None, [1.0, 10.0], [1.0, 10.0]] + [None] * 5,
            pa.list_(pa.float64())),
        "bucket_counts": pa.array(
            [None, None, [1, 0, 0], [2, 1, 0]] + [None] * 5,
            pa.list_(pa.int64())),
        "quantile_qs": pa.array([None] * 6 + [[0.99, 0.95]] + [None] * 2,
                                pa.list_(pa.float64())),
        "quantile_vals": pa.array([None] * 6 + [[123.0, 321.0]] +
                                  [None] * 2, pa.list_(pa.float64())),
        "scale": pa.array([None, None, None, None, 1, 0, None, None, None],
                          pa.int64()),
        "zero_count": pa.array(
            [None, None, None, None, 1, 0, None, None, None], pa.int64()),
        "positive_offset": pa.array(
            [None, None, None, None, 1, 0, None, None, None], pa.int64()),
        "negative_offset": pa.array(
            [None, None, None, None, 1, 0, None, None, None], pa.int64()),
        "ts": pa.array([None] * 6 + [TS] + [None] * 2, pa.int64()),
        "start_ts": pa.array([ST] * 9, pa.int64()),
        "attributes": pa.array(
            [attrsA, attrsA, attrsB, attrsB, attrsC, attrsC, attrsC,
             [("attr1", "test1")], [("attr1", "test2")]], mt),
    })


def _run(stmts, ctx="metric", table=None, mode="propagate"):
    fn = transform_processor([{"context": ctx, "statements": stmts,
                               "error_mode": mode}])
    return fn(table if table is not None else metrics_fixture())


def _named(out, name):
    return out.filter(pc.equal(out["metric_name"], name))


# --- extract_* (processor_test.go:199,250,374,425) -----------------------

@pytest.mark.parametrize("ctx,gate", [("metric", 'name'),
                                      ("datapoint", 'metric.name')])
def test_extract_sum_metric(ctx, gate):
    out = _run([f'extract_sum_metric(true) where {gate} == "operationB"'],
               ctx=ctx)
    t = _named(out, "operationB_sum")
    # only dp0 has a sum (HasSum gate, func_extract_sum_metric.go:63-68)
    assert t.num_rows == 1
    assert t["value"].to_pylist() == [5.0]
    assert t["metric_type"].to_pylist() == ["Sum"]
    assert t["metric_temporality"].to_pylist() == ["delta"]
    assert t["metric_is_monotonic"].to_pylist() == [True]
    assert t["metric_unit"].to_pylist() == ["operationB unit"]
    assert t["metric_description"].to_pylist() == ["operationB description"]
    # shape columns nulled on the new number point
    assert t["count"].to_pylist() == [None]
    assert t["bucket_counts"].to_pylist() == [None]
    # source histogram untouched
    assert _named(out, "operationB").num_rows == 2


def test_extract_count_metric():
    out = _run(['extract_count_metric(true) where name == "operationB"'])
    t = _named(out, "operationB_count")
    assert t["value"].to_pylist() == [1.0, 3.0]
    assert t["metric_temporality"].to_pylist() == ["delta", "delta"]


def test_extract_then_rename_chain():
    """processor_test.go:224-225: the appended metric is visible to the
    next statement."""
    out = _run(['extract_sum_metric(true) where name == "operationB"',
                'set(name, "new_name") where name == "operationB_sum"'])
    assert _named(out, "new_name").num_rows == 1
    assert _named(out, "operationB_sum").num_rows == 0


def test_extract_sum_on_summary_is_cumulative():
    out = _run(['extract_sum_metric(false) where name == "operationD"'])
    t = _named(out, "operationD_sum")
    assert t["value"].to_pylist() == [12.34]
    assert t["metric_temporality"].to_pylist() == ["cumulative"]


def test_extract_on_number_metric_errors():
    with pytest.raises(Exception, match="Histogram, ExponentialHistogram"):
        _run(['extract_sum_metric(true) where name == "operationA"'])


# --- copy_metric / scale_metric (processor_test.go:279,288,296) ----------

def test_copy_metric_with_overrides():
    out = _run(['copy_metric(name="http.request.status_code", unit="s") '
                'where name == "operationA"'])
    t = _named(out, "http.request.status_code")
    assert t["value"].to_pylist() == [1.0, 3.7]
    assert t["metric_unit"].to_pylist() == ["s", "s"]
    assert t["metric_description"].to_pylist() == \
        ["operationA description"] * 2
    assert _named(out, "operationA").num_rows == 2


def test_scale_metric_with_unit():
    out = _run(['scale_metric(10.0,"s") where name == "operationA"'])
    t = _named(out, "operationA")
    assert t["value"].to_pylist() == [10.0, 37.0]
    assert t["metric_unit"].to_pylist() == ["s", "s"]
    # other metrics untouched
    assert _named(out, "operationE")["value"].to_pylist() == [1.0, 3.7]


def test_scale_metric_no_unit():
    out = _run(['scale_metric(10.0) where name == "operationA"'])
    t = _named(out, "operationA")
    assert t["value"].to_pylist() == [10.0, 37.0]
    assert t["metric_unit"].to_pylist() == ["operationA unit"] * 2


def test_scale_metric_histogram_scales_sum_and_bounds():
    out = _run(['scale_metric(2.0) where name == "operationB"'])
    t = _named(out, "operationB")
    assert t["sum"].to_pylist() == [10.0, None]
    assert t["explicit_bounds"].to_pylist() == [[2.0, 20.0], [2.0, 20.0]]
    # counts are NOT scaled
    assert t["count"].to_pylist() == [1, 3]


def test_scale_metric_summary_scales_quantiles():
    out = _run(['scale_metric(2.0) where name == "operationD"'])
    t = _named(out, "operationD")
    assert t["sum"].to_pylist() == [24.68]
    assert t["quantile_vals"].to_pylist() == [[246.0, 642.0]]
    assert t["quantile_qs"].to_pylist() == [[0.99, 0.95]]


def test_scale_metric_exponential_histogram_errors():
    with pytest.raises(Exception, match="exponential histograms are not "
                                        "supported"):
        _run(['scale_metric(10.0) where name == "operationC"'])


# --- aggregate_on_attributes (processor_test.go:303,318,336) -------------

def test_aggregate_on_attributes_sum_with_keep_list():
    out = _run(['aggregate_on_attributes("sum", ["attr1", "attr2"]) '
                'where name == "operationA"'])
    t = _named(out, "operationA")
    assert t.num_rows == 1
    assert t["value"].to_pylist() == [pytest.approx(4.7)]
    assert dict(t["attributes"].to_pylist()[0]) == \
        {"attr1": "test1", "attr2": "test2"}
    # ungated metrics keep all their dps
    assert _named(out, "operationE").num_rows == 2


def test_aggregate_on_attributes_min_no_filter():
    out = _run(['aggregate_on_attributes("min") where name == "operationA"'])
    t = _named(out, "operationA")
    assert t.num_rows == 1
    assert t["value"].to_pylist() == [1.0]


@pytest.mark.parametrize("fn,expected", [
    ("max", 3.7), ("mean", 2.35), ("median", 2.35), ("count", 2.0)])
def test_aggregate_on_attributes_other_fns(fn, expected):
    out = _run([f'aggregate_on_attributes("{fn}", ["attr1"]) '
                'where name == "operationA"'])
    assert _named(out, "operationA")["value"].to_pylist() == \
        [pytest.approx(expected)]


def test_aggregate_on_attributes_histogram_merges_buckets():
    out = _run(['aggregate_on_attributes("sum", ["attr1"]) '
                'where name == "operationB"'])
    t = _named(out, "operationB")
    assert t.num_rows == 1
    assert t["count"].to_pylist() == [4]
    # dp1 has no sum -> Go adds 0-valued Sum() regardless; flat model
    # sums valid values only: 5.0 + (3-count dp's null treated absent)
    assert t["sum"].to_pylist() == [5.0]
    assert t["bucket_counts"].to_pylist() == [[3, 1, 0]]
    assert t["explicit_bounds"].to_pylist() == [[1.0, 10.0]]


def test_aggregate_on_attributes_summary_errors():
    with pytest.raises(Exception, match="does not support aggregating "
                                        "Summary"):
        _run(['aggregate_on_attributes("sum") where name == "operationD"'])


def test_aggregate_on_attributes_bad_fn_errors():
    with pytest.raises(Exception, match="invalid aggregation function"):
        _run(['aggregate_on_attributes("p95") where name == "operationA"'])


def test_aggregate_on_attribute_value():
    out = _run(['aggregate_on_attribute_value("sum", "attr1", '
                '["test1", "test2"], "test") where name == "operationE"'])
    t = _named(out, "operationE")
    assert t.num_rows == 1
    assert t["value"].to_pylist() == [pytest.approx(4.7)]
    assert dict(t["attributes"].to_pylist()[0]) == {"attr1": "test"}


# --- convert_* (processor_test.go:746,768) --------------------------------

def test_convert_summary_count_val_to_sum():
    out = _run(['convert_summary_count_val_to_sum("delta", true) '
                'where metric.name == "operationD"'], ctx="datapoint")
    t = _named(out, "operationD_count")
    assert t["value"].to_pylist() == [1234.0]
    assert t["metric_type"].to_pylist() == ["Sum"]
    assert t["metric_temporality"].to_pylist() == ["delta"]
    assert t["metric_is_monotonic"].to_pylist() == [True]
    assert t["ts"].to_pylist() == [TS]
    assert t["start_ts"].to_pylist() == [ST]


def test_convert_summary_sum_val_to_sum():
    out = _run(['convert_summary_sum_val_to_sum("delta", true) '
                'where metric.name == "operationD"'], ctx="datapoint")
    assert _named(out, "operationD_sum")["value"].to_pylist() == [12.34]


def test_convert_summary_bad_temporality_errors():
    with pytest.raises(Exception, match="unknown aggregation temporality"):
        _run(['convert_summary_sum_val_to_sum("bogus", true)'],
             ctx="datapoint")


def test_convert_gauge_to_sum_and_back():
    t = pa.table({"metric_name": pa.array(["g"]),
                  "metric_type": pa.array(["Gauge"]),
                  "value": pa.array([2.0])})
    out = _run(['convert_gauge_to_sum("cumulative", true)'], table=t)
    assert out["metric_type"].to_pylist() == ["Sum"]
    assert out["metric_temporality"].to_pylist() == ["cumulative"]
    assert out["metric_is_monotonic"].to_pylist() == [True]
    out2 = _run(['convert_sum_to_gauge()'], table=out)
    assert out2["metric_type"].to_pylist() == ["Gauge"]
    assert out2["metric_temporality"].to_pylist() == [None]
    assert out2["metric_is_monotonic"].to_pylist() == [None]


# --- exponential-histogram datapoint paths (processor_test.go:649-667,
#     1092-1110) -------------------------------------------------------------

@pytest.mark.parametrize("path", ["scale", "zero_count", "positive.offset",
                                  "negative.offset"])
def test_datapoint_exp_histogram_paths(path):
    out = _run([f'set(attributes["test"], "pass") where {path} == 1'],
               ctx="datapoint")
    got = [dict(m).get("test") for m in out["attributes"].to_pylist()]
    # only operationC dp0 has the field == 1 (rows are fixture order)
    assert got == [None, None, None, None, "pass", None, None, None, None]


# --- enum paths (processor_test.go:619,*_aggregation_temporality) ----------

def test_metric_type_enum_comparison():
    out = _run(['set(metric.description, "Sum") '
                'where metric.type == METRIC_DATA_TYPE_SUM'],
               ctx="datapoint")
    desc = out["metric_description"].to_pylist()
    names = out["metric_name"].to_pylist()
    assert all(d == "Sum" for d, n in zip(desc, names)
               if n in ("operationA", "operationE"))
    assert all(d != "Sum" for d, n in zip(desc, names)
               if n not in ("operationA", "operationE"))


def test_aggregation_temporality_enum_read_write():
    out = _run(['set(metric.aggregation_temporality, '
                'AGGREGATION_TEMPORALITY_DELTA) '
                'where metric.aggregation_temporality == 0'],
               ctx="datapoint")
    # unspecified rows became delta; operationB already delta stays
    assert set(out["metric_temporality"].to_pylist()) == {"delta"}


# --- batch-model / integration ---------------------------------------------

def test_metric_editor_rejected_outside_metric_contexts():
    t = pa.table({"body": pa.array(["x"]), "value": pa.array([1.0])})
    with pytest.raises(Exception, match="datapoint/metric context"):
        transform_processor([{"context": "log",
                              "statements": ['scale_metric(2.0)']}])(t)


def test_copy_metric_int_values_scale_truncates():
    """func_scale.go scaleMetric int arm: int64(float64(v) * mult)."""
    t = pa.table({"metric_name": pa.array(["m"] * 2),
                  "metric_type": pa.array(["Sum"] * 2),
                  "value": pa.array([3, 7], pa.int64())})
    out = _run(['scale_metric(0.5)'], table=t)
    assert out["value"].to_pylist() == [1, 3]


def test_ignore_mode_skips_failing_structural_statement():
    out = _run(['scale_metric(10.0) where name == "operationC"',
                'set(unit, "after")'], mode="ignore")
    # statement 1 fails (exp hist) and is skipped wholesale; statement 2
    # still runs on every row
    assert set(out["metric_unit"].to_pylist()) == {"after"}
    assert out.num_rows == 9


def test_appended_rows_are_gated_by_group_conditions():
    fn = transform_processor([{
        "context": "metric",
        "conditions": ['IsMatch(name, "operation.*")'],
        "statements": [
            'copy_metric(name="operationX") where name == "operationE"',
            'set(unit, "seen") where name == "operationX"',
        ]}])
    out = fn(metrics_fixture())
    t = _named(out, "operationX")
    assert t.num_rows == 2
    assert t["metric_unit"].to_pylist() == ["seen", "seen"]


def test_aggregate_preserves_min_start_ts():
    t = pa.table({"metric_name": pa.array(["m"] * 3),
                  "metric_type": pa.array(["Sum"] * 3),
                  "metric_temporality": pa.array(["cumulative"] * 3),
                  "value": pa.array([1.0, 2.0, 4.0]),
                  "start_ts": pa.array([30, 10, 20], pa.int64()),
                  "ts": pa.array([100, 100, 100], pa.int64())})
    out = _run(['aggregate_on_attributes("sum")'], table=t)
    assert out.num_rows == 1
    assert out["value"].to_pylist() == [7.0]
    assert out["start_ts"].to_pylist() == [10]


def test_aggregate_delta_groups_by_start_ts():
    t = pa.table({"metric_name": pa.array(["m"] * 3),
                  "metric_type": pa.array(["Sum"] * 3),
                  "metric_temporality": pa.array(["delta"] * 3),
                  "value": pa.array([1.0, 2.0, 4.0]),
                  "start_ts": pa.array([10, 10, 20], pa.int64()),
                  "ts": pa.array([100, 100, 100], pa.int64())})
    out = _run(['aggregate_on_attributes("sum")'], table=t)
    assert sorted(out["value"].to_pylist()) == [3.0, 4.0]


def test_aggregate_groups_by_timestamp():
    t = pa.table({"metric_name": pa.array(["m"] * 4),
                  "metric_type": pa.array(["Gauge"] * 4),
                  "value": pa.array([1.0, 2.0, 4.0, 8.0]),
                  "ts": pa.array([100, 100, 200, 200], pa.int64())})
    out = _run(['aggregate_on_attributes("max")'], table=t)
    assert sorted(out["value"].to_pylist()) == [2.0, 8.0]


def test_aggregate_int_mean_is_integer_division():
    t = pa.table({"metric_name": pa.array(["m"] * 2),
                  "metric_type": pa.array(["Sum"] * 2),
                  "value": pa.array([3, 4], pa.int64())})
    out = _run(['aggregate_on_attributes("mean")'], table=t)
    assert out["value"].to_pylist() == [3]


def test_aggregate_median_even_and_odd():
    t = pa.table({"metric_name": pa.array(["m"] * 4),
                  "metric_type": pa.array(["Gauge"] * 4),
                  "value": pa.array([1.0, 9.0, 3.0, 7.0])})
    out = _run(['aggregate_on_attributes("median")'], table=t)
    assert out["value"].to_pylist() == [5.0]  # (3+7)/2
    t3 = t.slice(0, 3)
    out = _run(['aggregate_on_attributes("median")'], table=t3)
    assert out["value"].to_pylist() == [3.0]


def test_structural_editors_preserve_row_identity_of_others():
    """A structural append must not disturb non-metric columns of
    pre-existing rows (zero-copy concat, no reorder)."""
    fx = metrics_fixture()
    out = _run(['copy_metric(name="c") where name == "operationA"'])
    assert out.slice(0, 9).select(["metric_name", "value"]).equals(
        fx.select(["metric_name", "value"]))
    assert np.sum(np.asarray(out["metric_name"].to_pylist()) == "c") == 2


# --- convert_exponential_histogram_to_histogram ----------------------------
# (func_convert_exponential_hist_to_explicit_hist_test.go replays)

def _exp_hist_table(scale, offset, buckets, zero_count=0, count=2,
                    summ=361.0):
    return pa.table({
        "metric_name": pa.array(["response_time"]),
        "metric_type": pa.array(["ExponentialHistogram"]),
        "metric_temporality": pa.array(["delta"]),
        "value": pa.array([None], pa.float64()),
        "sum": pa.array([summ]),
        "count": pa.array([count], pa.int64()),
        "scale": pa.array([scale], pa.int64()),
        "zero_count": pa.array([zero_count], pa.int64()),
        "positive_offset": pa.array([offset], pa.int64()),
        "positive_bucket_counts": pa.array([buckets], pa.list_(pa.int64())),
        "explicit_bounds": pa.array([None], pa.list_(pa.float64())),
        "bucket_counts": pa.array([None], pa.list_(pa.int64())),
    })


SPARSE7 = [1] + [0] * 28 + [1]  # scale=7, offset=944 default fixture


@pytest.mark.parametrize("bounds,expected", [
    ([1.0, 2.0, 3.0, 4.0, 5.0], [0, 0, 0, 0, 2]),          # all overflow
    ([1000.0, 2000.0, 3000.0, 4000.0, 5000.0], [2, 0, 0, 0, 0]),
    ([160.0, 170.0, 180.0, 190.0, 200.0], [1, 0, 0, 1, 0]),
])
def test_convert_exp_hist_upper(bounds, expected):
    t = _exp_hist_table(7, 944, SPARSE7)
    out = _run([f'convert_exponential_histogram_to_histogram("upper", '
                f'{bounds})'], table=t)
    assert out["metric_type"].to_pylist() == ["Histogram"]
    assert out["bucket_counts"].to_pylist() == [expected]
    assert out["explicit_bounds"].to_pylist() == [bounds]
    assert out["count"].to_pylist() == [2]
    assert out["sum"].to_pylist() == [361.0]
    assert out["metric_temporality"].to_pylist() == ["delta"]
    # exponential-only fields cleared on the converted row
    assert out["scale"].to_pylist() == [None]
    assert out["positive_bucket_counts"].to_pylist() == [None]


def test_convert_exp_hist_midpoint():
    t = _exp_hist_table(0, 5, [10, 22, 12], count=44, summ=999.0)
    bounds = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 100.0]
    out = _run([f'convert_exponential_histogram_to_histogram("midpoint", '
                f'{bounds})'], table=t)
    assert out["bucket_counts"].to_pylist() == \
        [[0, 0, 0, 10, 0, 0, 0, 0, 22, 12]]


def test_convert_exp_hist_midpoint_zero_count():
    t = _exp_hist_table(0, 5, [10, 22, 12], zero_count=5, count=49,
                        summ=999.0)
    bounds = [0.0, 10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0,
              100.0]
    out = _run([f'convert_exponential_histogram_to_histogram("midpoint", '
                f'{bounds})'], table=t)
    assert out["bucket_counts"].to_pylist() == \
        [[5, 0, 0, 0, 10, 0, 0, 0, 0, 22, 12]]


def test_convert_exp_hist_uniform():
    t = _exp_hist_table(0, 5, [10, 22, 12], count=44, summ=999.0)
    bounds = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 100.0]
    out = _run([f'convert_exponential_histogram_to_histogram("uniform", '
                f'{bounds})'], table=t)
    assert out["bucket_counts"].to_pylist() == \
        [[0, 0, 0, 3, 3, 2, 8, 6, 5, 17]]


def test_convert_exp_hist_non_exponential_untouched():
    out = _run(['convert_exponential_histogram_to_histogram("upper", '
                '[1.0, 2.0]) where name == "operationA"'])
    t = _named(out, "operationA")
    assert t["metric_type"].to_pylist() == ["Sum", "Sum"]


def test_convert_exp_hist_bad_fn_and_empty_bounds():
    t = _exp_hist_table(0, 5, [1])
    with pytest.raises(Exception, match="invalid conversion function"):
        _run(['convert_exponential_histogram_to_histogram("bogus", '
              '[1.0])'], table=t)
    with pytest.raises(Exception, match="explicit bounds cannot be empty"):
        _run(['convert_exponential_histogram_to_histogram("upper", [])'],
             table=t)


# --- filterottl datapoint-attr converters -----------------------------------

def test_has_attr_on_datapoint():
    out = _run(['set(attributes["hit"], "y") '
                'where HasAttrOnDatapoint("attr1", "test1")'],
               ctx="datapoint")
    got = [dict(m).get("hit") for m in out["attributes"].to_pylist()]
    # every dp except operationE dp1 (attr1=test2) carries attr1=test1
    assert got == ["y"] * 7 + [None, "y"][::-1]


def test_has_attr_key_on_datapoint():
    out = _run(['set(attributes["hit"], "y") '
                'where HasAttrKeyOnDatapoint("flags")'], ctx="datapoint")
    got = [dict(m).get("hit") for m in out["attributes"].to_pylist()]
    assert got == ["y"] * 4 + [None] * 5


# --- transform_metrics dataset helper ---------------------------------------

def test_transform_metrics_colocates_for_aggregation(ray_session):
    """aggregate_on_attributes spanning blocks: transform_metrics must
    produce ONE merged dp per metric even when the metric's datapoints
    start in different input blocks."""
    import ray
    from opentelemetry_collector_contrib_ray.pipelines.statements import (
        transform_metrics,
    )
    rows = pa.table({
        "metric_name": pa.array(["m1", "m2"] * 10),
        "metric_type": pa.array(["Sum"] * 20),
        "value": pa.array([float(i) for i in range(20)]),
    })
    ds = ray.data.from_arrow(rows).repartition(5)
    out = transform_metrics(ds, [{
        "context": "metric",
        "statements": ['aggregate_on_attributes("sum")'],
    }], n_parts=4)
    got = out.to_pandas().set_index("metric_name")["value"].to_dict()
    assert got == {"m1": float(sum(range(0, 20, 2))),
                   "m2": float(sum(range(1, 20, 2)))}


def test_transform_metrics_rowlocal_needs_no_shuffle(ray_session):
    import ray
    from opentelemetry_collector_contrib_ray.pipelines.statements import (
        transform_metrics,
    )
    rows = pa.table({
        "metric_name": pa.array(["m1", "m2"]),
        "metric_type": pa.array(["Sum", "Sum"]),
        "value": pa.array([1.0, 2.0]),
    })
    out = transform_metrics(ray.data.from_arrow(rows), [{
        "context": "metric",
        "statements": ['scale_metric(3.0) where name == "m1"'],
    }])
    got = out.to_pandas().set_index("metric_name")["value"].to_dict()
    assert got == {"m1": 3.0, "m2": 2.0}


def test_ignore_mode_isolates_aggregate_per_metric():
    """error_mode=ignore + a data-dependent aggregate failure: the
    Summary metric skips the statement (reference per-metric isolation),
    every other metric still aggregates — and no cross-metric slice
    merge happens (the bisect path would be wrong here)."""
    out = _run(['aggregate_on_attributes("sum", [])'], mode="ignore")
    # operationD (Summary) survives un-aggregated
    assert _named(out, "operationD").num_rows == 1
    # operationA's two dps merged (attrs cleared by the empty keep list)
    a = _named(out, "operationA")
    assert a.num_rows == 1
    assert a["value"].to_pylist() == [pytest.approx(4.7)]
    # operationE merged too
    assert _named(out, "operationE")["value"].to_pylist() == \
        [pytest.approx(4.7)]


def test_metric_is_monotonic_path():
    out = _run(['set(description, "mono") where is_monotonic == false'])
    desc = out["metric_description"].to_pylist()
    names = out["metric_name"].to_pylist()
    assert all(d == "mono" for d, n in zip(desc, names)
               if n in ("operationA", "operationE"))
    assert all(d != "mono" for d, n in zip(desc, names)
               if n in ("operationB", "operationC", "operationD"))
