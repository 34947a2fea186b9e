"""Routing (routingconnector first-match move semantics) and expression-mask
tests (SURVEY.md §2.8, FIXTURES.md F3)."""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.expr import col
from opentelemetry_collector_contrib_ray.stages.route import Route, RouteTable


def _batch():
    return pa.table({
        "severity_number": pa.array([20, 3, 1, 17, 5], pa.int32()),
        "tool": ["bash", "bash", "search", "bash", None],
        "role": ["assistant", "assistant", "user", "user", "user"],
    })


def test_first_match_wins_and_default():
    rt = RouteTable([
        Route("errors", col("severity_number") >= 17),
        Route("tool-calls", (col("tool") == "bash") & (col("role") == "assistant")),
        Route("user-turns", col("role") == "user"),
    ], default="default")
    out = rt(_batch())
    # row0 matches errors AND tool-calls -> errors (first match wins)
    assert out["sink"].to_pylist() == [
        "errors", "tool-calls", "user-turns", "errors", "user-turns"]


def test_null_condition_is_false_not_null():
    # routingconnector error_mode=ignore: a failing condition sends the row
    # to default rather than erroring (logs.go:95-104)
    rt = RouteTable([Route("t", col("tool") == "bash")])
    out = rt(pa.table({"tool": pa.array([None, "bash"], pa.string())}))
    assert out["sink"].to_pylist() == ["default", "t"]


def test_route_disjoint_and_complete():
    rt = RouteTable([
        Route("a", col("severity_number") >= 10),
        Route("b", col("severity_number") >= 0),
    ])
    out = rt(_batch())
    sinks = out["sink"].to_pylist()
    assert all(s in ("a", "b") for s in sinks)  # complete, b catches rest
    assert sinks.count("a") == 2


def test_empty_batch():
    rt = RouteTable([Route("a", col("x") == 1)])
    out = rt(pa.table({"x": pa.array([], pa.int64())}))
    assert out.num_rows == 0 and "sink" in out.column_names


def test_expr_kernels():
    b = pa.table({"s": ["foo", "bar", None], "n": [1, 2, 3]})
    assert col("s").match_re("^f").mask(b).to_pylist() == [True, False, False]
    assert col("s").contains("a").mask(b).to_pylist() == [False, True, False]
    assert (col("s").is_null()).mask(b).to_pylist() == [False, False, True]
    assert ((col("n") > 1) & col("s").starts_with("b")).mask(b).to_pylist() == \
        [False, True, False]
    assert col("n").isin([1, 3]).mask(b).to_pylist() == [True, False, True]
    assert (~(col("n") == 2)).mask(b).to_pylist() == [True, False, True]


def test_route_attached_attributes():
    """stanza router per-route attributes (transformer/router Attributer):
    matched rows get the route's constant attrs; first-match wins."""
    from opentelemetry_collector_contrib_ray.expr import col
    from opentelemetry_collector_contrib_ray.stages.route import (
        Route,
        RouteTable,
    )

    t = pa.table({"sev": pa.array([20, 3, 18], pa.int32())})
    rt = RouteTable([
        Route("errors", col("sev") >= 17, attributes={"team": "oncall"}),
        Route("low", col("sev") < 5, attributes={"team": "archive",
                                                 "tier": "cold"}),
    ])
    out = rt(t)
    assert out["sink"].to_pylist() == ["errors", "low", "errors"]
    assert out["team"].to_pylist() == ["oncall", "archive", "oncall"]
    assert out["tier"].to_pylist() == [None, "cold", None]


def test_expr_null_comparison_rules():
    """OTTL LANGUAGE.md: null != x is TRUE; null == null via is-null; ~
    inverts the truth value (null condition counts as False)."""
    from opentelemetry_collector_contrib_ray.expr import col

    t = pa.table({"x": ["a", None, "b"]})
    assert (col("x") != "a").mask(t).to_pylist() == [False, True, True]
    assert (col("x") == "a").mask(t).to_pylist() == [True, False, False]
    assert (col("x") == None).mask(t).to_pylist() == [False, True, False]  # noqa: E711
    assert (col("x") != None).mask(t).to_pylist() == [True, False, True]  # noqa: E711
    assert (~(col("x") == "a")).mask(t).to_pylist() == [False, True, True]


def test_expr_null_comparison_col_vs_col():
    """LANGUAGE.md nil-vs-nil: equal ONLY for ==. A both-null row yields
    == True and != False; exactly-one-null yields == False, != True."""
    from opentelemetry_collector_contrib_ray.expr import col

    t = pa.table({"a": ["x", None, None, "y"],
                  "b": ["x", None, "z", None]})
    assert (col("a") == col("b")).mask(t).to_pylist() == [
        True, True, False, False]
    assert (col("a") != col("b")).mask(t).to_pylist() == [
        False, False, True, True]


def test_range_lookup_rejects_bad_ips_and_negative_keys(ray_session):
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.enrich import (
        RangeLookupEnricher,
    )

    ranges = [(0, 100, "low"), (101, 1000, "high")]
    t = pa.table({"k": pa.array([5, -1, 500], pa.int64())})
    out = ray.data.from_arrow(t).map_batches(
        RangeLookupEnricher, fn_constructor_args=(ranges, "k", "zone",
                                                  False, "unknown"),
        batch_format="pyarrow", concurrency=1).to_pandas()
    assert list(out.zone) == ["low", "unknown", "high"]

    ips = pa.table({"ip": ["1.2.3.300", "0.0.0.50"]})
    ip_ranges = [(0, 1 << 32, "any")]
    out2 = ray.data.from_arrow(ips).map_batches(
        RangeLookupEnricher, fn_constructor_args=(ip_ranges, "ip", "zone",
                                                  True, "invalid"),
        batch_format="pyarrow", concurrency=1).to_pandas()
    assert list(out2.zone) == ["invalid", "any"]
