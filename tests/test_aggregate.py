"""count/sum connector + logdedup aggregation tests (SURVEY.md §2.7)."""

import datetime

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.expr import col
from opentelemetry_collector_contrib_ray.stages.aggregate import (
    canonical_identity,
    count_by,
    dedup_counts,
    sum_by,
)


def _ds():
    t = pa.table({
        "k": ["a", "a", "b", None, "b", "a"],
        "v": [1, 2, 3, 4, 5, None],
        "ts": pa.array([datetime.datetime(2026, 1, 1, 0, 0, i)
                        for i in range(6)], pa.timestamp("us")),
    })
    return ray.data.from_arrow(t).repartition(3)


def test_count_by_with_default_value():
    # countconnector default_value for missing attrs (counter.go:42-73)
    out = count_by(_ds(), ["k"], count_col="n", default_value="unknown")
    got = {r["k"]: r["n"] for r in out.take_all()}
    assert got == {"a": 3, "b": 2, "unknown": 1}


def test_count_by_condition():
    out = count_by(_ds(), ["k"], condition=col("v") >= 3, count_col="n",
                   default_value="?")
    got = {r["k"]: r["n"] for r in out.take_all()}
    assert got == {"b": 2, "?": 1}


def test_sum_by():
    out = sum_by(_ds(), ["k"], "v", sum_col="total", default_value="?")
    got = {r["k"]: r["total"] for r in out.take_all()}
    assert got == {"a": 3, "b": 8, "?": 4}


def test_dedup_counts_first_last():
    out = dedup_counts(_ds(), ["k"], ts_col="ts")
    rows = {r["k"]: r for r in out.take_all()}
    assert rows["a"]["log_count"] == 3
    assert rows["a"]["first_observed_ts"].second == 0
    assert rows["a"]["last_observed_ts"].second == 5
    assert rows["b"]["log_count"] == 2


def test_count_by_missing_skip(ray_session):
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.aggregate import count_by

    t = pa.table({"k": ["a", None, "a"], "v": [1, 2, 3]})
    skip = count_by(ray.data.from_arrow(t), ["k"],
                    missing="skip").to_pandas()
    assert dict(zip(skip.k, skip["count"])) == {"a": 2}
    dflt = count_by(ray.data.from_arrow(t), ["k"],
                    default_value="<none>").to_pandas()
    assert dict(zip(dflt.k, dflt["count"])) == {"a": 2, "<none>": 1}


def test_count_by_int_key_with_nulls(ray_session):
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.aggregate import count_by

    t = pa.table({"status": pa.array([200, None, 500], pa.int32())})
    out = count_by(ray.data.from_arrow(t), ["status"],
                   default_value="<none>").to_pandas()
    got = dict(zip(out.status.astype(str), out["count"]))
    assert got["200"] == 1 and got["500"] == 1 and got["<none>"] == 1


def test_count_by_int_key_nulls_in_some_blocks_only(ray_session):
    """The cast decision must come from the TYPE, not per-block null
    presence: an int key with nulls in only one of two blocks previously
    produced int32 partials in clean blocks and string partials in nully
    ones, crashing the merge with an Arrow schema conflict."""
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.aggregate import count_by

    clean = pa.table({"status": pa.array([200, 200, 500], pa.int32())})
    nully = pa.table({"status": pa.array([200, None], pa.int32())})
    ds = ray.data.from_arrow(clean).union(ray.data.from_arrow(nully))
    out = count_by(ds, ["status"], default_value="<none>").to_pandas()
    got = dict(zip(out.status.astype(str), out["count"]))
    assert got == {"200": 3, "500": 1, "<none>": 1}


def test_count_by_typed_default_keeps_int_schema(ray_session):
    """A default value the key type can hold ('0' into int) fills typed and
    keeps the int column type instead of widening to string."""
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.aggregate import count_by

    t = pa.table({"status": pa.array([200, None, 200], pa.int32())})
    out = count_by(ray.data.from_arrow(t), ["status"],
                   default_value="0").to_pandas()
    got = dict(zip(out.status, out["count"]))
    assert got == {200: 2, 0: 1}


def test_canonical_identity_separator_injection(ray_session):
    """Length-prefixed encoding: values containing the old separator (or
    the null marker) must NOT merge distinct identities (review finding:
    ('a\\x1fb','c') and ('a','b\\x1fc') collided)."""
    t = pa.table({"x": ["a\x1fb", "a"], "y": ["c", "b\x1fc"]})
    ids = canonical_identity(t, ["x", "y"]).to_pylist()
    assert ids[0] != ids[1]
    t2 = pa.table({"x": [None, "\x00\x00null"], "y": ["c", "c"]})
    ids2 = canonical_identity(t2, ["x", "y"]).to_pylist()
    assert ids2[0] != ids2[1]
