"""Skew handling tests: hot-key detection + salted map_groups (SURVEY.md §4;
the generator plants 3 hot conversations on purpose)."""

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.sources.transcripts import (
    ensure_transcripts,
)
from opentelemetry_collector_contrib_ray.state.skew import (
    add_salt,
    detect_hot_keys,
    salted_map_groups,
)


def _ds():
    return ray.data.read_parquet(ensure_transcripts("/root/testdata/sf0.001"))


def test_detect_hot_keys_finds_planted_conversations():
    hot = detect_hot_keys(_ds(), "conv_id", threshold_fraction=0.01)
    # generator forces conv 0..2 hot at ~2% of all turns each
    assert {"conv-00000000", "conv-00000001", "conv-00000002"} <= set(hot)
    # small sf: the geometric-length tail crosses 1% too; still a short list
    assert len(hot) < 50


def test_add_salt_splits_only_hot_keys():
    ds = _ds()
    hot = {"conv-00000000": 120}
    out = add_salt(ds, "conv_id", hot, rows_per_salt=40,
                   order_col="turn_idx").to_pandas()
    hot_salts = out[out.conv_id == "conv-00000000"]["_salt"].nunique()
    cold_salts = out[out.conv_id == "conv-00000010"]["_salt"].nunique()
    assert hot_salts == 3 and cold_salts == 1
    # range-bucket salting: salt is monotone in turn_idx per conversation
    sub = out[out.conv_id == "conv-00000000"].sort_values("turn_idx")
    assert (sub["_salt"].diff().fillna(0) >= 0).all()


def test_salted_map_groups_equals_unsalted():
    ds = _ds()
    hot = detect_hot_keys(ds, "conv_id", threshold_fraction=0.01)

    def count_group(g: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": [g["conv_id"][0].as_py()],
            "n": pa.array([g.num_rows], pa.int64()),
        })

    def merge_counts(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "conv_id": [g["conv_id"][0].as_py()],
            "n": pa.array([pc.sum(g["n"]).as_py()], pa.int64()),
        })

    salted = salted_map_groups(
        ds.select_columns(["conv_id", "turn_idx"]), "conv_id",
        count_group, merge_counts, hot_keys=hot, rows_per_salt=50,
        order_col="turn_idx").to_pandas()
    plain = _ds().groupby("conv_id").count().to_pandas() \
        .rename(columns={"count()": "n"})
    m = salted.merge(plain, on="conv_id", suffixes=("_s", "_p"))
    assert (m["n_s"] == m["n_p"]).all() and len(m) == len(plain)


def test_detect_hot_keys_sample_limit(ray_session):
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.state.skew import detect_hot_keys

    t = pa.table({"k": ["hot"] * 90 + ["c%d" % i for i in range(10)]})
    full = detect_hot_keys(ray.data.from_arrow(t), "k",
                           threshold_fraction=0.5)
    assert set(full) == {"hot"}
    # sampled probe only sees the prefix
    sampled = detect_hot_keys(ray.data.from_arrow(t), "k",
                              threshold_fraction=0.5, sample_limit=50)
    assert set(sampled) == {"hot"} and sampled["hot"] <= 50


def test_detect_hot_keys_high_cardinality_driver_only_sees_hot_tail():
    # >10^5 distinct cold keys + 2 planted hot keys: the merge runs
    # hash-partitioned distributed-side and only the hot tail (2 rows)
    # crosses to the driver
    import numpy as np

    n_cold = 120_000
    cold = pa.array(["k%07d" % i for i in range(n_cold)])
    hot = pa.array(["hotA"] * 5_000 + ["hotB"] * 4_000)
    t = pa.table({"k": pa.concat_arrays([cold, hot])})
    ds = ray.data.from_arrow(t).repartition(8)
    got = detect_hot_keys(ds, "k", threshold_fraction=0.02)
    assert got == {"hotA": 5_000, "hotB": 4_000}


def test_add_salt_int_keys_and_clamped_ranges(ray_session):
    """Review findings: non-string keys must not crash the detect->salt
    pipeline, and an undercounted hot key must keep salts CONTIGUOUS
    (clamp, not wrap)."""
    import numpy as np
    import ray.data as rd
    t = pa.table({
        "k": pa.array([7] * 40 + [8], pa.int64()),
        "o": pa.array(list(range(40)) + [0], pa.int64())})
    # numpy scalar keys, count UNDERCOUNTED to 25 (nsalt=3 @ 10/salt)
    out = add_salt(rd.from_arrow(t), "k", {np.int64(7): 25},
                   rows_per_salt=10, order_col="o").to_pandas()
    hot = out[out.k == 7].sort_values("o")
    # contiguous: 0-9 -> 0, 10-19 -> 1, 20+ -> 2 (clamped, never wraps)
    assert list(hot["_salt"][:10]) == [0] * 10
    assert list(hot["_salt"][10:20]) == [1] * 10
    assert list(hot["_salt"][20:]) == [2] * 20
