"""Shared shuffle utilities: adaptive partitioning + reduce-side join."""

import numpy as np
import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.shuffle import (
    adaptive_n_parts,
    dir_size_bytes,
    int_partition_ids,
    key_partitioner,
    mix64_rows,
    partitioned_attach,
)


def test_adaptive_n_parts_scales_with_cpus_and_bytes():
    base = adaptive_n_parts()
    assert base >= 32  # floor
    # input-bytes override: 100 GB at 256 MB target -> at least 400 parts
    assert adaptive_n_parts(100 << 30) >= 400
    assert adaptive_n_parts(1) == base  # tiny input keeps the cpu floor


def test_mix64_deterministic_and_spread():
    m = np.arange(2000, dtype=np.uint64).reshape(1000, 2)
    h1, h2 = mix64_rows(m, 7), mix64_rows(m, 7)
    assert (h1 == h2).all()
    assert (mix64_rows(m, 8) != h1).any()
    parts = h1 % 32
    counts = np.bincount(parts.astype(np.int64), minlength=32)
    assert counts.min() > 0  # no empty partition at 1000 rows


def test_key_partitioner_deterministic_per_key():
    t = pa.table({"k": ["a", "b", "a", "c", "b"], "v": [1, 2, 3, 4, 5]})
    out = key_partitioner("k", 8)(t)
    parts = dict(zip(out["k"].to_pylist(), out["_part"].to_pylist()))
    again = key_partitioner("k", 8)(t)
    assert [parts[k] for k in again["k"].to_pylist()] == \
        again["_part"].to_pylist()


def test_partitioned_attach_matches_dict_join():
    rng = np.random.default_rng(3)
    facts = pa.table({
        "a": pa.array(rng.integers(0, 50, 200), pa.int64()),
        "b": pa.array(rng.integers(0, 50, 200), pa.int64()),
    })
    lookup = pa.table({
        "doc_id": pa.array(np.arange(50), pa.int64()),
        "_n": pa.array(rng.integers(1, 100, 50), pa.int64()),
    })
    expect = dict(zip(lookup["doc_id"].to_pylist(), lookup["_n"].to_pylist()))
    left = ray.data.from_arrow(facts).repartition(4)
    right = ray.data.from_arrow(lookup).repartition(3)
    i64 = pa.int64()
    out = partitioned_attach(
        left, {"a": i64, "b": i64}, right, key_col="a", right_key="doc_id",
        right_val="_n", out_name="na", n_parts=6).to_pandas()
    assert len(out) == 200
    assert all(expect[a] == na for a, na in zip(out.a, out.na))


def test_partitioned_attach_unmatched_left_keys_null():
    left = ray.data.from_arrow(pa.table({"a": pa.array([1, 99], pa.int64())}))
    right = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1], pa.int64()),
         "_n": pa.array([7], pa.int64())}))
    out = partitioned_attach(
        left, {"a": pa.int64()}, right, key_col="a", right_key="doc_id",
        right_val="_n", out_name="n", n_parts=4).to_pandas()
    got = dict(zip(out.a, out.n))
    assert got[1] == 7 and np.isnan(got[99])


def test_int_partition_ids_in_range():
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "b": pa.array([9, 8, 7], pa.int64())})
    p = int_partition_ids(t, ["a", "b"], 5)
    assert ((p >= 0) & (p < 5)).all()


def test_dir_size_bytes(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(b"z" * 1234)
    assert dir_size_bytes(str(tmp_path)) == 1234
    assert dir_size_bytes(str(f)) == 1234


def test_partitioned_attach_null_right_values():
    # a null lookup VALUE must not fabricate phantom fact rows
    left = ray.data.from_arrow(pa.table({"a": pa.array([1, 2], pa.int64())}))
    right = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "_n": pa.array([7, None], pa.int64())}))
    out = partitioned_attach(
        left, {"a": pa.int64()}, right, key_col="a", right_key="doc_id",
        right_val="_n", out_name="n", n_parts=4).to_pandas()
    assert len(out) == 2
    got = dict(zip(out.a, out.n))
    assert got[1] == 7 and np.isnan(got[2])
