"""Shared shuffle/partitioning utilities.

The reference is a single-process stream (SURVEY.md §4): it has no shuffle
at all — horizontal scale is "run N collectors over sharded inputs". Every
wide operation we add (dedup merges, per-key scans, pair joins) therefore
needs an explicit distributed plan, and these helpers centralize the three
recurring pieces:

- ``adaptive_n_parts``: how many coarse partitions a groupby/map_groups
  stage should use. A fixed constant caps parallelism (32 tasks on a
  256-node cluster) and inflates per-task memory (1/32 of 100 TB in one
  task). Derived from cluster CPUs, with an optional input-bytes override
  so each partition targets a bounded in-task footprint.
- ``key_partitioner``: the cross-worker-deterministic coarse partition tag
  (vectorized seeded polars hash) used by recombine/sessionize/metrics.
- ``mix64_rows``: vectorized splitmix-style row hash of an int64 matrix —
  the partition hash for integer keys (dedup pair merges, LSH buckets).
- ``partitioned_attach``: a reduce-side hash join (attach one lookup column
  onto a fact table). Both sides hash-partition on the key; each partition
  joins independently with a vectorized sorted-search. No driver
  materialization, no broadcast of O(N) state, and — unlike Ray 2.49's
  experimental ``Dataset.join`` — no deadlock on clusters under 8 CPUs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def round_half_away(x, digits: int):
    """numpy rounding matching DuckDB ROUND (half away from zero);
    np.round's half-to-even diverges on exact halfway values — a verified
    oracle-gate flake class for ratio columns."""
    f = 10.0 ** digits
    return np.copysign(np.floor(np.abs(np.asarray(x)) * f + 0.5), x) / f


def cluster_cpus(default: int = 32) -> int:
    import ray
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", default)) or default
    return default


def actor_pool_size(min_div: int = 8, max_div: int = 2) -> tuple[int, int]:
    """(min, max) actor-pool concurrency derived from cluster CPUs:
    min = cpus/min_div (leave task stages room to start — a min-pool that
    grabs every core deadlocks the fused upstream on small clusters),
    max = cpus/max_div. Replaces hard-coded (1, 8)-style tuples that cap
    parallelism at 8 tasks on a 256-CPU cluster."""
    cpus = cluster_cpus(default=8)
    return (max(1, cpus // min_div), max(2, cpus // max_div))


# Tiny-input hybrid threshold (shared by tail_sample, ngram_jaccard_pairs,
# kmeans_fit; connected_components gates on edge count instead): below this
# on-disk size a multi-stage shuffle plan is pure fixed cost, so the stage
# collapses to one task running the identical kernels. Distributed plans
# are untouched when the size is unknown or large.
SINGLE_TASK_BYTES = 32 << 20


def adaptive_n_parts(size_bytes: int | None = None, *,
                     target_bytes: int = 256 << 20, floor: int = 32) -> int:
    """Partition count for coarse-partitioned group stages.

    max(floor, 2×cluster CPUs, input_bytes / target_bytes): parallelism
    scales with the cluster, per-partition bytes stay bounded when the
    caller knows the input size (pass the on-disk bytes; Parquet text
    expands ~2-3× in memory, which the default 256 MB target absorbs
    against Ray's typical multi-GB worker heaps).
    """
    n = max(floor, 2 * cluster_cpus())
    if size_bytes:
        n = max(n, -(-size_bytes // target_bytes))
    return n


def dir_size_bytes(path: str) -> int:
    """Total size of the files under ``path`` (or the file itself) — the
    cheap input-size estimate for adaptive_n_parts at plan-build time."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def key_partitioner(key_col: str, n_parts: int, out_col: str = "_part"):
    """map_batches fn tagging rows with hash(key) % n_parts — deterministic
    across workers (unlike Python's randomized hash()). Fully vectorized:
    seeded polars hash over the string-cast column (Rust kernel, verified
    cross-process-stable — same machinery as doc_shingle_hashes), no
    Python per value; nulls all land in partition 0."""
    import polars as pl

    def fn(batch: pa.Table) -> pa.Table:
        k = batch[key_col]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        s = pc.cast(k, pa.string())
        h = pl.from_arrow(s).hash(seed=4242).to_numpy().astype(np.uint64)
        part = (h % np.uint64(n_parts)).astype(np.int64)
        if s.null_count:
            part[~np.asarray(pc.is_valid(s))] = 0
        return batch.append_column(out_col, pa.array(part))
    return fn


def mix64_rows(mat: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized 64-bit mixing hash of each ROW of a small uint64 matrix
    (splitmix-style multiply-xor chain). Deterministic across workers."""
    with np.errstate(over="ignore"):
        init = np.uint64((seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF)
        h = np.full(mat.shape[0], init, np.uint64)
        for c in range(mat.shape[1]):
            h = (h ^ mat[:, c]) * np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(31)
    return h


def int_partition_ids(batch: pa.Table, cols: list[str], n_parts: int,
                      seed: int = 11) -> np.ndarray:
    """int64 partition id per row from integer key columns (mix64 % n)."""
    mat = np.stack(
        [batch[c].to_numpy(zero_copy_only=False).astype(np.uint64)
         for c in cols], axis=1)
    return (mix64_rows(mat, seed) % np.uint64(n_parts)).astype(np.int64)


def partitioned_attach(left: Dataset, left_schema: dict[str, pa.DataType],
                       right: Dataset, *, key_col: str, right_key: str,
                       right_val: str, out_name: str,
                       val_type: pa.DataType | None = None,
                       n_parts: int | None = None) -> Dataset:
    """Left-join one value column onto a fact table, reduce-side.

    ``left`` has columns ``left_schema`` (including int64 ``key_col``);
    ``right`` is a (right_key:int64, right_val) lookup with unique keys.
    Both sides are tagged with mix64(key) % n_parts, unioned, and each
    partition joins independently (sorted-search on the right keys — fully
    vectorized, no per-row Python). Unmatched left keys get null.

    This replaces (a) driver-side dict broadcasts of O(N) lookup state and
    (b) Ray's experimental Dataset.join (deadlocks under 8 CPUs on 2.49).
    """
    n_parts = n_parts or adaptive_n_parts()
    val_type = val_type or pa.int64()
    left_cols = list(left_schema)

    def aug_left(b: pa.Table) -> pa.Table:
        part = int_partition_ids(b, [key_col], n_parts)
        cols = {"_jp": pa.array(part)}
        for c in left_cols:
            col = b[c]
            cols[c] = col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
        cols["_rv"] = pa.nulls(b.num_rows, val_type)
        # explicit side marker: a null right VALUE must not demote a lookup
        # row to a fact row
        # typed: [False] * 0 infers the null type and the union's schema
        # unification then rejects empty blocks against bool blocks
        cols["_side_r"] = pa.array([False] * b.num_rows, pa.bool_())
        return pa.table(cols)

    def aug_right(b: pa.Table) -> pa.Table:
        # same hash+seed as aug_left, via the same helper (key renamed)
        part = int_partition_ids(
            pa.table({key_col: b[right_key]}), [key_col], n_parts)
        cols = {"_jp": pa.array(part)}
        for c in left_cols:
            if c == key_col:
                cols[c] = pc.cast(b[right_key], left_schema[key_col])
            else:
                cols[c] = pa.nulls(b.num_rows, left_schema[c])
        rv = b[right_val]
        cols["_rv"] = pc.cast(
            rv.combine_chunks() if isinstance(rv, pa.ChunkedArray) else rv,
            val_type)
        cols["_side_r"] = pa.array([True] * b.num_rows, pa.bool_())
        return pa.table(cols)

    def join_group(g: pa.Table) -> pa.Table:
        is_right = pc.fill_null(g["_side_r"], False) \
            .to_numpy(zero_copy_only=False)
        left_rows = g.filter(pa.array(~is_right))
        out_cols = {c: left_rows[c] for c in left_cols}
        n_left = left_rows.num_rows
        if n_left == 0:
            out_cols[out_name] = pa.array([], val_type)
            return pa.table(out_cols)
        right_rows = g.filter(pa.array(is_right))
        rid = right_rows[key_col].to_numpy(zero_copy_only=False)
        if len(rid) == 0:
            out_cols[out_name] = pa.nulls(n_left, val_type)
            return pa.table(out_cols)
        order = np.argsort(rid, kind="stable")
        rid_s = rid[order]
        lkeys = left_rows[key_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rid_s, lkeys)
        inb = pos < len(rid_s)
        matched = inb & (rid_s[np.clip(pos, 0, len(rid_s) - 1)] == lkeys)
        take = np.where(matched, order[np.clip(pos, 0, len(rid_s) - 1)], 0)
        rv = right_rows["_rv"]
        if isinstance(rv, pa.ChunkedArray):
            rv = rv.combine_chunks()
        vals = pc.take(rv, pa.array(take.astype(np.int64)))
        out_cols[out_name] = pc.if_else(
            pa.array(matched), vals, pa.nulls(n_left, val_type))
        return pa.table(out_cols)

    tagged_l = left.map_batches(aug_left, batch_format="pyarrow",
                                batch_size=None)
    tagged_r = right.map_batches(aug_right, batch_format="pyarrow",
                                 batch_size=None)
    return tagged_l.union(tagged_r).groupby("_jp").map_groups(
        join_group, batch_format="pyarrow")
