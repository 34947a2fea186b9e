"""Skew handling: hot-key detection + salted repartitioning (SURVEY.md §4).

The transcript generator plants hot conversations (~2% of all turns each —
FIXTURES.md F1) precisely so these paths are testable.

Strategy per stage type:
- Row-local stages (parse/enrich/route/write): no co-location needed; Ray's
  block splitting already spreads hot conversations across tasks. Nothing to
  salt.
- Pre-aggregated groupbys (count_by/sum_by/dedup_counts): per-block partials
  reduce every key to one row per block BEFORE the shuffle, so a hot key
  costs the same as a cold one. Partial aggregation IS the skew defense.
- Per-group stages that need the whole group (recombine_grouped,
  map_groups): a hot key serializes into one task. For associative group
  functions, salt the key — process (key, salt) subgroups in parallel, then
  merge per key. For order-dependent functions (recombine), subgroups must
  be CONTIGUOUS ranges, so salt by turn-range bucket and stitch segment
  boundaries in the per-key merge.

This module provides the generic pieces: detection by sampled counts, salt /
unsalt columns, and a salted map_groups for associative per-group functions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..stages.aggregate import _merge_partials
from ..stages.shuffle import adaptive_n_parts, key_partitioner


def detect_hot_keys(ds: Dataset, key: str, *, threshold_fraction: float = 0.01,
                    sample_limit: int | None = None,
                    n_parts: int | None = None) -> dict[str, int]:
    """Keys holding more than threshold_fraction of all rows, via the
    pre-aggregated count path (cheap: one partial-count pass, no raw-row
    shuffle). ``sample_limit`` caps the probe to the first N rows — a
    cheaper estimate whose fractions apply to the sampled prefix.
    Returns {key: count}.

    Scale: per-block partial counts merge through the hash-partitioned
    path (bounded per-task key sets), the total is reduced to ONE scalar
    distributed-side, and the ``count > cut`` filter runs distributed-side
    too — the driver only ever receives the hot tail (a handful of rows),
    never the full distinct-key count table (at 10^9 conv_ids that table
    is itself a driver OOM)."""
    if sample_limit is not None:
        ds = ds.limit(sample_limit)
    n_parts = n_parts or adaptive_n_parts()
    tag = key_partitioner(key, n_parts, "_mp")

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key]).group_by([key]).aggregate([([], "count_all")])
        return tag(t.rename_columns([key, "_partial"]))

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    # materialized once (object store, never the driver): consumed by both
    # the scalar total and the hot-tail filter
    merged = _merge_partials(partials, [key], [("_partial", "sum")], ["_n"],
                             part_col="_mp").materialize()
    total = int(merged.sum("_n") or 0)
    cut = max(1, int(total * threshold_fraction))
    hot = merged.filter(expr=f"_n > {cut}").to_pandas()
    return dict(zip(hot[key], (int(v) for v in hot["_n"])))


def add_salt(ds: Dataset, key: str, hot_keys: dict[str, int], *,
             rows_per_salt: int = 10_000, salt_col: str = "_salt",
             order_col: str | None = None) -> Dataset:
    """Append a salt column: 0 for cold keys; hot keys get
    ceil(count/rows_per_salt) salts. With ``order_col`` the salt is a
    contiguous RANGE bucket (order_col // rows_per_salt) so ordered stages
    can stitch; without it, a hash of the row order within the block."""
    hot = {k: int(np.ceil(n / rows_per_salt)) for k, n in hot_keys.items()}
    # infer the key array's type from the values (detect_hot_keys hands
    # back numpy scalars for int keys; forcing pa.string() crashed the
    # detect -> salt pipeline for any non-string key column)
    keys_arr = pa.array([k.item() if hasattr(k, "item") else k
                         for k in hot.keys()])
    nsalts_arr = pa.array(list(hot.values()), pa.int32())

    def fn(batch: pa.Table) -> pa.Table:
        k = batch[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        idx = pc.index_in(k, value_set=pc.cast(keys_arr, k.type)
                          if keys_arr.type != k.type else keys_arr)
        nsalt = pc.fill_null(pc.take(nsalts_arr, idx), 1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        if order_col is not None:
            o = pc.cast(batch[order_col], pa.int64()) \
                .to_numpy(zero_copy_only=False)
            # clamp instead of wrapping (% nsalt): a modulo makes salt 0
            # hold DISJOINT order ranges when the hot count was
            # underestimated or order_col isn't 0-based — clamping keeps
            # every salt a contiguous range (the last bucket just grows),
            # preserving the docstring's stitchability contract
            salt = np.minimum(o // rows_per_salt, nsalt - 1)
        else:
            salt = np.arange(batch.num_rows, dtype=np.int64) % nsalt
        return batch.append_column(salt_col,
                                   pa.array(salt.astype(np.int32)))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def salted_map_groups(ds: Dataset, key: str, group_fn, merge_fn, *,
                      hot_keys: dict[str, int], rows_per_salt: int = 10_000,
                      order_col: str | None = None) -> Dataset:
    """map_groups with hot-key salting for ASSOCIATIVE group functions:

        groupby(key, salt).map_groups(group_fn)   # parallel subgroups
        -> groupby(key).map_groups(merge_fn)      # tiny merge per key

    group_fn/merge_fn: pa.Table -> pa.Table. merge_fn sees the concatenated
    subgroup outputs of one key (already reduced — small)."""
    salted = add_salt(ds, key, hot_keys, rows_per_salt=rows_per_salt,
                      order_col=order_col)
    partial = salted.groupby([key, "_salt"]).map_groups(
        lambda g: group_fn(g.drop_columns(["_salt"])), batch_format="pyarrow")
    return partial.groupby(key).map_groups(merge_fn, batch_format="pyarrow")
