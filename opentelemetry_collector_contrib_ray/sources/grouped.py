"""File-aligned Parquet reading — blocks that ARE the partition unit.

`ray.data.read_parquet` targets ~2x-CPUs output blocks and splits them at
arbitrary row boundaries, so "my part files each hold whole groups" does
NOT survive into the block structure a `map_batches(batch_size=None)`
stage sees. Stages that exploit group-contained blocks
(`recombine_blocks`, `tail_sample(pre_grouped=True)`) need the block
boundary to equal the file boundary.

`read_file_blocks` provides that: one task per file, each emitting the
whole file as a single block. With ``group_col``/``target_rows`` it goes
finer — files split into ~target-row runs of row groups at boundaries the
parquet column statistics prove group-safe, so parallelism scales with
data size, not file count. A block must fit a worker's heap (keep spans
at or below `DataContext.target_max_block_size`, or Ray's dynamic block
splitting will re-split the output and void the contract; the 100-TB
layout rule of "many ~100-MB conversation-contained part files" satisfies
both).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import ray.data
from ray.data import Dataset


def _expand(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        if os.path.isdir(paths):
            return sorted(glob.glob(os.path.join(paths, "*.parquet")))
        if os.path.exists(paths):
            return [paths]
        # a glob with no matches (or a typo'd path) must fail on the
        # driver, not inside a remote read task
        return sorted(glob.glob(paths))
    return list(paths)


def read_sized_parquet(paths: str | list[str], *,
                       target_block_bytes: int = 12 << 20,
                       **kwargs) -> Dataset:
    """``read_parquet`` with a DATA-derived block count.

    Ray's default read heuristic targets ~2x-CPU output blocks, which
    makes the physical plan (and per-block fixed costs) a function of
    cluster size — measured on a 63.5M-row table this cost a 16-CPU run
    22.4s vs 18.0s and skewed N-vs-4N scaling comparisons (BASELINE.md
    round 3). Here block count = input bytes / ``target_block_bytes``
    (compressed; ~12 MiB ≈ 50 MB in-memory Arrow for text-heavy rows),
    floored at 2x cluster CPUs so small inputs still parallelize."""
    from ..stages.shuffle import cluster_cpus
    files = _expand(paths)
    if not files:
        raise FileNotFoundError(f"no parquet files under {paths!r}")
    total = sum(os.path.getsize(f) for f in files)
    nblocks = max(2 * cluster_cpus(), len(files),
                  total // target_block_bytes)
    # read the expanded list, not the raw argument: globs aren't valid
    # read_parquet paths, and for a directory read_parquet would pick up
    # non-top-level files the byte total above never saw
    return ray.data.read_parquet(files, override_num_blocks=int(nblocks),
                                 **kwargs)


def _group_safe_spans(path: str, group_col: str, target_rows: int,
                      target_bytes: int | None = None
                      ) -> list[tuple[int, int]]:
    """Split one file into contiguous row-group runs of ~``target_rows``
    whose boundaries are GROUP-SAFE, proven from parquet column statistics
    in two steps:

    1. The file must be row-group-monotone on ``group_col`` — every
       boundary has max(rg_i) <= min(rg_{i+1}). Only then does a group
       occupy a contiguous run of row groups (an unsorted file could
       revisit a group in a non-adjacent row group, making ANY cut
       unsafe); otherwise the whole file is one span.
    2. A cut is taken only where max(rg_i) < min(rg_{i+1}) strictly —
       equality means the group straddles, and strict inequality (unlike
       inequality-of-truncated-stats) cannot be faked by parquet
       statistics truncation, which only widens the [min, max] interval.

    Files without stats, or where no safe cut exists, fall back to one
    span = the file. ``target_bytes`` (uncompressed, from row-group
    metadata) is a second cut trigger: a span that outgrows Ray's
    dynamic-block-split threshold would be re-split at ARBITRARY rows
    downstream, silently voiding the containment contract (observed at
    sf10: 33 of 50 blocks started mid-conversation before this guard).
    Returns [(first_rg, last_rg_exclusive), ...]."""
    md = pq.ParquetFile(path).metadata
    whole = [(0, md.num_row_groups)]
    # resolve group_col to its parquet LEAF column index: the arrow
    # top-level field index diverges as soon as any earlier column is
    # nested (struct/list), silently pointing the stats at a different
    # leaf
    ci = next((j for j in range(len(md.schema))
               if md.schema.column(j).path == group_col), -1)
    if ci < 0:
        return whole
    stats = [md.row_group(i).column(ci).statistics
             for i in range(md.num_row_groups)]
    if any(s is None or not s.has_min_max for s in stats):
        return whole
    if any(stats[i].max > stats[i + 1].min
           for i in range(md.num_row_groups - 1)):
        return whole  # not row-group-monotone: no cut is provably safe
    spans: list[tuple[int, int]] = []
    start, acc, accb = 0, 0, 0
    for i in range(md.num_row_groups):
        acc += md.row_group(i).num_rows
        accb += md.row_group(i).total_byte_size
        if (acc < target_rows and (not target_bytes or accb < target_bytes)) \
                or i + 1 == md.num_row_groups:
            continue
        if not stats[i].max < stats[i + 1].min:
            continue  # straddling boundary: keep accumulating
        spans.append((start, i + 1))
        start, acc, accb = i + 1, 0, 0
    spans.append((start, md.num_row_groups))
    if target_bytes:
        # a span that could not be cut (one giant group, or no provable
        # boundary) may still exceed Ray's split threshold — surface it
        # rather than silently losing containment downstream
        import warnings
        for lo, hi in spans:
            b = sum(md.row_group(i).total_byte_size for i in range(lo, hi))
            if b > 2 * target_bytes:
                warnings.warn(
                    f"read_file_blocks: span rg[{lo}:{hi}] of {path} is "
                    f"{b >> 20} MiB uncompressed with no group-safe cut; "
                    "Ray may re-split it at arbitrary rows — raise "
                    "DataContext.target_max_block_size above the largest "
                    "group to preserve containment", stacklevel=2)
    return spans


def read_file_blocks(paths: str | list[str],
                     columns: list[str] | None = None,
                     group_col: str | None = None,
                     target_rows: int | None = None) -> Dataset:
    """One Parquet file -> one task -> one block (column-pruned at the
    read). ``paths``: a directory, a glob, or an explicit file list.

    With ``group_col`` + ``target_rows``, each file is further split into
    row-group runs of ~``target_rows`` rows at statistics-proven group
    boundaries (`_group_safe_spans`), so read parallelism scales with data
    size instead of capping at the file count while every block still
    holds whole groups. Driver cost is one metadata read per file in span
    mode; plain mode stays metadata-free (a compressed-size heuristic
    backs the containment warning)."""
    if (group_col is None) != (target_rows is None):
        raise ValueError(
            "read_file_blocks: group_col and target_rows must be passed "
            "together — a half-specified call would silently fall back to "
            "file-count-capped parallelism")
    files = _expand(paths)
    if not files:
        raise FileNotFoundError(f"no parquet files under {paths!r}")

    # Ray dynamically re-splits any output block larger than
    # target_max_block_size at ARBITRARY row boundaries — which silently
    # voids the group-containment contract this reader exists to provide.
    # Spans aim for half that threshold (uncompressed); plain file blocks
    # that exceed it get a loud warning to switch to span mode.
    limit = ray.data.DataContext.get_current().target_max_block_size \
        or (128 << 20)

    if group_col is not None:
        items = [{"path": p, "lo": lo, "hi": hi}
                 for p in files
                 for lo, hi in _group_safe_spans(p, group_col, target_rows,
                                                 target_bytes=limit // 2)]
    else:
        # cheap trip-wire only (no footer reads): compressed size over the
        # limit certainly means the uncompressed block is over it too; the
        # exact uncompressed check runs in span mode
        big = next((p for p in files if os.path.getsize(p) > limit), None)
        if big is not None:
            import warnings
            warnings.warn(
                f"read_file_blocks: {big} is "
                f"{os.path.getsize(big) >> 20} MiB compressed"
                f" > target_max_block_size ({limit >> 20} MiB); Ray"
                " will re-split its block at arbitrary rows and break"
                " group containment — pass group_col/target_rows to"
                " split at statistics-proven group boundaries",
                stacklevel=2)
        items = [{"path": p, "lo": -1, "hi": -1} for p in files]

    def read_one(batch):
        for p, lo, hi in zip(batch["path"].to_pylist(),
                             batch["lo"].to_pylist(),
                             batch["hi"].to_pylist()):
            if lo < 0:
                yield pq.read_table(p, columns=columns)
            else:
                yield pq.ParquetFile(p).read_row_groups(
                    list(range(lo, hi)), columns=columns)

    return (ray.data.from_items(items)
            .repartition(len(items))
            .map_batches(read_one, batch_format="pyarrow",
                         batch_size=None))
