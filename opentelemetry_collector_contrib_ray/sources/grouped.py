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
    return ray.data.read_parquet(paths, override_num_blocks=int(nblocks),
                                 **kwargs)


def _group_safe_spans(path: str, group_col: str, target_rows: int,
                      target_bytes: int | None = None
                      ) -> list[tuple[int, int]]:
    """Split one file into contiguous row-group runs of ~``target_rows``
    whose boundaries are GROUP-SAFE: a cut between row groups i and i+1 is
    taken only where the parquet column statistics prove no ``group_col``
    value straddles it (max of i != min of i+1). Rows-sorted-by-group
    files (the fixture contract) yield ~target-sized spans; files without
    stats, or where no safe cut exists, fall back to one span = the file.

    ``target_bytes`` (uncompressed, from row-group metadata) is a second
    cut trigger: a span that outgrows Ray's dynamic-block-split threshold
    would be re-split at ARBITRARY rows downstream, silently voiding the
    containment contract (observed at sf10: 33 of 50 blocks started
    mid-conversation before this guard). Returns
    [(first_rg, last_rg_exclusive), ...]."""
    md = pq.ParquetFile(path).metadata
    try:
        ci = md.schema.to_arrow_schema().get_field_index(group_col)
    except KeyError:
        return [(0, md.num_row_groups)]
    if ci < 0:
        return [(0, md.num_row_groups)]
    spans: list[tuple[int, int]] = []
    start, acc, accb = 0, 0, 0
    for i in range(md.num_row_groups):
        acc += md.row_group(i).num_rows
        accb += md.row_group(i).total_byte_size
        if (acc < target_rows and (not target_bytes or accb < target_bytes)) \
                or i + 1 == md.num_row_groups:
            continue
        left = md.row_group(i).column(ci).statistics
        right = md.row_group(i + 1).column(ci).statistics
        if (left is None or right is None or not left.has_min_max
                or not right.has_min_max or left.max == right.min):
            continue  # unprovable or straddling: keep accumulating
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
    holds whole groups. Driver cost is one metadata read per file — the
    same footprint as Ray's own parquet planner."""
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

    if group_col is not None and target_rows:
        items = [{"path": p, "lo": lo, "hi": hi}
                 for p in files
                 for lo, hi in _group_safe_spans(p, group_col, target_rows,
                                                 target_bytes=limit // 2)]
    else:
        import warnings
        for p in files:
            md = pq.ParquetFile(p).metadata
            raw = sum(md.row_group(i).total_byte_size
                      for i in range(md.num_row_groups))
            if raw > limit:
                warnings.warn(
                    f"read_file_blocks: {p} is {raw >> 20} MiB uncompressed"
                    f" > target_max_block_size ({limit >> 20} MiB); Ray"
                    " will re-split its block at arbitrary rows and break"
                    " group containment — pass group_col/target_rows to"
                    " split at statistics-proven group boundaries",
                    stacklevel=2)
                break
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
