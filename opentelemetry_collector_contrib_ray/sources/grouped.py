"""File-aligned Parquet reading — blocks that ARE the partition unit.

`ray.data.read_parquet` targets ~2x-CPUs output blocks and splits them at
arbitrary row boundaries, so "my part files each hold whole groups" does
NOT survive into the block structure a `map_batches(batch_size=None)`
stage sees. Stages that exploit group-contained blocks
(`recombine_blocks`, `tail_sample(pre_grouped=True)`) need the block
boundary to equal the file boundary.

`read_file_blocks` provides that: one task per file, each emitting the
whole file as a single block. The trade-off is explicit — read
parallelism equals the file count, and a file must fit a worker's heap
(keep files at or below `DataContext.target_max_block_size`, or Ray's
dynamic block splitting will re-split the output and void the contract;
the 100-TB layout rule of "many ~100-MB conversation-contained part
files" satisfies both).
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


def read_file_blocks(paths: str | list[str],
                     columns: list[str] | None = None) -> Dataset:
    """One Parquet file -> one task -> one block (column-pruned at the
    read). ``paths``: a directory, a glob, or an explicit file list."""
    files = _expand(paths)
    if not files:
        raise FileNotFoundError(f"no parquet files under {paths!r}")

    def read_one(batch):
        for p in batch["item"].to_pylist():
            yield pq.read_table(p, columns=columns)

    return (ray.data.from_items(files)
            .repartition(len(files))
            .map_batches(read_one, batch_format="pyarrow",
                         batch_size=None))
