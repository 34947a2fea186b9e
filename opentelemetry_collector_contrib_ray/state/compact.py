"""Sink compaction: merge small parquet files into target-sized ones.

At 100 TB the fan-out sink produces one file per (block x sink); hot sinks
accumulate many small files, which hurts downstream scan parallelism and
metadata load. Compaction is the standard follow-up pass: per sink
directory, group files greedily up to ``target_mb`` of input bytes and
rewrite each group as one file (atomic: write .tmp, fsync-rename, delete
inputs only after the replacement lands — crash mid-compaction leaves
either the originals or the compacted file, never neither).
Runs as Ray tasks, one per output group.
"""

from __future__ import annotations

import os
import uuid

import ray


def _plan_groups(files: list[str], target_bytes: int) -> list[list[str]]:
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_size = 0
    for f in sorted(files):
        size = os.path.getsize(f)
        if cur and cur_size + size > target_bytes:
            groups.append(cur)
            cur, cur_size = [], 0
        cur.append(f)
        cur_size += size
    if cur:
        groups.append(cur)
    return groups


@ray.remote
def _compact_group(files: list[str], out_dir: str) -> int:
    import pyarrow.parquet as pq

    if len(files) < 2:
        return 0
    import pyarrow as pa

    table = pa.concat_tables([pq.read_table(f) for f in files])
    tmp = os.path.join(out_dir, f".compact-{uuid.uuid4().hex}.tmp")
    final = os.path.join(out_dir, f"compacted-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, tmp, compression="zstd", compression_level=3)
    os.replace(tmp, final)
    for f in files:
        os.remove(f)
    return len(files)


def compact_sink_dirs(root: str, *, target_mb: int = 256) -> dict:
    """Compact every leaf directory under ``root`` containing >1 parquet
    file. Returns {dir: files_merged}."""
    target = target_mb << 20
    jobs = []
    dirs = []
    for dirpath, _dirnames, filenames in os.walk(root):
        files = [os.path.join(dirpath, f) for f in filenames
                 if f.endswith(".parquet")]
        if len(files) < 2:
            continue
        for group in _plan_groups(files, target):
            if len(group) >= 2:
                jobs.append(_compact_group.remote(group, dirpath))
                dirs.append(dirpath)
    merged = ray.get(jobs) if jobs else []
    out: dict[str, int] = {}
    for d, n in zip(dirs, merged):
        out[d] = out.get(d, 0) + n
    return out
