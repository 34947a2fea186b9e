"""Sink compaction: merge small parquet files into target-sized ones.

At 100 TB the fan-out sink produces one file per (block x sink); hot sinks
accumulate many small files, which hurts downstream scan parallelism and
metadata load. Compaction is the standard follow-up pass: per sink
directory, group files greedily up to ``target_mb`` of input bytes and
rewrite each group as one file.

Crash safety: the compacted file's NAME is a digest of its input list and
the inputs are recorded in the parquet schema metadata; writes go through
fsync + rename. A crash between the rename and the input deletions leaves
both the compacted file and (some) originals — ``repair`` (run
automatically at the start of every compaction pass) finishes the deletes
by consulting the recorded input list, so scans never double-count after
recovery. Runs as Ray tasks, one per output group.
"""

from __future__ import annotations

import hashlib
import json
import os

import ray

_META_KEY = b"compaction_inputs"


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


def repair(root: str) -> int:
    """Finish interrupted compactions: for every compacted-*.parquet, delete
    any recorded input file that still exists (the crash window between the
    compacted rename and the input deletes). Returns files removed."""
    import pyarrow.parquet as pq

    removed = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            if not (name.startswith("compacted-")
                    and name.endswith(".parquet")):
                continue
            meta = pq.read_schema(os.path.join(dirpath, name)).metadata or {}
            inputs = json.loads(meta.get(_META_KEY, b"[]"))
            for base in inputs:
                stale = os.path.join(dirpath, base)
                if os.path.exists(stale):
                    os.remove(stale)
                    removed += 1
    return removed


@ray.remote
def _compact_group(files: list[str], out_dir: str) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if len(files) < 2:
        return 0
    table = pa.concat_tables([pq.read_table(f) for f in files])
    basenames = sorted(os.path.basename(f) for f in files)
    digest = hashlib.md5("|".join(basenames).encode()).hexdigest()
    meta = dict(table.schema.metadata or {})
    meta[_META_KEY] = json.dumps(basenames).encode()
    table = table.replace_schema_metadata(meta)
    tmp = os.path.join(out_dir, f".compact-{digest}.tmp")
    final = os.path.join(out_dir, f"compacted-{digest}.parquet")
    pq.write_table(table, tmp, compression="zstd", compression_level=3)
    with open(tmp, "rb") as fh:  # durable before the rename
        os.fsync(fh.fileno())
    os.replace(tmp, final)
    for f in files:
        os.remove(f)
    return len(files)


def compact_sink_dirs(root: str, *, target_mb: int = 256) -> dict:
    """Compact every leaf directory under ``root`` containing >1 parquet
    file (after repairing any interrupted previous pass). Returns
    {dir: files_merged}."""
    repair(root)
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
