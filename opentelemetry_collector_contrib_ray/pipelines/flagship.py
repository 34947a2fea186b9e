"""Flagship pipeline: read -> parse -> enrich -> route -> per-sink sinks + counts.

This is the batch re-expression of the collector's canonical log path
(SURVEY.md §3.1): filelog receiver (stanza parser DAG) -> processors ->
routingconnector -> per-sink exporters + countconnector, as ONE lazy Ray Data
pipeline:

    read_parquet(transcripts)                      # receiver
      .map_batches(parse_transcript_batch)         # stanza parsers (vectorized)
      .map_batches(BroadcastLookupEnricher, ...)   # k8sattributes analogue
      .map_batches(RouteTable)                     # routingconnector
      -> write_parquet(partition_cols=["sink"])    # grouping fileexporter
      -> count_by(...) per sink                    # countconnector

Everything streams: no stage materializes the dataset; the routing fan-out is
a single `sink` column + one partitioned write, so the full input is written
exactly once regardless of the number of sinks (the reference moves record
slices per route — same I/O shape: each record lands in exactly one sink,
connector/routingconnector/logs.go:64-104).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..model import DEBUG, ERROR, FATAL, INFO, TRACE, WARN
from ..sources.transcripts import ensure_transcripts
from ..stages.enrich import enrich_stage, flagship_enrich_spec
from ..stages.parse import parse_transcript_batch
from ..stages.route import flagship_route_table
from ..state.manifest import ManifestStore, PartitionManifest

_BUCKET_BOUNDS = pa.array([TRACE, DEBUG, INFO, WARN, ERROR, FATAL], pa.int32())
_BUCKET_NAMES = pa.array(
    ["default", "trace", "debug", "info", "warn", "error", "fatal"], pa.string())


def add_severity_bucket(batch: pa.Table) -> pa.Table:
    """Coarse severity bucket column for per-sink aggregate keys
    (model.severity_bucket, vectorized)."""
    num = batch["severity_number"]
    if isinstance(num, pa.ChunkedArray):
        num = num.combine_chunks()
    # index of first bound > num == number of bounds <= num
    idx = pa.array([0] * len(num), pa.int32())
    for i in range(len(_BUCKET_BOUNDS)):
        ge = pc.greater_equal(num, _BUCKET_BOUNDS[i])
        idx = pc.add(idx, pc.cast(pc.fill_null(ge, False), pa.int32()))
    return batch.append_column("severity_bucket", pc.take(_BUCKET_NAMES, idx))


def _default_pool() -> tuple[int, int]:
    """Enrich actor-pool size — delegates to the shared cluster-CPU-derived
    helper (stages/shuffle.actor_pool_size)."""
    from ..stages.shuffle import actor_pool_size
    return actor_pool_size()


def _read_transcripts(paths, **kwargs) -> ray.data.Dataset:
    """read_parquet with a data-derived block count — at 100 TB block size
    is a per-dataset property, not a function of cluster size
    (sources.grouped.read_sized_parquet has the measurements)."""
    from ..sources.grouped import read_sized_parquet
    return read_sized_parquet(paths, **kwargs)


def _transform(ds: ray.data.Dataset, *, concurrency=None) -> ray.data.Dataset:
    """parse -> severity bucket -> enrich (actor pool) -> route.

    batch_size=None = one batch per block (zero-copy Arrow, no re-chunking);
    every stage is a vectorized whole-column kernel, so bigger is better.
    """
    ds = ds.map_batches(parse_transcript_batch, batch_format="pyarrow",
                        batch_size=None)
    ds = ds.map_batches(add_severity_bucket, batch_format="pyarrow",
                        batch_size=None)
    # flagship lookup tables are tiny -> enrich_stage plans a task closure
    # (full fusion, no pool cap); a real k8sattributes-size index would get
    # the actor pool automatically (stages/enrich.py)
    ds = enrich_stage(ds, flagship_enrich_spec(),
                      concurrency=concurrency or _default_pool())
    ds = ds.map_batches(flagship_route_table(), batch_format="pyarrow",
                        batch_size=None)
    return ds


def build_parsed(sf_dir: str, *, concurrency=None) -> ray.data.Dataset:
    """Lazy Dataset: transcripts parsed + enriched + routed (no sink writes)."""
    path = ensure_transcripts(sf_dir)
    return _transform(_read_transcripts(path), concurrency=concurrency)


def make_sink_writer(parts_dir: str):
    """Fused fan-out sink: writes each batch's (part, sink) slices straight
    to ``parts_dir/part=<p>/sink=<s>/<digest>.parquet`` and RETURNS the
    per-slice row counts as the stage output.

    This replaces Ray's write operator for the fan-out: the write runs
    inside the same fused map stage as parse/enrich/route (no materialized
    boundary, write overlaps compute) and the count-connector totals fall
    out of the write itself — measured ~2x faster end-to-end than
    write_parquet(partition_cols=...) + footer scans.

    Idempotence under Ray TASK RETRY: file names are a content digest of
    the slice's identity (part, sink, first/last (conv_id, turn_idx),
    row count) — a re-executed task reprocesses the same input block and
    overwrites the same file instead of adding a duplicate under a fresh
    uuid. Cross-RUN idempotence comes from partition-level commit
    (incomplete partition dirs are wiped before rebuild)."""
    import hashlib

    import pyarrow.parquet as pq

    def write_batch(batch: pa.Table) -> pa.Table:
        sinks = batch["sink"]
        if isinstance(sinks, pa.ChunkedArray):
            sinks = sinks.combine_chunks()
        parts = batch["part"]
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        key = pc.binary_join_element_wise(parts, sinks, "|")
        rows_p, rows_s, rows_n = [], [], []
        for kv in pc.unique(key).to_pylist():
            p, s = kv.split("|")
            sub = batch.filter(pc.equal(key, kv)).drop_columns(["part"])
            d = os.path.join(parts_dir, f"part={p}", f"sink={s}")
            os.makedirs(d, exist_ok=True)
            ident = "|".join(map(str, (
                p, s, sub.num_rows,
                sub["conv_id"][0].as_py(), sub["turn_idx"][0].as_py(),
                sub["conv_id"][-1].as_py(), sub["turn_idx"][-1].as_py())))
            name = hashlib.md5(ident.encode()).hexdigest()
            # zstd-3: measured faster than snappy end-to-end AND ~32%
            # smaller (text-heavy payloads) — trades idle CPU for the
            # scarce resource, sink bandwidth. Write tmp + rename: a
            # concurrently-retried task never exposes a half-written file
            final = os.path.join(d, f"{name}.parquet")
            tmp = final + f".tmp-{os.getpid()}"
            pq.write_table(sub, tmp, compression="zstd",
                           compression_level=3)
            os.replace(tmp, final)
            rows_p.append(p)
            rows_s.append(s)
            rows_n.append(sub.num_rows)
        return pa.table({"part": pa.array(rows_p, pa.string()),
                         "sink": pa.array(rows_s, pa.string()),
                         "n": pa.array(rows_n, pa.int64())})

    return write_batch


def run_flagship(sf_dir: str, out_dir: str, *, resume: bool = True,
                 group_size: int = 4) -> dict:
    """Full pipeline with partitioned sink writes, per-sink counts, and
    per-partition lineage manifests.

    The unit of resume is an input partition = a group of input files. ALL
    pending partitions run as ONE streaming Ray Data job (no per-partition
    scheduling overhead): each row carries a ``part`` column derived from
    its input file path, and the fused ``make_sink_writer`` stage fans the
    whole input out to ``out_dir/parts/part=<pid>/sink=<s>/`` in one pass
    (content-digest file names make task retries overwrite, not
    duplicate). Manifests are committed per partition only after the write
    succeeds; on resume, completed partitions are skipped (their files are
    not even read) — a manifest whose recorded input list no longer
    matches the current file-group assignment is treated as pending and
    rebuilt — and directories of interrupted partitions are removed and
    rebuilt. Idempotent, at-least-once -> exactly-once output; the batch
    analogue of the collector's offset checkpointing
    (pkg/stanza/adapter/receiver.go:42-45).

    Returns {rows_in, sink_counts, wall_time_sec, skipped, partitions}.
    """
    import shutil

    t0 = time.time()
    path = ensure_transcripts(sf_dir)
    store = ManifestStore(out_dir)
    frags = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet"))
    groups = [frags[i:i + group_size] for i in range(0, len(frags), group_size)]
    part_ids = [f"{i:04d}" for i in range(len(groups))]
    pending = set(store.pending(part_ids) if resume else part_ids)
    # a committed manifest is only trusted if its recorded inputs still
    # match this run's file-group assignment (changed input set or
    # group_size would otherwise silently skip the wrong data)
    for pid, files in zip(part_ids, groups):
        if pid in pending:
            continue
        m = store.load(pid)
        if m is None or m.inputs != files:
            pending.add(pid)
    skipped = sorted(set(part_ids) - pending)
    parts_dir = os.path.join(out_dir, "parts")

    total_counts: dict[str, int] = {}
    rows_total = 0
    for m in (store.load(p) for p in skipped):
        rows_total += m.rows_in
        for k, v in m.sink_counts.items():
            total_counts[k] = total_counts.get(k, 0) + v

    pending_files = []
    file_to_pid: dict[str, str] = {}
    for pid, files in zip(part_ids, groups):
        if pid in pending:
            part_dir = os.path.join(parts_dir, f"part={pid}")
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)  # incomplete previous attempt
            pending_files.extend(files)
            for f in files:
                file_to_pid[f] = pid

    if pending_files:
        paths = pa.array(list(file_to_pid.keys()), pa.string())
        pids = pa.array(list(file_to_pid.values()), pa.string())

        def tag_partition(batch: pa.Table) -> pa.Table:
            p = batch["path"]
            if isinstance(p, pa.ChunkedArray):
                p = p.combine_chunks()
            part = pc.take(pids, pc.index_in(p, value_set=paths))
            return batch.drop_columns(["path"]).append_column("part", part)

        ds = _read_transcripts(pending_files, include_paths=True)
        ds = ds.map_batches(tag_partition, batch_format="pyarrow",
                            batch_size=None)
        ds = _transform(ds)
        # fused fan-out write: one pass, counts returned by the sink stage
        counts = ds.map_batches(make_sink_writer(parts_dir),
                                batch_format="pyarrow",
                                batch_size=None).to_pandas()

        wall = time.time() - t0
        per_part: dict[str, dict[str, int]] = {}
        for p, s, n in zip(counts["part"], counts["sink"], counts["n"]):
            per_part.setdefault(p, {})
            per_part[p][s] = per_part[p].get(s, 0) + int(n)
        for pid, files in zip(part_ids, groups):
            if pid not in pending:
                continue
            sink_counts = per_part.get(pid, {})
            rows_in = sum(sink_counts.values())
            rows_total += rows_in
            for k, v in sink_counts.items():
                total_counts[k] = total_counts.get(k, 0) + v
            store.commit(PartitionManifest(
                partition_id=pid, inputs=files, rows_in=rows_in,
                rows_out=rows_in, sink_counts=sink_counts,
                wall_time_sec=wall / max(1, len(pending))))

    return {"rows_in": rows_total, "sink_counts": total_counts,
            "skipped": skipped, "partitions": len(groups),
            "wall_time_sec": time.time() - t0}
