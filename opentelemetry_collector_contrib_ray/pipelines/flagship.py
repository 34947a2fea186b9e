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
from ..stages.enrich import BroadcastLookupEnricher, flagship_enrich_spec
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


def _transform(ds: ray.data.Dataset, *, concurrency=None) -> ray.data.Dataset:
    """parse -> severity bucket -> enrich (actor pool) -> route.

    batch_size=None = one batch per block (zero-copy Arrow, no re-chunking);
    every stage is a vectorized whole-column kernel, so bigger is better.
    """
    ds = ds.map_batches(parse_transcript_batch, batch_format="pyarrow",
                        batch_size=None)
    ds = ds.map_batches(add_severity_bucket, batch_format="pyarrow",
                        batch_size=None)
    spec = flagship_enrich_spec(use_object_store=ray.is_initialized())
    ds = ds.map_batches(
        BroadcastLookupEnricher,
        fn_constructor_args=(spec,),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency or (2, 8),
    )
    ds = ds.map_batches(flagship_route_table(), batch_format="pyarrow",
                        batch_size=None)
    return ds


def build_parsed(sf_dir: str, *, concurrency=None) -> ray.data.Dataset:
    """Lazy Dataset: transcripts parsed + enriched + routed (no sink writes)."""
    path = ensure_transcripts(sf_dir)
    return _transform(ray.data.read_parquet(path), concurrency=concurrency)


def _counts_from_metadata(parts_dir: str) -> dict[str, dict[str, int]]:
    """{part_id: {sink: rows}} from Parquet footers only (no data read)."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, int]] = {}
    if not os.path.isdir(parts_dir):
        return out
    for pname in sorted(os.listdir(parts_dir)):
        if not pname.startswith("part="):
            continue
        pid = pname[len("part="):]
        sinks: dict[str, int] = {}
        pdir = os.path.join(parts_dir, pname)
        for sname in sorted(os.listdir(pdir)):
            if not sname.startswith("sink="):
                continue
            sdir = os.path.join(pdir, sname)
            n = sum(pq.ParquetFile(os.path.join(sdir, f)).metadata.num_rows
                    for f in os.listdir(sdir) if f.endswith(".parquet"))
            sinks[sname[len("sink="):]] = n
        out[pid] = sinks
    return out


def run_flagship(sf_dir: str, out_dir: str, *, resume: bool = True,
                 group_size: int = 4) -> dict:
    """Full pipeline with partitioned sink writes, per-sink counts, and
    per-partition lineage manifests.

    The unit of resume is an input partition = a group of input files. ALL
    pending partitions run as ONE streaming Ray Data job (no per-partition
    scheduling overhead): each row carries a ``part`` column derived from its
    input file path, and a single ``write_parquet(partition_cols=[part,
    sink])`` call fans the whole input out to
    ``out_dir/parts/part=<pid>/sink=<s>/`` in one pass. Manifests are
    committed per partition only after the write succeeds; on resume,
    completed partitions are skipped (their files are not even read) and
    directories of interrupted partitions are removed and rebuilt —
    idempotent, at-least-once -> exactly-once output. This is the batch
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

        ds = ray.data.read_parquet(pending_files, include_paths=True)
        ds = ds.map_batches(tag_partition, batch_format="pyarrow",
                            batch_size=None)
        ds = _transform(ds)
        # one partitioned write = the whole fan-out in a single pass
        ds.write_parquet(parts_dir, partition_cols=["part", "sink"])

        wall = time.time() - t0
        per_part = _counts_from_metadata(parts_dir)
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
