"""Raw text-line log source — the filelog receiver's input form (SURVEY.md
§2.1: tail files matching globs -> lines -> stanza parser DAG).

Batch mapping: ``ray.data.read_text`` over file globs (one row per line,
Ray handles splitting/parallelism), then the same vectorized parse stages
as the Parquet path. Include/exclude globs map to the path list; the
fingerprint/offset machinery maps to the partition manifests (state/).

``write_text_fixture`` materializes transcript text into plain .log files
(one per conversation group) so the text path is testable end-to-end
against the same oracle semantics.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from .transcripts import ensure_transcripts


def write_text_fixture(sf_dir: str, out_dir: str) -> str:
    """Dump the transcript `text` column into .log files (one per parquet
    part, order preserved) — a deterministic raw-log corpus."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    src = ensure_transcripts(sf_dir)
    for name in sorted(os.listdir(src)):
        if not name.endswith(".parquet"):
            continue
        out = os.path.join(out_dir, name.replace(".parquet", ".log"))
        if os.path.exists(out):
            continue
        t = pq.read_table(os.path.join(src, name), columns=["text"])
        # unique tmp per writer (concurrent builders; last os.replace wins)
        tmp = f"{out}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            for line in t["text"].to_pylist():
                f.write(line.replace("\n", "\\n") + "\n")
        os.replace(tmp, out)
    return out_dir


def read_text_logs(paths: str | list[str],
                   file_extensions: list[str] | None = None) -> ray.data.Dataset:
    """Raw lines -> Dataset with a single `text` column (+ file path),
    ready for the parse stages. ``paths`` is a directory or file list (the
    include-glob maps to ``file_extensions``; read_text has no glob
    support)."""
    ds = ray.data.read_text(paths, include_paths=True,
                            file_extensions=file_extensions or ["log"])

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "text": batch["text"],
            "source_file": batch["path"],
        })

    return ds.map_batches(shape, batch_format="pyarrow", batch_size=None)
