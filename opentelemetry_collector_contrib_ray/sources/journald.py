"""journald source — the journaldreceiver's input form (SURVEY.md §2.1).

The reference shells out to ``journalctl -o json`` and parses one JSON
object per line (receiver/journaldreceiver): fields like
``__REALTIME_TIMESTAMP`` (decimal string, µs epoch), ``MESSAGE``,
``PRIORITY`` (syslog 0-7), ``_SYSTEMD_UNIT``, ``_HOSTNAME``. Batch
mapping: ``ray.data.read_text`` over exported .journal.json files, then
one vectorized parse stage (polars JSON path kernels) producing the
typed envelope: ts, body, unit, host, priority + the syslog severity
mapping (the same table the syslog parser uses).

``write_journald_fixture`` materializes the transcript turns as a
deterministic journald-JSON corpus so the source is testable against the
same oracle semantics.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..model import SYSLOG_SEVERITY, SYSLOG_SEVERITY_TEXT
from .transcripts import ensure_transcripts

_SEV = pa.array(SYSLOG_SEVERITY, pa.int32())
_SEV_TEXT = pa.array(SYSLOG_SEVERITY_TEXT, pa.string())


def write_journald_fixture(sf_dir: str, out_dir: str) -> str:
    """Dump transcript turns as journald-export JSON lines (one file per
    parquet part): MESSAGE=text, PRIORITY=turn_idx%8,
    __REALTIME_TIMESTAMP=µs epoch of ts, _SYSTEMD_UNIT from the role."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    src = ensure_transcripts(sf_dir)
    for name in sorted(os.listdir(src)):
        if not name.endswith(".parquet"):
            continue
        out = os.path.join(out_dir, name.replace(".parquet", ".journal.json"))
        if os.path.exists(out):
            continue
        t = pq.read_table(os.path.join(src, name),
                          columns=["conv_id", "turn_idx", "role", "text",
                                   "ts"])
        ts_us = pc.cast(t["ts"], pa.int64()).to_pylist()
        # unique tmp per writer: concurrent builders must not truncate
        # each other's half-written file (os.replace is last-wins)
        tmp = f"{out}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            for cid, idx, role, text, us in zip(
                    t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
                    t["role"].to_pylist(), t["text"].to_pylist(), ts_us):
                rec = {
                    "__REALTIME_TIMESTAMP": str(us),
                    "MESSAGE": text,
                    "PRIORITY": str(idx % 8),
                    "_SYSTEMD_UNIT": f"{role}.service",
                    "_HOSTNAME": cid,
                }
                f.write(json.dumps(rec, separators=(",", ":")) + "\n")
        os.replace(tmp, out)
    return out_dir


def journald_parse(batch: pa.Table) -> pa.Table:
    """One JSON-lines batch -> typed journald envelope columns."""
    import polars as pl

    s = pl.from_arrow(batch["text"])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()

    def path(p: str) -> pa.Array:
        a = s.str.json_path_match(p).to_arrow()
        return pc.cast(a, pa.string())

    us = pc.cast(path("$.__REALTIME_TIMESTAMP"), pa.int64())
    pri = pc.cast(path("$.PRIORITY"), pa.int32())
    sev_idx = pc.bit_wise_and(pri, 7)
    return pa.table({
        "ts": pc.cast(us, pa.timestamp("us")),
        "body": path("$.MESSAGE"),
        "unit": path("$._SYSTEMD_UNIT"),
        "host": path("$._HOSTNAME"),
        "priority": pri,
        "severity_number": pc.coalesce(pc.take(_SEV, sev_idx),
                                       pa.scalar(0, pa.int32())),
        "severity_text": pc.coalesce(pc.take(_SEV_TEXT, sev_idx),
                                     pa.scalar("")),
    })


def read_journald(paths: str | list[str]) -> ray.data.Dataset:
    """journald-export JSON lines -> typed Dataset (ts, body, unit, host,
    priority, severity_number, severity_text)."""
    ds = ray.data.read_text(paths, file_extensions=["json"])
    return ds.map_batches(journald_parse, batch_format="pyarrow",
                          batch_size=None)
