"""Raw-text source (filelog input form) + empty-input robustness across all
major stages."""

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.expr import col
from opentelemetry_collector_contrib_ray.model import TRANSCRIPT_SCHEMA
from opentelemetry_collector_contrib_ray.sources.textlogs import (
    read_text_logs,
    write_text_fixture,
)
from opentelemetry_collector_contrib_ray.stages.aggregate import (
    count_by,
    dedup_counts,
    sum_by,
)
from opentelemetry_collector_contrib_ray.stages.parse import (
    parse_transcript_batch,
)
from opentelemetry_collector_contrib_ray.stages.route import (
    flagship_route_table,
)

SF = "/root/testdata/sf0.001"


def test_text_source_roundtrip(tmp_path):
    """Same lines through the text path parse identically to the parquet
    path (per-line text equality + same parse results)."""
    d = write_text_fixture(SF, str(tmp_path / "logs"))
    ds = read_text_logs(d)
    parsed = ds.map_batches(parse_transcript_batch, batch_format="pyarrow",
                            batch_size=None)
    got = parsed.to_pandas()

    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        ensure_transcripts,
    )
    want = ray.data.read_parquet(ensure_transcripts(SF)) \
        .map_batches(parse_transcript_batch, batch_format="pyarrow",
                     batch_size=None).to_pandas()
    assert len(got) == len(want)
    a = got.sort_values(["text", "template"], ignore_index=True)
    b = want.sort_values(["text", "template"], ignore_index=True)
    assert a["text"].equals(b["text"])
    assert a["template"].equals(b["template"])
    assert a["severity_number"].equals(b["severity_number"])
    assert got["source_file"].str.endswith(".log").all()


def _empty_ds():
    return ray.data.from_arrow(TRANSCRIPT_SCHEMA.empty_table())


def test_empty_input_through_parse_route():
    ds = _empty_ds()
    out = ds.map_batches(parse_transcript_batch, batch_format="pyarrow",
                         batch_size=None) \
        .map_batches(flagship_route_table(), batch_format="pyarrow",
                     batch_size=None)
    df = out.to_pandas()
    # Ray drops empty blocks entirely (no schema propagation) — the
    # contract is simply: no crash, zero rows
    assert len(df) == 0


def test_empty_input_through_aggregates():
    ds = _empty_ds()
    assert len(count_by(ds, ["role"], count_col="n").to_pandas()) == 0
    assert len(sum_by(ds, ["role"], "turn_idx", sum_col="s").to_pandas()) == 0
    assert len(dedup_counts(ds, ["role"], ts_col="ts").to_pandas()) == 0


def test_empty_input_through_recombine_and_sessionize():
    from opentelemetry_collector_contrib_ray.stages.recombine import (
        recombine_blocks,
    )
    from opentelemetry_collector_contrib_ray.stages.sessionize import (
        sessionize,
    )
    assert recombine_blocks(_empty_ds()).to_pandas().empty
    t = pa.table({"user_id": pa.array([], pa.int64()),
                  "ts": pa.array([], pa.timestamp("us"))})
    assert sessionize(ray.data.from_arrow(t), key_col="user_id").to_pandas() \
        .empty


def test_filter_to_empty_then_aggregate():
    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        ensure_transcripts,
    )
    ds = ray.data.read_parquet(ensure_transcripts(SF))
    ds = ds.map_batches(
        lambda b: b.filter((col("role") == "nonexistent").mask(b)),
        batch_format="pyarrow", batch_size=None)
    out = count_by(ds, ["role"], count_col="n").to_pandas()
    assert len(out) == 0


def test_journald_source_roundtrip(ray_session, tmp_path):
    import json

    import ray.data

    from opentelemetry_collector_contrib_ray.sources.journald import (
        journald_parse,
        read_journald,
    )

    recs = [
        {"__REALTIME_TIMESTAMP": "1700000000000000", "MESSAGE": "hello\nworld",
         "PRIORITY": "3", "_SYSTEMD_UNIT": "app.service", "_HOSTNAME": "h1"},
        {"__REALTIME_TIMESTAMP": "1700000001000000", "MESSAGE": "ok",
         "PRIORITY": "6", "_SYSTEMD_UNIT": "db.service", "_HOSTNAME": "h2"},
    ]
    f = tmp_path / "x.journal.json"
    f.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    out = read_journald(str(tmp_path)).to_pandas().sort_values("ts")
    assert list(out.body) == ["hello\nworld", "ok"]
    assert list(out.unit) == ["app.service", "db.service"]
    assert list(out.priority) == [3, 6]
    # PRIORITY 3 = err -> severity 17; 6 = info -> 9 (syslog table)
    assert list(out.severity_number) == [17, 9]
    assert list(out.severity_text) == ["err", "info"]
    # direct parse fn on a one-line batch
    import pyarrow as pa
    t = journald_parse(pa.table({"text": [json.dumps(recs[1])]}))
    assert t["host"].to_pylist() == ["h2"]
