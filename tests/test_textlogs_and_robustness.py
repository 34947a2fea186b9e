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
    ds = read_text_logs(d, preserve_leading_whitespaces=True,
                        preserve_trailing_whitespaces=True)
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


# ---------------------------------------------------------------------------
# pkg/stanza/split/split_test.go replay over the batch split_tokens
# (whole-buffer model: flush_at_eof=False reproduces the streaming steps,
# flush_at_eof=True adds the EOF flush token)
# ---------------------------------------------------------------------------

def _split(data, start=None, end=None, omit=False, flush=False, enc="utf-8"):
    import re as _re
    from opentelemetry_collector_contrib_ray.sources.textlogs import (
        split_tokens)
    return split_tokens(
        data,
        line_start_re=_re.compile(start.encode(enc), _re.M) if start else None,
        line_end_re=_re.compile(end.encode(enc), _re.M) if end else None,
        omit_pattern=omit, flush_at_eof=flush)


def test_split_line_start_cases():
    # OneLogSimple / OmitPattern
    assert _split(b"LOGSTART 123 log1LOGSTART 123 a", start=r"LOGSTART \d+ ") \
        == [b"LOGSTART 123 log1"]
    assert _split(b"LOGSTART 123 log1LOGSTART 123 a", start=r"LOGSTART \d+ ",
                  omit=True) == [b"log1"]
    # TwoLogsSimple
    assert _split(b"LOGSTART 123 log1 LOGSTART 234 log2 LOGSTART 345 foo",
                  start=r"LOGSTART \d+ ") \
        == [b"LOGSTART 123 log1 ", b"LOGSTART 234 log2 "]
    # TwoLogsLineStart (anchored, multiline)
    assert _split(b"LOGSTART 123 LOGSTART 345 log1\nLOGSTART 234 log2\n"
                  b"LOGSTART 345 foo", start=r"^LOGSTART \d+ ") \
        == [b"LOGSTART 123 LOGSTART 345 log1\n", b"LOGSTART 234 log2\n"]
    # NoMatches
    assert _split(b"file that has no matches in it",
                  start=r"LOGSTART \d+ ") == []
    # PrecedingNonMatches
    assert _split(b"part that doesn't match LOGSTART 123 part that matches"
                  b"LOGSTART 123 foo", start=r"LOGSTART \d+ ") \
        == [b"part that doesn't match ", b"LOGSTART 123 part that matches"]
    # FlushAtEOFNoMatch / MatchThenNoMatch
    assert _split(b"LOGPART log1\nLOGPART log1\t   \n",
                  start=r"^LOGSTART \d+ ", flush=True) \
        == [b"LOGPART log1\nLOGPART log1\t   \n"]
    assert _split(b"LOGSTART 12 log1\t  \nLOGPART log1\nLOGPART log1\t   \n"
                  b"LOGSTART 17 log2\nLOGPART log2\nanother line",
                  start=r"^LOGSTART \d+ ", flush=True) \
        == [b"LOGSTART 12 log1\t  \nLOGPART log1\nLOGPART log1\t   \n",
            b"LOGSTART 17 log2\nLOGPART log2\nanother line"]


def test_split_line_end_cases():
    assert _split(b"log1 LOGEND LOGEND\nlog2 LOGEND\n", end=r"LOGEND$") \
        == [b"log1 LOGEND LOGEND", b"\nlog2 LOGEND"]
    assert _split(b"log1 LOGEND LOGEND\nlog2 LOGEND\n", end=r"LOGEND$",
                  omit=True) == [b"log1 LOGEND ", b"\nlog2 "]
    assert _split(b"file that has no matches in it", end=r"LOGEND \d+ ") == []
    assert _split(b"part that matches LOGEND 123 part that doesn't match",
                  end=r"LOGEND \d+ ") == [b"part that matches LOGEND 123 "]
    assert _split(b"part that matches LOGEND 123 part that doesn't match",
                  end=r"LOGEND \d+ ", omit=True) == [b"part that matches "]
    # MultiplesplitLogs
    assert _split(b"LOGSTART 12 log1\t  \nLOGPART log1\nLOGEND log1\t   \n"
                  b"LOGSTART 17 log2\nLOGPART log2\nLOGEND log2\n"
                  b"LOGSTART 43 log5", end=r"^LOGEND.*\n") \
        == [b"LOGSTART 12 log1\t  \nLOGPART log1\nLOGEND log1\t   \n",
            b"LOGSTART 17 log2\nLOGPART log2\nLOGEND log2\n"]
    # FlushAtEOFNoMatch
    assert _split(b"LOGPART log1\nLOGPART log1\t   \n",
                  end=r"^LOGSTART \d+", flush=True) \
        == [b"LOGPART log1\nLOGPART log1\t   \n"]


def test_split_newline_cases():
    assert _split(b"") == []
    assert _split(b"my log\n") == [b"my log"]
    assert _split(b"my log\r\n") == [b"my log"]
    assert _split(b"log1\nlog2\n") == [b"log1", b"log2"]
    assert _split(b"log1\r\nlog2\r\n") == [b"log1", b"log2"]
    assert _split(b"foo") == []                       # NoTailingNewline
    assert _split(b"foo", flush=True) == [b"foo"]     # FlushAtEOF
    assert _split(b"LOGEND 333\n\nAnother one") == [b"LOGEND 333", b""]
    assert _split(b"\nLOGEND 333\nAnother one") == [b"", b"LOGEND 333"]
    assert _split(b"log1\nlog2", flush=True) == [b"log1", b"log2"]


def test_read_text_logs_multiline_and_encoding(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.sources.textlogs import (
        read_text_logs)
    # multiline: line_start_pattern groups continuation lines
    p = tmp_path / "multi.log"
    p.write_bytes(b"LOGSTART 1 first\n  part a\n  part b\n"
                  b"LOGSTART 2 second\n  tail\n")
    out = read_text_logs(str(p), line_start_pattern=r"^LOGSTART \d+ ") \
        .to_pandas().sort_values("text", ignore_index=True)
    assert list(out.text) == ["LOGSTART 1 first\n  part a\n  part b",
                              "LOGSTART 2 second\n  tail"]
    # latin-1 decode
    q = tmp_path / "latin.log"
    q.write_bytes("café résumé\nüber\n".encode("latin-1"))
    out2 = read_text_logs(str(q), encoding="latin-1") \
        .to_pandas().sort_values("text", ignore_index=True)
    assert list(out2.text) == ["café résumé", "über"]
    # utf-16le with record numbers
    r = tmp_path / "wide.log"
    r.write_bytes("one\ntwo\n".encode("utf-16-le"))
    out3 = read_text_logs(str(r), encoding="utf-16-le",
                          include_file_record_number=True).to_pandas() \
        .sort_values("log.file.record_number", ignore_index=True)
    assert list(out3.text) == ["one", "two"]
    assert list(out3["log.file.record_number"]) == [1, 2]
    # nop encoding: raw byte chunks
    s = tmp_path / "raw.bin"
    s.write_bytes(b"abcdefghij")
    out4 = read_text_logs(str(s), file_extensions=["bin"], encoding="nop",
                          max_log_size=4).to_pandas()
    assert [bytes(b) for b in out4.text] == [b"abcd", b"efgh", b"ij"]


def test_read_text_logs_trim_and_max_size(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.sources.textlogs import (
        read_text_logs)
    p = tmp_path / "trim.log"
    p.write_bytes(b"  padded line \t\nplain\n")
    out = read_text_logs(str(p), include_file_record_number=True) \
        .to_pandas().sort_values("log.file.record_number",
                                 ignore_index=True)
    assert list(out.text) == ["padded line", "plain"]
    out2 = read_text_logs(str(p), include_file_record_number=True,
                          preserve_leading_whitespaces=True,
                          preserve_trailing_whitespaces=True).to_pandas() \
        .sort_values("log.file.record_number", ignore_index=True)
    assert list(out2.text) == ["  padded line \t", "plain"]
    # ToLength: byte truncation before decode
    out3 = read_text_logs(str(p), max_log_size=6,
                          include_file_record_number=True).to_pandas() \
        .sort_values("log.file.record_number", ignore_index=True)
    assert list(out3.text) == ["padd", "plain"]
