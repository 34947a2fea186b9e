"""Driver-facing query catalogue: Ray pipelines + matching DuckDB oracle SQL.

Each entry re-expresses one reference component (SURVEY.md §2) over either the
deterministic transcript table (flagship input, BASELINE.json input_hint) or
the driver's testdata tables. The oracle SQL strings are the independent
semantic spec: same column NAMES, same values, order-insensitive.

Transcript queries read our deterministic cached Parquet via
``read_parquet('<path>/*.parquet')`` directly in SQL (the transcripts are not
among the driver's pre-registered views); ``oracle_sql()`` ensures the sf0.01
cache exists before returning.
"""

from __future__ import annotations

import os

import numpy as np

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..expr import col
from ..sources.tables import read_table
from ..sources.transcripts import ensure_transcripts
from ..stages.aggregate import count_by, dedup_counts, sum_by
from ..stages.shuffle import actor_pool_size
from .flagship import build_parsed

PARSED_COLS = [
    "conv_id", "turn_idx", "template", "severity_number", "severity_text",
    "http_status", "http_method", "http_path", "log_level", "error_code",
    "latency_ms", "msg", "syslog_pri", "syslog_host", "syslog_app", "rc",
    "tool_attr",
]

# ---------------------------------------------------------------------------
# Gate-sweep memo: the driver's correctness sweep calls every queries() entry
# in ONE process at sf=0.01; without sharing, the parse chain re-executes
# ~20x and the near-dup pair join 3x, which alone pushed the official sweep
# past its budget (CORRECTNESS_r03/r04 recorded {}). Inputs small enough for
# the gate (< _MEMO_MAX_BYTES on disk) are materialized once per process and
# reused; anything larger (bench at sf>=0.1, production) keeps the streaming
# plan untouched. A MaterializedDataset is safely consumable many times.
# ---------------------------------------------------------------------------
_MEMO: dict = {}
_MEMO_MAX_BYTES = 8 << 20


def _input_bytes(path: str) -> int:
    if os.path.isdir(path):
        return sum(os.path.getsize(os.path.join(path, f))
                   for f in os.listdir(path))
    return os.path.getsize(path)


def _memo_ds(key: tuple, path: str, build):
    """Materialize-and-share ``build()`` when ``path`` is gate-scale."""
    if _input_bytes(path) > _MEMO_MAX_BYTES:
        return build()
    if key not in _MEMO:
        _MEMO[key] = build().materialize()
    return _MEMO[key]


def _parsed(sf_dir: str):
    """Shared parse->enrich->route dataset (build_parsed, memoized)."""
    return _memo_ds(("parsed", sf_dir), ensure_transcripts(sf_dir),
                    lambda: build_parsed(sf_dir))


def _docs(sf_dir: str):
    """Shared documents (doc_id, text) read (memoized)."""
    path = f"{sf_dir}/documents.parquet"
    return _memo_ds(("docs", sf_dir), path,
                    lambda: read_table(path, columns=["doc_id", "text"]))


def _emb(sf_dir: str, with_label: bool = False):
    """Shared embeddings read (memoized)."""
    path = f"{sf_dir}/embeddings.parquet"
    cols = ["vec_id", "embedding"] + (["label"] if with_label else [])
    return _memo_ds(("emb", sf_dir, with_label), path,
                    lambda: read_table(path, columns=cols))


def _tbl(sf_dir: str, name: str, cols: tuple[str, ...]):
    """Shared testdata-table read (memoized per column set so output
    schemas stay exactly as pruned)."""
    path = f"{sf_dir}/{name}.parquet"
    return _memo_ds((name, sf_dir, cols), path,
                    lambda: read_table(path, columns=list(cols)))

# The oracle re-derives the parse in SQL. DuckDB's regexp_extract uses RE2 —
# the same engine family as pyarrow's extract_regex — so the patterns are
# shared verbatim (parse.py APACHE_RE etc. minus the named groups).
_AP = (r'^(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}) - (\S+) '
       r'\[([^\]]+)\] "([A-Z]+) (\S+) HTTP/1\.1" '
       r'(\d{3}) (\d+)$')
_KV = (r'^level=(\w+) code=(\S+) latency_ms=(\d+) '
       r'msg="([^"]*)" tool=(\w*)$')
_JS = (r'^\{"severity":"([A-Z]+)","error":\{"code":"([^"]+)",'
       r'"retryable":(true|false)\},"dur":"([0-9.]+)s"')
_SY = (r'^<(\d{1,3})>1 (\S+) (\S+) (\S+) '
       r'(\d+) (\S+) - tool=(\w+) rc=(\d+)$')

# severity alias mapping (model.default_severity_mapping) as SQL CASE pieces;
# generated once here so Ray and SQL share one source of truth.


def _sql_severity_map_case(token_expr: str) -> str:
    from ..model import default_severity_mapping
    whens = "\n      ".join(
        f"WHEN '{k}' THEN {v}" for k, v in default_severity_mapping().items())
    return f"(CASE lower({token_expr}) {whens} ELSE NULL END)"


def _sql_severity_name(num_expr: str) -> str:
    from ..model import SEVERITY_NAMES
    whens = "\n      ".join(
        f"WHEN {n} THEN '{t}'" for n, t in SEVERITY_NAMES.items())
    return f"(CASE {num_expr} {whens} ELSE NULL END)"


def _transcripts_glob(sf_dir: str = "/root/testdata/sf0.01") -> str:
    return ensure_transcripts(sf_dir) + "/*.parquet"


def parsed_view_sql(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """A SQL CTE body reproducing parse_transcript_batch + severity_bucket +
    enrichment + routing over the transcript parquet. The single source of
    oracle truth for all flagship queries.

    ``m``/``parsed`` are MATERIALIZED: DuckDB inlines CTEs by default, and
    a downstream filter (filter_errors, exceptions) then re-evaluates the
    four regex extracts per reference — 4-6 s per oracle vs ~0.4 s
    materialized (measured at sf0.01); the driver runs ~20 oracles over
    this view in one sweep."""
    glob = _transcripts_glob(sf_dir)
    sevmap_kv = _sql_severity_map_case("m_kv[1]")
    sevmap_js = _sql_severity_map_case("m_js[1]")
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         regexp_extract_all(text, '{_AP}') AS g_ap,
         regexp_extract_all(text, '{_KV}') AS g_kv,
         regexp_extract_all(text, '{_JS}') AS g_js,
         regexp_extract_all(text, '{_SY}') AS g_sy,
         regexp_matches(text, '^Traceback ') AS tb_head,
         regexp_matches(text, '^\\s') AS tb_cont
  FROM read_parquet('{glob}')
), m AS MATERIALIZED (
  SELECT *,
    CASE WHEN len(g_ap)>0 THEN regexp_extract(text, '{_AP}',
      ['ip','m_user','ats','method','path','status','bytes']) END AS m_ap_s,
    CASE WHEN len(g_kv)>0 THEN regexp_extract(text, '{_KV}',
      ['level','code','latency','msg','tool']) END AS m_kv_s,
    CASE WHEN len(g_js)>0 THEN regexp_extract(text, '{_JS}',
      ['sev','code','retryable','dur']) END AS m_js_s,
    CASE WHEN len(g_sy)>0 THEN regexp_extract(text, '{_SY}',
      ['pri','sts','host','app','pid','msgid','tool','rc']) END AS m_sy_s
  FROM raw
), f AS (
  SELECT conv_id, turn_idx, role, text, tool, ts, tb_head, tb_cont,
    len(g_ap)>0 AS ap_ok, len(g_kv)>0 AS kv_ok,
    len(g_js)>0 AS js_ok, len(g_sy)>0 AS sy_ok,
    m_ap_s.ip AS ap_ip,
    m_ap_s.method AS ap_method, m_ap_s.path AS ap_path,
    CAST(m_ap_s.status AS INTEGER) AS ap_status,
    [m_kv_s.level, m_kv_s.code, m_kv_s.latency, m_kv_s.msg, m_kv_s.tool] AS m_kv,
    [m_js_s.sev, m_js_s.code, m_js_s.retryable, m_js_s.dur] AS m_js,
    [m_sy_s.pri, m_sy_s.sts, m_sy_s.host, m_sy_s.app, m_sy_s.pid,
     m_sy_s.msgid, m_sy_s.tool, m_sy_s.rc] AS m_sy
  FROM m
), sev AS (
  SELECT *,
    CASE WHEN ap_ok THEN
      CASE ap_status // 100 WHEN 2 THEN 9 WHEN 3 THEN 10
           WHEN 4 THEN 13 WHEN 5 THEN 17 ELSE NULL END
    END AS sev_ap,
    CASE WHEN kv_ok THEN {sevmap_kv} END AS sev_kv,
    CASE WHEN js_ok THEN {sevmap_js} END AS sev_js,
    CASE WHEN sy_ok THEN
      list_value(21,19,18,17,13,10,9,5)[(CAST(m_sy[1] AS INTEGER) % 8) + 1]
    END AS sev_sy,
    CASE WHEN tb_head THEN 17 END AS sev_tb
  FROM f
), parsed AS MATERIALIZED (
  SELECT conv_id, turn_idx, role, tool, ts, text,
    CASE WHEN ap_ok THEN 'apache' WHEN kv_ok THEN 'kv' WHEN js_ok THEN 'json'
         WHEN sy_ok THEN 'syslog' WHEN tb_head THEN 'traceback'
         WHEN tb_cont THEN 'traceback_cont' ELSE 'plain' END AS template,
    COALESCE(sev_ap, sev_kv, sev_js, sev_sy, sev_tb, 0) AS severity_number,
    ap_ip AS client_ip,
    ap_status AS http_status, ap_method AS http_method, ap_path AS http_path,
    m_kv[1] AS log_level, COALESCE(m_kv[2], m_js[2]) AS error_code,
    CAST(m_kv[3] AS BIGINT) AS latency_ms, m_kv[4] AS msg,
    CAST(m_sy[1] AS INTEGER) AS syslog_pri, m_sy[3] AS syslog_host,
    m_sy[4] AS syslog_app, CAST(m_sy[8] AS INTEGER) AS rc,
    COALESCE(m_kv[5], m_sy[7]) AS tool_attr,
    sev_ap, sev_kv, sev_js, sev_sy, sev_tb, sy_ok, tb_head
  FROM sev
), enriched AS (
  SELECT *,
    COALESCE(CASE WHEN sev_ap IS NOT NULL THEN {_sql_severity_name("sev_ap")}
                  END,
             CASE WHEN sev_kv IS NOT NULL THEN {_sql_severity_name("sev_kv")}
                  END,
             CASE WHEN sev_js IS NOT NULL THEN {_sql_severity_name("sev_js")}
                  END,
             CASE WHEN sy_ok THEN
               list_value('emerg','alert','crit','err','warning','notice',
                          'info','debug')[(syslog_pri % 8) + 1] END,
             CASE WHEN tb_head THEN 'error' END,
             '') AS severity_text,
    CASE WHEN severity_number >= 21 THEN 'fatal'
         WHEN severity_number >= 17 THEN 'error'
         WHEN severity_number >= 13 THEN 'warn'
         WHEN severity_number >= 9 THEN 'info'
         WHEN severity_number >= 5 THEN 'debug'
         WHEN severity_number >= 1 THEN 'trace'
         ELSE 'default' END AS severity_bucket,
    CASE role WHEN 'user' THEN 'client' WHEN 'assistant' THEN 'agent'
         WHEN 'system' THEN 'orchestrator' WHEN 'tool' THEN 'runtime'
         ELSE 'unknown' END AS service,
    CASE tool WHEN 'bash' THEN 'compute' WHEN 'search' THEN 'retrieval'
         WHEN 'browser' THEN 'web' WHEN 'editor' THEN 'workspace'
         WHEN '' THEN 'none' ELSE 'none' END AS resource
  FROM parsed
), routed AS (
  SELECT *,
    CASE WHEN severity_number >= 17 THEN 'errors'
         WHEN tool = 'bash' AND role = 'assistant' THEN 'tool-calls'
         WHEN role = 'user' THEN 'user-turns'
         ELSE 'default' END AS sink
  FROM enriched
)
"""


# ---------------------------------------------------------------------------
# Ray-side query callables
# ---------------------------------------------------------------------------

def q_parse(sf_dir: str):
    """Stanza parser chain output (regex/kv/json/syslog/severity parsers)."""
    ds = _parsed(sf_dir)
    return ds.select_columns(PARSED_COLS)


def q_route(sf_dir: str):
    """routingconnector: first-match sink assignment per turn."""
    ds = _parsed(sf_dir)
    return ds.select_columns(["conv_id", "turn_idx", "role", "tool",
                              "severity_number", "sink"])


def q_enrich(sf_dir: str):
    """k8sattributes-style broadcast enrichment columns."""
    ds = _parsed(sf_dir)
    return ds.select_columns(["conv_id", "turn_idx", "role", "service",
                              "tool", "resource"])


def q_sink_counts(sf_dir: str):
    """Per-sink routed record counts (grouping fileexporter totals)."""
    ds = _parsed(sf_dir)
    return count_by(ds, ["sink"], count_col="n")


def q_count_connector(sf_dir: str):
    """countconnector: count by (sink, tool, severity_bucket) with
    default_value '' for missing attrs (counter.go:42-73)."""
    ds = _parsed(sf_dir)
    return count_by(ds, ["sink", "tool", "severity_bucket"], count_col="n")


def q_sum_connector(sf_dir: str):
    """sumconnector: total latency_ms by (sink, tool_attr) over kv rows."""
    ds = _parsed(sf_dir)
    return sum_by(ds, ["sink", "tool_attr"], "latency_ms",
                  condition=col("template") == "kv", sum_col="latency_total")


def q_filter_errors(sf_dir: str):
    """filterprocessor: keep only error-or-worse parsed turns."""
    ds = _parsed(sf_dir)
    ds = ds.map_batches(
        lambda b: b.filter((col("severity_number") >= 17).mask(b)),
        batch_format="pyarrow")
    return ds.select_columns(["conv_id", "turn_idx", "severity_number",
                              "severity_text", "template"])


def q_filter_matchers(sf_dir: str):
    """filterprocessor declarative include/exclude matchers
    (filterconfig/config.go:22-140 + filterlog/filterlog.go:30-130):
    include regexp body + severity-min with match_undefined, exclude
    strict attribute — keep = pass include AND miss exclude."""
    from ..stages.filtermatch import (AttributeMatch, MatchProperties,
                                      filter_logs)

    include = MatchProperties(
        match_type="regexp",
        log_bodies=[r"GET|POST", r"error"],
        severity_min=9, severity_match_undefined=True)
    exclude = MatchProperties(
        match_type="strict",
        attributes=[AttributeMatch("tool", "bash")])
    ds = filter_logs(_parsed(sf_dir), include, exclude)
    return ds.select_columns(["conv_id", "turn_idx", "severity_number",
                              "tool", "template"])


def q_tail_sample(sf_dir: str):
    """tailsamplingprocessor policy vote, batch analogue
    (tailsamplingprocessor/config.go:17-45, internal/sampling/*.go):
    keep whole conversations sampled by ANY policy — and(status_code
    ERROR + span_count>=40) OR latency>=400s OR numeric_attribute
    latency_ms in [4900,5000]."""
    from ..stages.tailsample import tail_sample

    policies = [
        {"type": "and", "and_sub_policy": [
            {"type": "status_code", "status_codes": ["ERROR"]},
            {"type": "span_count", "min_spans": 40},
        ]},
        {"type": "latency", "threshold_ms": 400_000},
        {"type": "numeric_attribute", "key": "latency_ms",
         "min_value": 4900, "max_value": 5000},
    ]
    from ..stages.shuffle import dir_size_bytes
    out = tail_sample(_parsed(sf_dir), policies,
                      key_col="conv_id", ts_col="ts",
                      size_bytes=dir_size_bytes(ensure_transcripts(sf_dir)))
    return out.select_columns(["conv_id", "turn_idx", "severity_number",
                               "tool"])


def q_tail_sample_rate(sf_dir: str):
    """tailsampling rate_limiting policy (internal/sampling/
    rate_limiting.go): per-second span budget consumed by traces in
    (start_ts, key) order; three-stage plan (trace votes -> windowed
    budget -> exact reduce-side semi-join)."""
    from ..stages.tailsample import tail_sample

    from ..stages.shuffle import dir_size_bytes
    out = tail_sample(_parsed(sf_dir),
                      [{"type": "rate_limiting", "spans_per_second": 40}],
                      key_col="conv_id", ts_col="ts",
                      size_bytes=dir_size_bytes(ensure_transcripts(sf_dir)))
    return out.select_columns(["conv_id", "turn_idx"])


def q_dedup(sf_dir: str):
    """logdedupprocessor: one row per (template, severity_number, error_code)
    identity with count + first/last observed ts."""
    ds = _parsed(sf_dir)
    # identity = template x severity x code: known low cardinality -> the
    # single-task merge (wide=False) skips the fixed shuffle cost
    return dedup_counts(ds, ["template", "severity_number", "error_code"],
                        ts_col="ts", wide=False)


def _raw_transcripts(sf_dir: str):
    from ..sources.grouped import read_sized_parquet
    # data-derived block count: the default 2x-CPU heuristic makes plans
    # (and timings) a function of cluster size (sources/grouped.py)
    path = ensure_transcripts(sf_dir)
    return _memo_ds(("raw", sf_dir), path,
                    lambda: read_sized_parquet(path))


def q_recombine(sf_dir: str):
    """stanza recombine: merge indented continuation lines into the previous
    entry, per conversation (general shuffled plan)."""
    from ..stages.recombine import recombine_grouped
    from ..stages.shuffle import dir_size_bytes

    ds = _raw_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "text", "ts"])  # prune before the shuffle
    return recombine_grouped(
        ds, size_bytes=dir_size_bytes(ensure_transcripts(sf_dir)))


def q_sampler(sf_dir: str):
    """probabilisticsamplerprocessor (oracle-checkable md5 variant): keep 20%
    of conversations, deterministically by conv_id hash."""
    from ..stages.transform import md5_mod_sampler

    ds = _raw_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "tool"])
    return ds.map_batches(md5_mod_sampler(20.0, "conv_id"),
                          batch_format="pyarrow", batch_size=None)


# Synthetic incoming tvalues for the consistent-sampler queries: a spread
# of already-sampled rates (50%, 25%, ~0.2%) plus records with no
# threshold. The SAME mapping feeds the Ray shape step and the SQL oracle.
_SAMPLER_TH_IN = {"click": "8", "view": "c", "error": "ff8"}


def _consistent_sampler_query(mode: str):
    """Shared body for sampler_equalizing / sampler_proportional: events
    get a deterministic trace-id hex (md5 of event_id) and a synthetic
    incoming tvalue; the consistent sampler decides per OTEP-235."""
    from ..stages.transform import consistent_sampler

    def q(sf_dir: str):
        ds = _tbl(sf_dir, "events", ("event_id", "event_type"))

        def shape(b: pa.Table) -> pa.Table:
            import hashlib as _h
            et = b["event_type"]
            if isinstance(et, pa.ChunkedArray):
                et = et.combine_chunks()
            # one if_else pass per mapping entry (3)
            th = pa.nulls(b.num_rows, pa.string())
            for k, v in _SAMPLER_TH_IN.items():
                th = pc.if_else(pc.equal(et, k),
                                pa.scalar(v, pa.string()), th)
            eid = pc.cast(b["event_id"], pa.string())
            d = pc.dictionary_encode(eid)
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            hx = pa.array([_h.md5(v.encode()).hexdigest()
                           for v in d.dictionary.to_pylist()], pa.string())
            return pa.table({"event_id": b["event_id"],
                             "trace_hex": pc.take(hx, d.indices),
                             "th_in": th})

        ds = ds.map_batches(shape, batch_format="pyarrow", batch_size=None)
        fn = consistent_sampler(50.0, mode, "trace_hex",
                                threshold_col="th_in")
        ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
        return ds.select_columns(["event_id", "sampling_threshold"])

    return q


def _consistent_sampler_sql(mode: str) -> str:
    """Oracle: identical decision, with per-distinct-tvalue outputs
    precomputed through the SAME threshold functions."""
    from ..stages.transform import (_MAX_ADJUSTED_COUNT,
                                    probability_to_threshold,
                                    threshold_tvalue, tvalue_to_threshold)

    def decide(tv):
        t_in = tvalue_to_threshold(tv) if tv else 0
        t_cfg = probability_to_threshold(0.5, 4)
        if mode == "equalizing":
            return t_in if tv and t_cfg < t_in else t_cfg
        p_in = (_MAX_ADJUSTED_COUNT - t_in) / _MAX_ADJUSTED_COUNT \
            if tv else 1.0
        return probability_to_threshold(p_in * 0.5, 4)

    cases_t = " ".join(
        f"WHEN '{k}' THEN {decide(v)}" for k, v in _SAMPLER_TH_IN.items())
    cases_s = " ".join(
        f"WHEN '{k}' THEN '{threshold_tvalue(decide(v))}'"
        for k, v in _SAMPLER_TH_IN.items())
    t_none, s_none = decide(None), threshold_tvalue(decide(None))
    return f"""
WITH d AS (
  SELECT event_id,
         CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 19, 14))
              AS BIGINT) AS rnd,
         CASE event_type {cases_t} ELSE {t_none} END AS t_out,
         CASE event_type {cases_s} ELSE '{s_none}' END AS tv_out
  FROM events)
SELECT event_id, tv_out AS sampling_threshold
FROM d WHERE t_out <= rnd
"""


REDACT_PATTERNS = [r"E\d+", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"]


def q_redact(sf_dir: str):
    """redactionprocessor: mask error codes + IPs in text, count redactions."""
    from ..stages.transform import redact

    ds = _raw_transcripts(sf_dir).select_columns(["conv_id", "turn_idx", "text"])
    return ds.map_batches(redact(["text"], REDACT_PATTERNS),
                          batch_format="pyarrow", batch_size=None)


USER_RE = r"- (?P<user_name>\S+) \["


def q_attributes(sf_dir: str):
    """attributesprocessor action chain: extract(user from apache line) ->
    hash(sha256) -> upsert(env=prod)."""
    from ..stages.transform import attr_extract, attr_hash, attr_upsert, chain

    fn = chain(attr_extract("text", USER_RE),
               attr_hash(["user_name"], "sha256"),
               attr_upsert("env", value="prod"))
    ds = _raw_transcripts(sf_dir).select_columns(["conv_id", "turn_idx", "text"])
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None) \
        .select_columns(["conv_id", "turn_idx", "user_name", "env"])


TRANSFORM_GROUPS = [{
    "context": "log",
    "conditions": ['role == "assistant" or role == "user"'],
    "error_mode": "propagate",
    "statements": [
        'set(text_upper, ConvertCase(text, "upper")) where tool == "bash"',
        'set(text_hash, SHA256(text))',
        'set(len_flag, "long") where Len(text) > 100',
    ],
}]


def q_transform_statements(sf_dir: str):
    """transformprocessor: OTTL statement group {context, conditions,
    statements, error_mode} compiled to masked column rewrites
    (transformprocessor/internal/common/config.go:38-48,
    internal/logs/processor.go:31-77)."""
    from .statements import transform_processor

    ds = _raw_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "tool", "text"])
    ds = ds.map_batches(transform_processor(TRANSFORM_GROUPS),
                        batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["conv_id", "turn_idx", "text_upper",
                              "text_hash", "len_flag"])


def q_window_counts(sf_dir: str):
    """intervalprocessor / tumbling window: per-hour counts by event_type
    over the events stream table."""
    ds = _tbl(sf_dir, "events", ("ts", "event_type"))

    def add_window(b: pa.Table) -> pa.Table:
        return b.append_column(
            "window", pc.floor_temporal(b["ts"].combine_chunks(), unit="hour"))

    ds = ds.map_batches(add_window, batch_format="pyarrow", batch_size=None)
    # missing='skip': window/event_type are derived non-null keys; the
    # 'default' mode would widen the timestamp key to string (the string
    # default can't live in a timestamp column).
    return count_by(ds, ["window", "event_type"], count_col="n",
                    missing="skip")


def _hex_of_binary(col: pa.Array) -> pa.Array:
    """binary -> lowercase hex, per DISTINCT value (dictionary trick)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = pc.dictionary_encode(col)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    uniq = pa.array([None if v is None else v.hex()
                     for v in d.dictionary.to_pylist()], pa.string())
    return pc.take(uniq, d.indices)


def q_journald(sf_dir: str):
    """journald source (receiver/journaldreceiver): JSON-lines export ->
    typed envelope with syslog severity from PRIORITY. The fixture is the
    transcript table re-serialized as journald JSON; equality against the
    parquet side proves the source loses nothing (same contract as
    text_source)."""
    from ..sources.journald import read_journald, write_journald_fixture

    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = write_journald_fixture(sf_dir, f"/tmp/otelray_journald/{base}")
    return read_journald(d)


def q_jsonarray(sf_dir: str):
    """stanza jsonarray_parser: JSON array body -> positional columns
    (parser/jsonarray/config.go:47). The array is built from event fields,
    parsed back, and compared field-for-field."""
    from ..stages.parse import jsonarray_parser

    ds = _tbl(sf_dir, "events", ("event_id", "event_type"))

    def mk(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        eid = pc.cast(b["event_id"], pa.string())
        arr = pc.binary_join_element_wise('["', et, '",', eid, "]", "")
        return b.append_column("body", arr)

    ds = ds.map_batches(mk, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(jsonarray_parser(parse_from="body",
                                         header=["etype", "eid"]),
                        batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["event_id", "etype", "eid"])


def q_trace_parse(sf_dir: str):
    """stanza trace_parser + scope_parser: hex -> trace/span id bytes
    (parser/trace/config.go:34, helper/trace.go), field -> scope name
    (parser/scope/config.go:34). Compared via hex round-trip equality."""
    from ..stages.dedup import md5_hex
    from ..stages.parse import scope_parser, trace_parser

    ds = _raw_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role"])

    def mk_hex(b: pa.Table) -> pa.Table:
        h = md5_hex(b["conv_id"])
        b = b.append_column("trace_hex", h)
        b = b.append_column("span_hex", pc.utf8_slice_codeunits(h, 0, 16))
        return b.append_column("flags_hex",
                               pa.array(["01"] * b.num_rows, pa.string()))

    ds = ds.map_batches(mk_hex, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(
        trace_parser(trace_from="trace_hex", span_from="span_hex",
                     flags_from="flags_hex"),
        batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(scope_parser("role", "scope_name"),
                        batch_format="pyarrow", batch_size=None)

    def roundtrip(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": b["conv_id"], "turn_idx": b["turn_idx"],
            "trace_hex_rt": _hex_of_binary(b["trace_id"]),
            "span_hex_rt": _hex_of_binary(b["span_id"]),
            "trace_flags": b["trace_flags"],
            "scope_name": b["scope_name"],
        })

    return ds.map_batches(roundtrip, batch_format="pyarrow", batch_size=None)


def q_cumulative_to_delta(sf_dir: str):
    """cumulativetodeltaprocessor (config.go:31-36): per-user delta of the
    running value stream, initial_value=keep."""
    from ..stages.metrics import cumulative_to_delta
    from ..stages.shuffle import dir_size_bytes

    ds = _tbl(sf_dir, "events", ("event_id", "user_id", "ts", "value"))
    out = cumulative_to_delta(
        ds, key_col="user_id", order_col="ts", value_col="value",
        initial="keep", size_bytes=dir_size_bytes(f"{sf_dir}/events.parquet"))

    def shape(b: pa.Table) -> pa.Table:
        # half_towards_infinity == DuckDB ROUND (half away from zero)
        c = pc.cast(pc.round(pc.multiply(b["delta"], 100.0),
                             round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                         "delta_x100": c})

    return out.map_batches(shape, batch_format="pyarrow", batch_size=None)


def q_delta_to_rate(sf_dir: str):
    """deltatorateprocessor: per-user value/elapsed-seconds rate (first
    point of each series has no interval -> dropped)."""
    from ..stages.metrics import delta_to_rate
    from ..stages.shuffle import dir_size_bytes

    ds = _tbl(sf_dir, "events", ("event_id", "user_id", "ts", "value"))
    out = delta_to_rate(
        ds, key_col="user_id", order_col="ts", value_col="value",
        size_bytes=dir_size_bytes(f"{sf_dir}/events.parquet"))

    def shape(b: pa.Table) -> pa.Table:
        r = b["rate"]
        if isinstance(r, pa.ChunkedArray):
            r = r.combine_chunks()
        t = pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                      "rate": pc.round(r, ndigits=6,
                                       round_mode="half_towards_infinity")})
        return t.filter(pc.is_valid(t["rate"]))

    return out.map_batches(shape, batch_format="pyarrow", batch_size=None)


def q_metric_start_time(sf_dir: str):
    """metricstarttimeprocessor (true_reset_point): per-user series start
    timestamp = the first observed point's own timestamp, reused by every
    later point (README 'Strategy: True Reset Point')."""
    from ..stages.metrics import metric_start_time
    from ..stages.shuffle import dir_size_bytes

    ds = _tbl(sf_dir, "events", ("event_id", "user_id", "ts", "value"))
    out = metric_start_time(
        ds, key_col="user_id", order_col="ts", value_col="value",
        strategy="true_reset_point",
        size_bytes=dir_size_bytes(f"{sf_dir}/events.parquet"))
    return out.select_columns(["event_id", "user_id", "ts", "start_ts"])


def q_csv_parse(sf_dir: str):
    """stanza csv_parser (parser/csv/config.go:36-42): positional split of
    a delimiter-joined line built from customer fields."""
    from ..stages.parse import csv_parser

    ds = _tbl(sf_dir, "customer", ("c_custkey", "c_mktsegment", "c_nationkey"))

    def mk(b: pa.Table) -> pa.Table:
        line = pc.binary_join_element_wise(
            pc.cast(b["c_custkey"], pa.string()),
            b["c_mktsegment"].combine_chunks()
            if isinstance(b["c_mktsegment"], pa.ChunkedArray)
            else b["c_mktsegment"],
            pc.cast(b["c_nationkey"], pa.string()), ",")
        return b.append_column("line", line)

    ds = ds.map_batches(mk, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(
        csv_parser(parse_from="line", header=["k", "seg", "nk"]),
        batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["c_custkey", "k", "seg", "nk"])


def q_container_parse(sf_dir: str):
    """stanza container_parser (parser/container/config.go:47-51): CRI
    line split + k8s metadata from the log file path."""
    from ..stages.connectors import container_parser

    ds = _raw_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "text"])

    def mk(b: pa.Table) -> pa.Table:
        txt = b["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        # CRI lines are single-line; keep only the first line of the turn
        one = pc.struct_field(
            pc.extract_regex(txt, r"^(?P<l>[^\r\n]*)"), "l")
        line = pc.binary_join_element_wise(
            "2024-01-01T00:00:00.000000000Z stdout F ", one, "")
        path = pc.binary_join_element_wise(
            "/var/log/pods/default_pod-", b["conv_id"].combine_chunks()
            if isinstance(b["conv_id"], pa.ChunkedArray) else b["conv_id"],
            "_uid-", pc.cast(b["turn_idx"], pa.string()),
            "/main/0.log", "")
        return b.append_column("line", line).append_column("path", path)

    ds = ds.map_batches(mk, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(container_parser(parse_from="line", path_col="path"),
                        batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["conv_id", "turn_idx", "cri_stream",
                              "cri_logtag", "cri_log", "k8s_namespace",
                              "k8s_pod_name", "k8s_container_name",
                              "k8s_restart_count"])


def q_time_parse(sf_dir: str):
    """stanza time_parser (helper/time.go:19-29,138-175): strptime
    round-trip of the event timestamp."""
    from ..stages.parse import time_parser

    ds = _tbl(sf_dir, "events", ("event_id", "ts"))

    def fmt(b: pa.Table) -> pa.Table:
        ts = b["ts"].combine_chunks() if isinstance(
            b["ts"], pa.ChunkedArray) else b["ts"]
        # Arrow's %S prints subseconds (and strptime can't parse them
        # back) — strip the fractional tail; round-trip at second
        # precision (oracle: date_trunc('second', ts))
        s = pc.strftime(ts, format="%Y-%m-%d %H:%M:%S")
        s = pc.replace_substring_regex(s, r"\.\d+$", "")
        return b.append_column("ts_str", s)

    ds = ds.map_batches(fmt, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(
        time_parser("ts_str", "%Y-%m-%d %H:%M:%S", out="ts_parsed"),
        batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["event_id", "ts_parsed"])


def q_groupbyattrs(sf_dir: str):
    """groupbyattrsprocessor (processor.go:63-99): promoted-resource
    identity per record (the flat-table re-association key)."""
    from ..stages.connectors import groupbyattrs

    ds = _raw_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "tool"])
    ds = ds.map_batches(groupbyattrs(["role", "tool"]),
                        batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["conv_id", "turn_idx", "resource_id"])


def q_rfc3164(sf_dir: str):
    """stanza syslog_parser RFC3164/BSD path (parser/syslog/parser.go BSD
    format): synthesized BSD lines parsed back to pri/host/app/pid/msg +
    severity from pri&7."""
    from ..stages.parse import syslog_rfc3164_parser

    ds = _raw_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role"])

    def mk(b: pa.Table) -> pa.Table:
        pri = pc.cast(pc.bit_wise_and(pc.cast(b["turn_idx"], pa.int64()),
                                      pa.scalar(127)), pa.string())
        host = pc.binary_join_element_wise(
            "h", pc.cast(
                pc.bit_wise_and(pc.cast(b["turn_idx"], pa.int64()),
                                pa.scalar(3)), pa.string()), "")
        pid = pc.cast(b["turn_idx"], pa.string())
        role = b["role"].combine_chunks() if isinstance(
            b["role"], pa.ChunkedArray) else b["role"]
        line = pc.binary_join_element_wise(
            "<", pri, ">Oct 11 22:14:15 ", host, " app[", pid, "]: ",
            role, "")
        return b.append_column("line", line)

    ds = ds.map_batches(mk, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(syslog_rfc3164_parser(parse_from="line"),
                        batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["conv_id", "turn_idx", "syslog_pri",
                              "syslog_facility", "syslog_host", "syslog_app",
                              "syslog_pid", "syslog_msg",
                              "severity_number", "severity_text"])


def q_exceptions(sf_dir: str):
    """connector/exceptionsconnector (metrics mode): exception records ->
    counts keyed by (service, exception type) — error-severity turns with
    the error_code as the type dimension."""
    from ..stages.connectors import exceptions_connector

    ds = _parsed(sf_dir)
    return exceptions_connector(
        ds, condition=col("severity_number") >= 17,
        dims=["service", "error_code"])


SIGNAL_METRIC_DEFS = [
    {"name": "events.value.sum", "type": "sum",
     "conditions": ['event_type != "click"'],
     "attributes": ["event_type"], "value": "value"},
    {"name": "events.count", "type": "count",
     "conditions": [], "attributes": ["event_type"]},
]


def q_signaltometrics(sf_dir: str):
    """connector/signaltometricsconnector: OTTL-condition-driven generic
    signal->metric (README 'Conditions': OR-ed OTTL conditions). Returns
    the sum metric of SIGNAL_METRIC_DEFS."""
    from ..stages.connectors import signal_to_metrics

    ds = _tbl(sf_dir, "events", ("event_type", "value"))
    out = signal_to_metrics(ds, SIGNAL_METRIC_DEFS)["events.value.sum"]

    def round6(b: pa.Table) -> pa.Table:
        i = b.column_names.index("value")
        return b.set_column(i, "value", pc.round(b["value"], ndigits=6))

    return out.map_batches(round6, batch_format="pyarrow", batch_size=None)


def q_severity_range(sf_dir: str):
    """severity_parser with the '2xx'..'5xx' HTTP range sugar
    (helper/severity_builder.go:94-104 expandRange) over apache statuses."""
    from ..stages.parse import severity_parser

    ds = _parsed(sf_dir)
    ds = ds.map_batches(_template_filter("apache"), batch_format="pyarrow",
                        batch_size=None)

    def status_str(b: pa.Table) -> pa.Table:
        return b.append_column("status_token",
                               pc.cast(b["http_status"], pa.string()))

    ds = ds.map_batches(status_str, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(
        severity_parser("status_token",
                        mapping={"2xx": 9, "3xx": 10, "4xx": 13, "5xx": 17},
                        out_num="range_severity", out_text="range_text"),
        batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["conv_id", "turn_idx", "http_status",
                              "range_severity", "range_text"])


# ---------------------------------------------------------------------------
# training-data operators (documents / embeddings tables)
# ---------------------------------------------------------------------------

def _ngram_pairs(sf_dir: str):
    """Shared word-3-gram Jaccard near-dup pairs (memoized): computed once
    for q_ngram_jaccard / q_dedup_components / q_dedup_keep."""
    from ..stages.dedup import ngram_jaccard_pairs
    from ..stages.shuffle import dir_size_bytes

    path = f"{sf_dir}/documents.parquet"
    return _memo_ds(("ngram_pairs", sf_dir), path,
                    lambda: ngram_jaccard_pairs(
                        _docs(sf_dir), k=3, threshold=0.5, max_df=256,
                        size_bytes=dir_size_bytes(path)))


def q_exact_dedup(sf_dir: str):
    """Exact dedup over documents: surviving doc_id (min) + copy count per
    distinct text."""
    from ..stages.dedup import exact_dedup

    ds = _docs(sf_dir)
    return exact_dedup(ds)


def q_dedup_components(sf_dir: str):
    """Connected components over the ngram-Jaccard near-dup pairs ->
    (node, component=min doc_id of the cluster): the pairs->clusters
    step of a dedup pipeline (keep node == component). Distributed
    min-label propagation; the oracle is a recursive transitive
    closure over the identical pair SQL."""
    from ..stages.dedup import connected_components

    return connected_components(_ngram_pairs(sf_dir))


_DEDUP_COMPONENTS_SQL = """
WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') arr
                     FROM documents),
sh AS (SELECT DISTINCT doc_id, arr[i]||' '||arr[i+1]||' '||arr[i+2] AS sh
       FROM d, unnest(generate_series(1, len(arr)-2)) t(i)),
sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
rare AS (SELECT sh FROM sh GROUP BY 1 HAVING count(*) <= 256),
inter AS (SELECT x.doc_id a, y.doc_id b, count(*) i
          FROM sh x JOIN sh y USING (sh) JOIN rare USING (sh)
          WHERE x.doc_id < y.doc_id
          GROUP BY 1, 2),
pairs AS (SELECT a, b FROM inter
          JOIN sizes sa ON sa.doc_id=a JOIN sizes sb ON sb.doc_id=b
          WHERE i*1.0/(sa.n+sb.n-i) >= 0.5),
e AS (SELECT a u, b v FROM pairs UNION SELECT b, a FROM pairs),
reach(u, v) AS (SELECT u, v FROM e
                UNION
                SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u),
m AS (SELECT u, min(v) mv FROM reach GROUP BY u)
SELECT u AS node, least(u, mv) AS component FROM m
"""


def q_dedup_keep(sf_dir: str):
    """End-to-end corpus dedup: documents -> near-dup pairs -> connected
    components -> keep one representative per cluster (the min doc_id)
    plus every unpaired document. The keep decision attaches the
    component reduce-side (partitioned_attach) — no driver-held set."""
    from ..stages.dedup import connected_components
    from ..stages.shuffle import partitioned_attach

    ds = _docs(sf_dir)
    comp = connected_components(_ngram_pairs(sf_dir))
    docs = ds.select_columns(["doc_id"])
    attached = partitioned_attach(
        docs, {"doc_id": pa.int64()}, comp, key_col="doc_id",
        right_key="node", right_val="component", out_name="component")

    def keep(b: pa.Table) -> pa.Table:
        c = b["component"]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        # equal(null, x) -> null; unpaired docs (no component) keep
        ok = pc.fill_null(pc.equal(c, b["doc_id"]), True)
        return b.filter(ok).select(["doc_id"])

    return attached.map_batches(keep, batch_format="pyarrow",
                                batch_size=None)


_DEDUP_KEEP_SQL = _DEDUP_COMPONENTS_SQL.replace(
    "SELECT u AS node, least(u, mv) AS component FROM m",
    """c AS (SELECT u AS node, least(u, mv) AS component FROM m)
SELECT d.doc_id FROM documents d
LEFT JOIN c ON d.doc_id = c.node
WHERE c.node IS NULL OR c.component = d.doc_id""").replace(
    "m AS (SELECT u, min(v) mv FROM reach GROUP BY u)",
    "m AS (SELECT u, min(v) mv FROM reach GROUP BY u),")


def q_ngram_jaccard(sf_dir: str):
    """Near-dup pairs by exact word-3-gram Jaccard >= 0.5 (shingle-join).
    max_df=256 (the scale guard) is explicit here and mirrored in the SQL
    oracle's df CTE, so Ray and DuckDB agree at any sf."""
    return _ngram_pairs(sf_dir)


def q_minhash_lsh(sf_dir: str):
    """MinHash+LSH near-dup candidates (jaccard_est >= 0.5). Sketch-based —
    no SQL oracle; recall vs exact Jaccard is pinned by unit test."""
    from ..stages.dedup import minhash_lsh_pairs

    ds = _docs(sf_dir)
    return minhash_lsh_pairs(ds, threshold=0.5)


def q_simhash(sf_dir: str):
    """SimHash near-dup pairs (hamming <= 3). Sketch-based — rows-only."""
    from ..stages.dedup import simhash_pairs

    ds = _docs(sf_dir)
    return simhash_pairs(ds, max_hamming=3)


def _query_vectors(sf_dir: str, n: int = 10):
    """The first n embedding vectors as the ANN query set — predicate
    pushed into the parquet scan so the driver reads n rows, not the
    corpus."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", n)])
    return t["embedding"].to_pylist(), t["vec_id"].to_pylist()


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-5 for the first 10 vectors as queries."""
    from ..stages.similarity import ann_topk

    qm, qids = _query_vectors(sf_dir)
    ds = _emb(sf_dir)
    return ann_topk(ds, qm, qids, k=5, round_digits=4)


def q_ann_lsh(sf_dir: str):
    """Scale-path ANN: hyperplane-LSH candidate pruning + exact re-rank
    (approximate by design -> rows-only; recall vs brute force pinned in
    tests/test_training_data_ops.py)."""
    from ..stages.similarity import ann_lsh_topk

    qm, qids = _query_vectors(sf_dir)
    ds = _emb(sf_dir)
    return ann_lsh_topk(ds, qm, qids, k=5, n_bits=6, n_tables=12)


def _kmeans_fit8(sf_dir: str) -> dict:
    """Shared spherical-kmeans model (k=8, 5 iters) over embeddings —
    trained once per process for q_ann_ivf (coarse quantizer) and
    q_kmeans (the model query itself)."""
    from ..stages.cluster import kmeans_fit

    from ..stages.shuffle import dir_size_bytes

    key = ("kmeans8", sf_dir)
    if key not in _MEMO:
        _MEMO[key] = kmeans_fit(
            _emb(sf_dir), 8, max_iters=5,
            size_bytes=dir_size_bytes(f"{sf_dir}/embeddings.parquet"))
    return _MEMO[key]


def q_ann_ivf(sf_dir: str):
    """IVF-Flat ANN: spherical-kmeans coarse quantizer + nprobe-cell exact
    search (the FAISS IVF plan; approximate by design -> rows-only, recall
    vs brute force pinned in tests/test_training_data_ops.py)."""
    from ..stages.similarity import ann_ivf_topk

    qm, qids = _query_vectors(sf_dir)
    ds = _emb(sf_dir)
    return ann_ivf_topk(ds, qm, qids, k=5, nlist=8, nprobe=3,
                        fit=_kmeans_fit8(sf_dir))


def q_cosine_pairs(sf_dir: str):
    """Embedding near-dup pairs (cosine >= 0.3) within each label bucket
    (the IVF-bucket candidate scope)."""
    from ..stages.similarity import cosine_pairs_within

    ds = _emb(sf_dir, with_label=True)
    return cosine_pairs_within(ds, threshold=0.3, round_digits=4)


def q_kmeans(sf_dir: str):
    """Spherical k-means over embeddings (iterative combiner pattern) +
    cluster assignment — the trained IVF coarse quantizer. Iterative and
    model-like -> rows-only (determinism + separation pinned by tests)."""
    from ..stages.cluster import kmeans_assign

    fit = _kmeans_fit8(sf_dir)
    out = kmeans_assign(_emb(sf_dir), fit["centroids"])
    return out.select_columns(["vec_id", "cluster"])


def q_token_stats(sf_dir: str):
    """Token counting + quality scoring over documents."""
    from ..stages.textstats import token_stats

    ds = _docs(sf_dir)
    return ds.map_batches(token_stats(), batch_format="pyarrow",
                          batch_size=None)


def q_fingerprint(sf_dir: str):
    """md5 document fingerprint over normalized text."""
    from ..stages.textstats import fingerprint

    ds = _docs(sf_dir)
    return ds.map_batches(fingerprint(), batch_format="pyarrow",
                          batch_size=None)


def q_langid(sf_dir: str):
    """Language-ID heuristic (marker-word scoring). The scoring is plain
    non-overlapping RE2 counting + argmax, so it IS SQL-expressible —
    _langid_sql() reproduces it in DuckDB (regexp_extract_all is RE2 with
    the same leftmost non-overlap semantics as pc.count_substring_regex);
    lang_conf rounds to 6 here and in the oracle (token_stats convention)."""
    from ..stages.textstats import LanguageID

    ds = _docs(sf_dir)

    def rounded(b: pa.Table) -> pa.Table:
        conf = pc.round(b["lang_conf"], ndigits=6,
                        round_mode="half_towards_infinity")  # DuckDB ROUND
        return b.set_column(b.column_names.index("lang_conf"),
                            "lang_conf", conf)

    # plain callable instance: tiny state -> fuse with the read (no pool)
    return ds.map_batches(LanguageID(), batch_format="pyarrow",
                          batch_size=None) \
             .map_batches(rounded, batch_format="pyarrow", batch_size=None)


def q_multimodal(sf_dir: str):
    """Multimodal plumbing: synthetic binary media -> fake image decode via
    actor pool (real decoder stubbed; see stages/multimodal.py)."""
    from ..stages.multimodal import ImageDecoder, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(256))
    # pool sized to the fixed 256-row demo input (8 batches) — a real
    # corpus passes media_batch_size()/actor_pool_size() per its volume
    # max_restarts=0: ctor args live in the object store, and Ray warns
    # (issue #53727) that restartable actors may fail to restart then —
    # the demo input is tiny, so forgo restarts and keep stderr silent
    return ds.map_batches(ImageDecoder, fn_constructor_args=(True,),
                          batch_format="pyarrow", batch_size=32,
                          concurrency=(1, 4), max_restarts=0)


def q_multimodal_real(sf_dir: str):
    """Multimodal REAL decode: deterministic PNG/WAV payloads decoded by
    the built-in stdlib codecs (PIL probed first when installed) —
    image features from true pixels, audio frames from true PCM samples.
    No external media library required (stages/multimodal.py)."""
    from ..stages.multimodal import (AudioFrameSampler, ImageDecoder,
                                     synth_real_media_table)

    t = synth_real_media_table(128)
    imgs = ray.data.from_arrow(t.filter(pc.equal(t["kind"], "image")))
    auds = ray.data.from_arrow(t.filter(pc.equal(t["kind"], "audio")))
    feats = imgs.map_batches(ImageDecoder, fn_constructor_args=(False,),
                             batch_format="pyarrow", batch_size=16,
                             concurrency=(1, 4), max_restarts=0) \
        .select_columns(["media_id"])
    frames = auds.map_batches(AudioFrameSampler,
                              fn_constructor_args=(4, False),
                              batch_format="pyarrow", batch_size=16,
                              concurrency=(1, 4), max_restarts=0) \
        .select_columns(["media_id"])
    return feats.union(frames)


# 203.0.113.x split into two synthetic "networks" for the geoip analogue
GEO_RANGES = [
    ((203 << 24) | (0 << 16) | (113 << 8) | 0,
     (203 << 24) | (0 << 16) | (113 << 8) | 99, "zoneA"),
    ((203 << 24) | (0 << 16) | (113 << 8) | 100,
     (203 << 24) | (0 << 16) | (113 << 8) | 255, "zoneB"),
]


def _template_filter(name: str):
    """Row filter on the parsed template column (shared by the
    apache-scoped queries)."""
    def fn(b: pa.Table) -> pa.Table:
        t = b["template"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        return b.filter(pc.equal(t, name))
    return fn


def q_geoip(sf_dir: str):
    """geoipprocessor analogue: range-lookup enrichment of apache client IPs
    (sorted-interval binary search held by an actor pool)."""
    from ..stages.enrich import range_enrich_stage

    ds = _parsed(sf_dir)
    # only apache rows carry client_ip: filter FIRST so the range probe
    # runs on ~1/7 of the rows instead of enriching everything
    ds = ds.map_batches(_template_filter("apache"), batch_format="pyarrow",
                        batch_size=None)
    # small/big state split lives in range_enrich_stage: the 2-entry demo
    # table ships in the task closure; a real geo DB broadcasts to a pool
    ds = range_enrich_stage(ds, GEO_RANGES, "client_ip", "net",
                            key_is_ip=True, default="other")
    return count_by(ds, ["net"], count_col="n")


def q_grok(sf_dir: str):
    """OTTL ExtractGrokPatterns: %{COMMONAPACHELOG} over transcript text
    (the canonical grok parse of the north rule)."""
    from ..functions.grok import extract_grok_patterns

    ds = _raw_transcripts(sf_dir).select_columns(["conv_id", "turn_idx",
                                                  "text"])
    fn = extract_grok_patterns("%{COMMONAPACHELOG}")
    ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=None)

    def only_matched(b: pa.Table) -> pa.Table:
        c = b["clientip"]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return b.filter(pc.is_valid(c))

    ds = ds.map_batches(only_matched, batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["conv_id", "turn_idx", "clientip", "auth",
                              "verb", "request", "response", "bytes"])


def q_otlpjson(sf_dir: str):
    """otlpjsonconnector: re-parse JSON payload column into typed columns
    (events.props carries a JSON object)."""
    from ..stages.connectors import otlpjson_parser

    ds = _tbl(sf_dir, "events", ("event_id", "props"))
    fn = otlpjson_parser("props", {"k": ("$.k", "int")})
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None) \
        .select_columns(["event_id", "k"])


def q_uri_parse(sf_dir: str):
    """stanza uri parser over URLs reconstructed from apache-parsed paths."""
    from ..stages.connectors import uri_parser

    ds = _parsed(sf_dir)

    def mk_url(b: pa.Table) -> pa.Table:
        path = b["http_path"]
        if isinstance(path, pa.ChunkedArray):
            path = path.combine_chunks()
        url = pc.binary_join_element_wise(
            "https://api.example.com:8443", path, "")
        return b.append_column("url", url)

    ds = ds.map_batches(mk_url, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(uri_parser("url"), batch_format="pyarrow",
                        batch_size=None)

    def only_parsed(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b["uri_scheme"].combine_chunks()
                                    if isinstance(b["uri_scheme"],
                                                  pa.ChunkedArray)
                                    else b["uri_scheme"]))

    ds = ds.map_batches(only_parsed, batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["conv_id", "turn_idx", "uri_scheme", "uri_host",
                              "uri_port", "uri_path", "uri_query"])


def q_uri_query(sf_dir: str):
    """uri parser query-string map (parseutils ParseURI -> queryToMap):
    URLs carry multi-valued + percent/plus-encoded params; the url.Values
    map column is exploded to (param, pos, value) rows for the oracle."""
    from ..stages.connectors import uri_parser

    ds = _parsed(sf_dir)

    def mk_url(b: pa.Table) -> pa.Table:
        path = b["http_path"]
        if isinstance(path, pa.ChunkedArray):
            path = path.combine_chunks()
        # http_path already ends '?q=N'; append a multi-valued encoded param
        url = pc.binary_join_element_wise(
            "https://api.example.com:8443", path, "&tag=a%20b&tag=x+y", "")
        return b.append_column("url", url)

    ds = ds.map_batches(mk_url, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(uri_parser("url"), batch_format="pyarrow",
                        batch_size=None)

    def explode(b: pa.Table) -> pa.Table:
        m = b["uri_query_map"]
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        if m.offset != 0:
            # a sliced MapArray's .offsets/.keys/.items views disagree on
            # their base; rebuild compact before offset arithmetic
            m = pa.concat_arrays([m])
        n = len(m)
        ent_off = m.offsets.to_numpy(zero_copy_only=False)
        ent_counts = np.diff(ent_off)
        row_of_entry = np.repeat(np.arange(n), ent_counts)
        keys = m.keys
        vals = m.items  # ListArray of value lists
        v_off = vals.offsets.to_numpy(zero_copy_only=False)
        v_counts = np.diff(v_off)
        ent_of_val = np.repeat(np.arange(len(keys)), v_counts)
        pos = np.arange(len(vals.values)) - v_off[:-1][ent_of_val]
        rows = row_of_entry[ent_of_val]
        out = pa.table({
            "conv_id": pc.take(_cc(b["conv_id"]), pa.array(rows)),
            "turn_idx": pc.take(_cc(b["turn_idx"]), pa.array(rows)),
            "param": pc.take(keys, pa.array(ent_of_val)),
            "pos": pa.array(pos, pa.int64()),
            "value": vals.values,
        })
        return out

    def only_parsed(b: pa.Table) -> pa.Table:
        col = _cc(b["uri_query_map"])
        return b.filter(pc.is_valid(col))

    ds = ds.map_batches(only_parsed, batch_format="pyarrow", batch_size=None)
    return ds.map_batches(explode, batch_format="pyarrow", batch_size=None)


def _cc(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _uri_query_sql() -> str:
    v = parsed_view_sql()
    return v + """
, base AS (SELECT conv_id, turn_idx,
                  regexp_extract(http_path, 'q=(\\d+)', 1) AS qv
           FROM routed WHERE http_path IS NOT NULL)
SELECT conv_id, turn_idx, 'q' AS param, CAST(0 AS BIGINT) AS pos,
       qv AS value FROM base
UNION ALL SELECT conv_id, turn_idx, 'tag', CAST(0 AS BIGINT), 'a b' FROM base
UNION ALL SELECT conv_id, turn_idx, 'tag', CAST(1 AS BIGINT), 'x y' FROM base
"""


def q_text_source(sf_dir: str):
    """filelog-style raw text source: the same lines read from plain .log
    files through read_text, parsed, counted by template. The oracle
    classifies the identical text column from the Parquet side — equality
    proves the text path loses nothing."""
    from ..sources.textlogs import read_text_logs, write_text_fixture
    from ..stages.parse import parse_transcript_batch

    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = write_text_fixture(sf_dir, f"/tmp/otelray_textlogs/{base}")
    # preserve_* opt-out of the stanza-default whitespace trim: the
    # roundtrip contract is BYTE fidelity vs the parquet text column
    ds = read_text_logs(d, preserve_leading_whitespaces=True,
                        preserve_trailing_whitespaces=True)
    ds = ds.map_batches(parse_transcript_batch, batch_format="pyarrow",
                        batch_size=None)
    return count_by(ds, ["template"], count_col="n")


def q_multiline_source(sf_dir: str):
    """fileconsumer multiline split (line_start_pattern): each event is
    written as a TWO-line record ('EVENT <id>' + indented continuation
    carrying the type); the source must re-group both lines into one
    entry per event with the continuation content intact."""
    from ..sources.textlogs import read_text_logs

    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/otelray_textlogs/{base}_multiline"
    done = os.path.join(out_dir, "events.log")
    if not os.path.exists(done):
        import pyarrow.parquet as pq
        os.makedirs(out_dir, exist_ok=True)
        t = pq.read_table(f"{sf_dir}/events.parquet",
                          columns=["event_id", "event_type"])
        tmp = f"{done}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            for eid, et in zip(t["event_id"].to_pylist(),
                               t["event_type"].to_pylist()):
                f.write(f"EVENT {eid}\n  type={et}\n")
        os.replace(tmp, done)

    ds = read_text_logs(out_dir, line_start_pattern=r"^EVENT \d")

    def parse(b: pa.Table) -> pa.Table:
        txt = b["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        st = pc.extract_regex(txt, r"^EVENT (?P<id>\d+)\n  type=(?P<t>\w+)$")
        return pa.table({
            "event_id": pc.cast(pc.struct_field(st, "id"), pa.int64()),
            "event_type": pc.struct_field(st, "t")})

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)


def q_latin1_source(sf_dir: str):
    """fileconsumer encoding decode: customer market segments written as
    latin-1 bytes with a non-ASCII suffix; the source must decode to the
    same UTF-8 strings the oracle computes from the parquet side."""
    from ..sources.textlogs import read_text_logs

    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/otelray_textlogs/{base}_latin1"
    done = os.path.join(out_dir, "segments.log")
    if not os.path.exists(done):
        import pyarrow.parquet as pq
        os.makedirs(out_dir, exist_ok=True)
        t = pq.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_mktsegment"])
        tmp = f"{done}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            for seg in t["c_mktsegment"].to_pylist():
                f.write(f"{seg}é\n".encode("latin-1"))
        os.replace(tmp, done)

    ds = read_text_logs(out_dir, encoding="latin-1")
    ds = ds.map_batches(lambda b: pa.table({"seg": b["text"]}),
                        batch_format="pyarrow", batch_size=None)
    return count_by(ds, ["seg"], count_col="n")


LATENCY_BOUNDS = [10.0, 50.0, 100.0, 500.0, 1000.0, 5000.0]


def q_latency_histogram(sf_dir: str):
    """spanmetricsconnector: explicit-bucket latency histogram by (service,
    severity_bucket) over kv-parsed turns."""
    from ..stages.metrics import histogram_by

    ds = _parsed(sf_dir)
    return histogram_by(ds, ["service", "severity_bucket"], "latency_ms",
                        LATENCY_BOUNDS)


# schemaprocessor semconv hop chain: an 'all' rename at 1.1.0 chains into
# a 'logs' rename at 1.2.0 (translation.go revision walk)
SCHEMA_VERSIONS = {
    "1.1.0": {
        "all": {"changes": [{"rename_attributes": {"attribute_map": {
            "http_status": "http.response.status_code"}}}]},
        "logs": {"changes": [{"rename_attributes": {"attribute_map": {
            "log_level": "log.level"}}}]},
    },
    "1.2.0": {
        "logs": {"changes": [{"rename_attributes": {"attribute_map": {
            "http.response.status_code": "http.status"}}}]},
    },
}


def q_schema_translate(sf_dir: str):
    """schemaprocessor: semconv schema-file translation 1.0.0 -> 1.2.0
    over parsed columns (chained all+logs renames across two revisions)."""
    from ..stages.schema import semconv_log_transform

    ds = _parsed(sf_dir).select_columns(
        ["conv_id", "turn_idx", "http_status", "log_level", "error_code"])
    return ds.map_batches(
        semconv_log_transform(SCHEMA_VERSIONS, "1.0.0", "1.2.0"),
        batch_format="pyarrow", batch_size=None)


def _schema_translate_sql() -> str:
    return parsed_view_sql() + """
SELECT conv_id, turn_idx, http_status AS "http.status",
       log_level AS "log.level", error_code
FROM routed
"""


def q_transform_datapoint(sf_dir: str):
    """transformprocessor datapoint context (ottldatapoint): statements
    address datapoint attributes, value_double, and the owning metric's
    fields via metric.* paths."""
    from ..pipelines.statements import transform_processor
    from ..functions import maps as M

    ds = _tbl(sf_dir, "events", ("event_type", "value"))

    def shape(b: pa.Table) -> pa.Table:
        n = b.num_rows
        empty = pa.array([[]] * n, pa.map_(pa.string(), pa.string()))
        return pa.table({"metric_name": b["event_type"],
                         "value": b["value"], "attributes": empty})

    fn = transform_processor([{
        "context": "datapoint",
        "statements": [
            'set(attributes["band"], "hot") where value_double >= 0.5',
            'set(metric.name, Concat([metric.name, "_dp"], ""))',
        ]}])

    def out_cols(b: pa.Table) -> pa.Table:
        a = b["attributes"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        return pa.table({"metric_name": b["metric_name"],
                         "band": M.map_get(a, "band"),
                         "value": b["value"]})

    return ds.map_batches(shape, batch_format="pyarrow", batch_size=None) \
        .map_batches(fn, batch_format="pyarrow", batch_size=None) \
        .map_batches(out_cols, batch_format="pyarrow", batch_size=None)


_TRANSFORM_DATAPOINT_SQL = """
SELECT event_type || '_dp' AS metric_name,
       CASE WHEN value >= 0.5 THEN 'hot' END AS band, value
FROM events
"""


def q_metrics_transform(sf_dir: str):
    """metricstransformprocessor over events-as-datapoints: rename+scale
    the 'click' metric and aggregate its shard label by sum; other
    metrics pass through. Sums rounded to 6 decimals (order-dependent
    last-ulp, same rule as sum_events)."""
    from ..stages.metrics import metrics_transform
    from ..stages.shuffle import round_half_away

    ds = _tbl(sf_dir, "events", ("event_type", "user_id", "value"))

    def shape(b: pa.Table) -> pa.Table:
        uid = b["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        return pa.table({
            "metric_name": b["event_type"],
            "shard": pc.cast(
                pc.bit_wise_and(uid, 3), pa.int64()),
            "value": b["value"]})

    ds = ds.map_batches(shape, batch_format="pyarrow", batch_size=None)
    out = metrics_transform(ds, [{
        "include": "click", "action": "update", "new_name": "clicks.total",
        "operations": [
            {"action": "experimental_scale_value", "experimental_scale": 100},
            {"action": "aggregate_labels", "label_set": ["shard"],
             "aggregation_type": "sum"},
        ]}])

    def round6(b: pa.Table) -> pa.Table:
        v = b["value"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        i = b.column_names.index("value")
        return b.set_column(i, "value", pa.array(round_half_away(
            v.to_numpy(zero_copy_only=False), 6), pa.float64()))

    return out.map_batches(round6, batch_format="pyarrow", batch_size=None)


_METRICS_TRANSFORM_SQL = """
WITH base AS (SELECT event_type AS metric_name,
                     CAST(user_id & 3 AS BIGINT) AS shard, value
              FROM events)
SELECT 'clicks.total' AS metric_name, shard,
       ROUND(SUM(value * 100), 6) AS value
FROM base WHERE metric_name = 'click' GROUP BY shard
UNION ALL
SELECT metric_name, shard, ROUND(value, 6) AS value
FROM base WHERE metric_name <> 'click'
"""


def q_metrics_combine(sf_dir: str):
    """metricstransformprocessor action=combine: 'click'/'view' metrics
    merge into one 'engagement' metric; the named capture group becomes a
    `kind` label carrying each source metric's name, datapoints aggregate
    by the full label set (metrics_transform_processor_otlp.go:397-440).
    Passthrough metrics keep a null `kind`. Sums rounded to 6 decimals."""
    from ..stages.metrics import metrics_transform
    from ..stages.shuffle import round_half_away

    ds = _tbl(sf_dir, "events", ("event_type", "user_id", "value"))

    def shape(b: pa.Table) -> pa.Table:
        uid = b["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        return pa.table({
            "metric_name": b["event_type"],
            "shard": pc.cast(pc.bit_wise_and(uid, 3), pa.int64()),
            "value": b["value"]})

    ds = ds.map_batches(shape, batch_format="pyarrow", batch_size=None)
    out = metrics_transform(ds, [{
        "include": "^(?P<kind>click|view)$", "match_type": "regexp",
        "action": "combine", "new_name": "engagement",
        "aggregation_type": "sum",
    }])

    def round6(b: pa.Table) -> pa.Table:
        v = b["value"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        i = b.column_names.index("value")
        return b.set_column(i, "value", pa.array(round_half_away(
            v.to_numpy(zero_copy_only=False), 6), pa.float64()))

    return out.map_batches(round6, batch_format="pyarrow", batch_size=None)


_METRICS_COMBINE_SQL = """
WITH base AS (SELECT event_type AS metric_name,
                     CAST(user_id & 3 AS BIGINT) AS shard, value
              FROM events)
SELECT 'engagement' AS metric_name, b.shard, b.metric_name AS kind,
       ROUND(SUM(b.value), 6) AS value
FROM base b WHERE b.metric_name IN ('click', 'view')
GROUP BY b.metric_name, b.shard
UNION ALL
SELECT metric_name, shard, CAST(NULL AS VARCHAR) AS kind,
       ROUND(value, 6) AS value
FROM base WHERE metric_name NOT IN ('click', 'view')
"""


def q_metrics_ottl(sf_dir: str):
    """transformprocessor metric-context STRUCTURAL editors end-to-end
    (pipelines/metric_editors.py; processor/transformprocessor/internal/
    metrics/functions.go): scale_metric + copy_metric are row-local and
    run per batch; aggregate_on_attributes needs a metric's datapoints
    co-located, so transform_metrics hash-partitions by metric_name
    (DIVERGENCES #32d) and runs the statement chain once per partition.
    Sums rounded to 6 decimals (merge-order rule, as sum_events)."""
    from ..functions import maps as M
    from ..pipelines.statements import transform_metrics
    from ..stages.shuffle import round_half_away

    ds = _tbl(sf_dir, "events", ("event_type", "user_id", "value"))

    def shape(b: pa.Table) -> pa.Table:
        uid = b["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        n = b.num_rows
        shard = pc.cast(pc.bit_wise_and(uid, 3), pa.string())
        attrs = pa.MapArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32)),
            pa.array(["shard"] * n), shard)
        return pa.table({
            "metric_name": b["event_type"],
            "metric_type": pa.array(["Sum"] * n),
            "metric_temporality": pa.array(["cumulative"] * n),
            "value": b["value"],
            "attributes": attrs})

    out = transform_metrics(
        ds.map_batches(shape, batch_format="pyarrow", batch_size=None),
        [{"context": "metric",
          "statements": [
              'scale_metric(10.0, "ms") where name == "click"',
              'copy_metric(name="click_copy", unit="cp") '
              'where name == "click"',
              'aggregate_on_attributes("sum", ["shard"]) '
              'where name == "view"',
          ]}], n_parts=16)

    def project(b: pa.Table) -> pa.Table:
        attrs = b["attributes"]
        if isinstance(attrs, pa.ChunkedArray):
            attrs = attrs.combine_chunks()
        v = b["value"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        return pa.table({
            "metric_name": b["metric_name"],
            "metric_unit": b["metric_unit"],
            "shard": pc.cast(M.map_get(attrs, "shard"), pa.int64()),
            "value": pa.array(round_half_away(
                v.to_numpy(zero_copy_only=False), 6), pa.float64())})

    return out.map_batches(project, batch_format="pyarrow",
                           batch_size=None)


_METRICS_OTTL_SQL = """
WITH base AS (SELECT event_type AS metric_name,
                     CAST(user_id & 3 AS BIGINT) AS shard, value
              FROM events),
scaled AS (SELECT metric_name,
                  CASE WHEN metric_name = 'click' THEN 'ms' END
                      AS metric_unit,
                  shard,
                  CASE WHEN metric_name = 'click' THEN value * 10.0
                       ELSE value END AS value
           FROM base),
withcopies AS (
  SELECT * FROM scaled
  UNION ALL
  SELECT 'click_copy' AS metric_name, 'cp' AS metric_unit, shard, value
  FROM scaled WHERE metric_name = 'click')
SELECT metric_name, metric_unit, shard, ROUND(value, 6) AS value
FROM withcopies WHERE metric_name <> 'view'
UNION ALL
SELECT metric_name, metric_unit, shard, ROUND(SUM(value), 6) AS value
FROM withcopies WHERE metric_name = 'view'
GROUP BY metric_name, metric_unit, shard
"""


def q_latency_exp_histogram(sf_dir: str):
    """spanmetricsconnector `histogram: exponential` — base-2 exponential
    latency buckets by (service, severity_bucket) at fixed scale 3 (the
    SQL-expressible shape; the max_size auto-fit is pinned by unit
    tests in test_metrics.py)."""
    from ..stages.metrics import exp_histogram_by

    ds = _parsed(sf_dir)
    return exp_histogram_by(ds, ["service", "severity_bucket"],
                            "latency_ms", scale=3)


def _latency_exp_sql() -> str:
    # index = floor(ln(v) * (2^3/ln 2)), exact powers of two -> m*8-1;
    # the (8 / LN(2)) grouping reproduces numpy's scaleFactor rounding
    return parsed_view_sql() + """
SELECT service, severity_bucket, CAST(3 AS BIGINT) AS scale,
       CAST(CASE WHEN latency_ms > 0 THEN 1 WHEN latency_ms < 0 THEN -1
                 ELSE 0 END AS BIGINT) AS sign,
       CASE WHEN latency_ms = 0 THEN CAST(0 AS BIGINT)
            WHEN ABS(latency_ms) = POWER(2, FLOOR(LOG2(ABS(latency_ms))))
            THEN CAST(FLOOR(LOG2(ABS(latency_ms))) AS BIGINT) * 8 - 1
            ELSE CAST(FLOOR(LN(ABS(latency_ms)) * (8 / LN(2))) AS BIGINT)
            END AS bucket_idx,
       count(*) AS n
FROM routed WHERE latency_ms IS NOT NULL
GROUP BY 1, 2, 3, 4, 5
"""


def q_service_graph(sf_dir: str):
    """servicegraphconnector: consecutive-turn service->service edge counts
    per conversation."""
    from ..stages.metrics import transition_edges

    ds = _parsed(sf_dir).select_columns(
        ["conv_id", "turn_idx", "service"])
    return transition_edges(ds)


def q_delta_to_cumulative(sf_dir: str):
    """deltatocumulativeprocessor: running per-user sum of event values."""
    from ..stages.metrics import cumulative_per_key

    ds = _tbl(sf_dir, "events", ("event_id", "user_id", "ts", "value"))
    out = cumulative_per_key(ds, key_col="user_id", order_col="ts",
                             value_col="value")

    def shape(b: pa.Table) -> pa.Table:
        # fixed-point cents: float running sums differ in the last ulp
        # between engines even after rounding — integers compare exactly.
        # half_towards_infinity == DuckDB ROUND (half away from zero)
        c = pc.cast(pc.round(pc.multiply(b["cumulative"], 100.0),
                             round_mode="half_towards_infinity"), pa.int64())
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "cumulative_x100": c,
        })

    return out.map_batches(shape, batch_format="pyarrow", batch_size=None)


def q_sessionize(sf_dir: str):
    """Gap-based sessions per user over the events stream (the batch
    analogue of groupbytrace/tailsampling's buffered gather)."""
    from ..stages.sessionize import sessionize
    from ..stages.shuffle import dir_size_bytes

    ds = _tbl(sf_dir, "events", ("user_id", "ts"))
    return sessionize(ds, key_col="user_id", gap="30m",
                      size_bytes=dir_size_bytes(f"{sf_dir}/events.parquet"))


def q_sum_events(sf_dir: str):
    """sumconnector over events: total value by event_type. Rounded to 6
    decimals — float sums are order-dependent in the last ulp, so exact-bit
    equality vs a serial SQL oracle is not meaningful."""
    ds = _tbl(sf_dir, "events", ("event_type", "value"))
    out = sum_by(ds, ["event_type"], "value", sum_col="total_value")

    def round6(b: pa.Table) -> pa.Table:
        i = b.column_names.index("total_value")
        return b.set_column(i, "total_value",
                            pc.round(b["total_value"], ndigits=6))

    return out.map_batches(round6, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Oracle SQL (same names, same values)
# ---------------------------------------------------------------------------

def oracle_queries() -> dict[str, str]:
    v = parsed_view_sql()
    return {
        "flagship_parse": v + f"SELECT {', '.join(PARSED_COLS)} FROM routed",
        "flagship_route": v + ("SELECT conv_id, turn_idx, role, tool, "
                               "severity_number, sink FROM routed"),
        "flagship_enrich": v + ("SELECT conv_id, turn_idx, role, service, "
                                "tool, resource FROM routed"),
        "flagship_sink_counts": v + ("SELECT sink, count(*) AS n FROM routed "
                                     "GROUP BY sink"),
        "count_connector": v + (
            "SELECT sink, tool, severity_bucket, count(*) AS n FROM routed "
            "GROUP BY sink, tool, severity_bucket"),
        "sum_connector": v + (
            "SELECT sink, tool_attr, CAST(sum(latency_ms) AS BIGINT) "
            "AS latency_total "
            "FROM routed WHERE template = 'kv' GROUP BY sink, tool_attr"),
        "filter_errors": v + (
            "SELECT conv_id, turn_idx, severity_number, severity_text, "
            "template FROM routed WHERE severity_number >= 17"),
        "filter_matchers": v + (
            "SELECT conv_id, turn_idx, severity_number, tool, template "
            "FROM routed "
            "WHERE (regexp_matches(text, 'GET|POST') "
            "       OR regexp_matches(text, 'error')) "
            "AND (severity_number = 0 OR severity_number >= 9) "
            "AND NOT (tool IS NOT NULL AND tool = 'bash')"),
        "log_dedup": v + (
            "SELECT template, severity_number, error_code, "
            "count(*) AS log_count, min(ts) AS first_observed_ts, "
            "max(ts) AS last_observed_ts "
            "FROM routed GROUP BY template, severity_number, error_code"),
        "tail_sample": v + (
            ", g AS (SELECT conv_id, "
            "epoch_us(max(ts)-min(ts)) AS dur_us, count(*) AS n, "
            "max(CASE WHEN severity_number >= 17 THEN 1 ELSE 0 END) "
            "AS has_err, "
            "max(CASE WHEN latency_ms BETWEEN 4900 AND 5000 THEN 1 ELSE 0 "
            "END) AS has_slow FROM routed GROUP BY conv_id) "
            "SELECT r.conv_id, r.turn_idx, r.severity_number, r.tool "
            "FROM routed r JOIN g USING (conv_id) "
            "WHERE (g.has_err = 1 AND g.n >= 40) "
            "OR g.dur_us >= 400000000 OR g.has_slow = 1"),
        "tail_sample_rate": v + (
            ", g AS (SELECT conv_id, min(ts) AS t0, count(*) AS n "
            "FROM routed GROUP BY conv_id), "
            "w AS (SELECT conv_id, sum(n) OVER ("
            "PARTITION BY date_trunc('second', t0) "
            "ORDER BY t0, conv_id ROWS UNBOUNDED PRECEDING) AS cum FROM g) "
            "SELECT r.conv_id, r.turn_idx FROM routed r "
            "JOIN w USING (conv_id) WHERE w.cum <= 40"),
        "recombine": _recombine_sql(),
        "sampler": (
            f"SELECT conv_id, turn_idx, role, tool "
            f"FROM read_parquet('{_transcripts_glob()}') "
            "WHERE CAST(('0x' || substring(md5(conv_id),1,8)) AS BIGINT) "
            "% 10000 < 2000"),
        "redaction": _redact_sql(),
        "sampler_equalizing": _consistent_sampler_sql("equalizing"),
        "sampler_proportional": _consistent_sampler_sql("proportional"),
        "attributes_chain": (
            f"SELECT conv_id, turn_idx, "
            f"CASE WHEN regexp_matches(text, '- (\\S+) \\[') THEN "
            f"sha256(regexp_extract(text, '- (\\S+) \\[', 1)) END "
            f"AS user_name, 'prod' AS env "
            f"FROM read_parquet('{_transcripts_glob()}')"),
        "transform_statements": (
            f"SELECT conv_id, turn_idx, "
            f"CASE WHEN role IN ('assistant','user') AND tool = 'bash' "
            f"THEN upper(text) END AS text_upper, "
            f"CASE WHEN role IN ('assistant','user') "
            f"THEN sha256(text) END AS text_hash, "
            f"CASE WHEN role IN ('assistant','user') AND length(text) > 100 "
            f"THEN 'long' END AS len_flag "
            f"FROM read_parquet('{_transcripts_glob()}')"),
        "exceptions": v + (
            "SELECT service, COALESCE(error_code, '') AS error_code, "
            "count(*) AS exceptions_count FROM routed "
            "WHERE severity_number >= 17 GROUP BY 1, 2"),
        "signaltometrics": (
            "SELECT event_type, ROUND(sum(value), 6) AS value FROM events "
            "WHERE event_type != 'click' GROUP BY 1"),
        "severity_range": v + (
            "SELECT conv_id, turn_idx, http_status, "
            "CAST(CASE http_status // 100 WHEN 2 THEN 9 WHEN 3 THEN 10 "
            "WHEN 4 THEN 13 WHEN 5 THEN 17 ELSE 0 END AS INTEGER) "
            "AS range_severity, "
            "CASE http_status // 100 WHEN 2 THEN 'info' WHEN 3 THEN 'info2' "
            "WHEN 4 THEN 'warn' WHEN 5 THEN 'error' ELSE 'default' END "
            "AS range_text "
            "FROM routed WHERE template = 'apache'"),
        "journald": (
            f"SELECT ts, text AS body, role || '.service' AS unit, "
            f"conv_id AS host, CAST(turn_idx % 8 AS INTEGER) AS priority, "
            f"list_value(21,19,18,17,13,10,9,5)[(turn_idx % 8) + 1] "
            f"AS severity_number, "
            f"list_value('emerg','alert','crit','err','warning','notice',"
            f"'info','debug')[(turn_idx % 8) + 1] AS severity_text "
            f"FROM read_parquet('{_transcripts_glob()}')"),
        "jsonarray": (
            "SELECT event_id, event_type AS etype, "
            "CAST(event_id AS VARCHAR) AS eid FROM events"),
        "trace_parse": (
            f"SELECT conv_id, turn_idx, md5(conv_id) AS trace_hex_rt, "
            f"substring(md5(conv_id), 1, 16) AS span_hex_rt, "
            f"1 AS trace_flags, role AS scope_name "
            f"FROM read_parquet('{_transcripts_glob()}')"),
        "cumulative_to_delta": (
            "SELECT event_id, user_id, CAST(ROUND((value - COALESCE("
            "lag(value) OVER (PARTITION BY user_id ORDER BY ts), 0)) * 100) "
            "AS BIGINT) AS delta_x100 FROM events"),
        "delta_to_rate": """
WITH d AS (
  SELECT event_id, user_id, value, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
  FROM events)
SELECT event_id, user_id,
       ROUND(value / ((epoch_us(ts) - epoch_us(pts)) / 1000000.0), 6) AS rate
FROM d WHERE pts IS NOT NULL AND epoch_us(ts) > epoch_us(pts)
""",
        "metric_start_time": (
            "SELECT event_id, user_id, ts, "
            "min(ts) OVER (PARTITION BY user_id) AS start_ts FROM events"),
        "csv_parse": (
            "SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS k, "
            "c_mktsegment AS seg, CAST(c_nationkey AS VARCHAR) AS nk "
            "FROM customer"),
        "container_parse": (
            f"SELECT conv_id, turn_idx, 'stdout' AS cri_stream, "
            f"'F' AS cri_logtag, "
            f"regexp_extract(text, '^([^\\r\\n]*)', 1) AS cri_log, "
            f"'default' AS k8s_namespace, "
            f"'pod-' || conv_id AS k8s_pod_name, "
            f"'main' AS k8s_container_name, '0' AS k8s_restart_count "
            f"FROM read_parquet('{_transcripts_glob()}')"),
        "time_parse": ("SELECT event_id, date_trunc('second', ts) "
                       "AS ts_parsed FROM events"),
        "groupbyattrs": (
            # canonical_identity's length-prefixed encoding
            # ("<len>:<value>" per column, 'N' for null — a prefix code,
            # so no value content can collide with the separator)
            f"SELECT conv_id, turn_idx, "
            f"COALESCE(CAST(length(role) AS VARCHAR) || ':' || role, 'N')"
            f" || "
            f"COALESCE(CAST(length(tool) AS VARCHAR) || ':' || tool, 'N')"
            f" AS resource_id "
            f"FROM read_parquet('{_transcripts_glob()}')"),
        "rfc3164": (
            f"SELECT conv_id, turn_idx, "
            f"CAST(turn_idx % 128 AS INTEGER) AS syslog_pri, "
            f"CAST((turn_idx % 128) // 8 AS INTEGER) AS syslog_facility, "
            f"'h' || CAST(turn_idx % 4 AS VARCHAR) AS syslog_host, "
            f"'app' AS syslog_app, CAST(turn_idx AS VARCHAR) AS syslog_pid, "
            f"role AS syslog_msg, "
            f"list_value(21,19,18,17,13,10,9,5)"
            f"[(turn_idx % 128) % 8 + 1] AS severity_number, "
            f"list_value('emerg','alert','crit','err','warning','notice',"
            f"'info','debug')[(turn_idx % 128) % 8 + 1] AS severity_text "
            f"FROM read_parquet('{_transcripts_glob()}')"),
        "text_source": parsed_view_sql() + (
            "SELECT template, count(*) AS n FROM routed GROUP BY template"),
        "multiline_source":
            "SELECT event_id, event_type FROM events",
        "latin1_source": ("SELECT c_mktsegment || 'é' AS seg, "
                          "count(*) AS n FROM customer GROUP BY seg"),
        "latency_exp_histogram": _latency_exp_sql(),
        "metrics_transform": _METRICS_TRANSFORM_SQL,
        "metrics_combine": _METRICS_COMBINE_SQL,
        "metrics_ottl": _METRICS_OTTL_SQL,
        "transform_datapoint": _TRANSFORM_DATAPOINT_SQL,
        "schema_translate": _schema_translate_sql(),
        "latency_histogram": parsed_view_sql() + """
SELECT service, severity_bucket,
       CASE WHEN latency_ms <= 10 THEN '<=10'
            WHEN latency_ms <= 50 THEN '<=50'
            WHEN latency_ms <= 100 THEN '<=100'
            WHEN latency_ms <= 500 THEN '<=500'
            WHEN latency_ms <= 1000 THEN '<=1000'
            WHEN latency_ms <= 5000 THEN '<=5000'
            ELSE '>5000' END AS bucket,
       count(*) AS n
FROM routed WHERE latency_ms IS NOT NULL
GROUP BY 1, 2, 3
""",
        "service_graph": parsed_view_sql() + """
, edges AS (
  SELECT service AS from_node,
         lead(service) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS to_node
  FROM routed
)
SELECT from_node, to_node, count(*) AS n FROM edges
WHERE to_node IS NOT NULL GROUP BY 1, 2
""",
        "delta_to_cumulative": (
            "SELECT event_id, user_id, "
            "CAST(ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) * 100) AS BIGINT) "
            "AS cumulative_x100 FROM events"),
        "sessionize": """
WITH s AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), g AS (
  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS sidx
  FROM s
)
SELECT user_id, sidx AS session_idx, min(ts) AS session_start,
       max(ts) AS session_end, count(*) AS n_events
FROM g GROUP BY user_id, sidx
""",
        "window_counts": (
            "SELECT date_trunc('hour', ts) AS window, event_type, "
            "count(*) AS n FROM events GROUP BY 1, 2"),
        "sum_events": (
            "SELECT event_type, ROUND(sum(value), 6) AS total_value "
            "FROM events GROUP BY event_type"),
        "grok_apache": f"""
WITH t AS (SELECT conv_id, turn_idx, text
           FROM read_parquet('{_transcripts_glob()}')),
m AS (SELECT conv_id, turn_idx,
        CASE WHEN len(regexp_extract_all(text, '{_AP}')) > 0 THEN
          regexp_extract(text, '{_AP}',
            ['ip','m_user','ats','method','path','status','bytes']) END AS s
      FROM t)
SELECT conv_id, turn_idx, s.ip AS clientip, s.m_user AS auth,
       s.method AS verb, s.path AS request,
       CAST(s.status AS BIGINT) AS response, CAST(s.bytes AS BIGINT) AS bytes
FROM m WHERE s IS NOT NULL
""",
        "geoip_ranges": parsed_view_sql() + (
            "SELECT CASE WHEN CAST(split_part(client_ip,'.',4) AS BIGINT) "
            "<= 99 THEN 'zoneA' ELSE 'zoneB' END AS net, count(*) AS n "
            "FROM routed WHERE template = 'apache' GROUP BY 1"),
        "otlpjson": (
            "SELECT event_id, CAST(json_extract_string(props, '$.k') "
            "AS BIGINT) AS k FROM events"),
        "uri_parse": _uri_sql(),
        "uri_query": _uri_query_sql(),
        "exact_dedup": (
            "SELECT md5(text) AS dedup_key, min(doc_id) AS doc_id, "
            "count(*) AS n_copies FROM documents GROUP BY text"),
        "dedup_components": _DEDUP_COMPONENTS_SQL,
        "dedup_keep": _DEDUP_KEEP_SQL,
        "ngram_jaccard": """
WITH d AS (SELECT doc_id, string_split(text, ' ') arr FROM documents),
sh AS (SELECT DISTINCT doc_id, arr[i]||' '||arr[i+1]||' '||arr[i+2] AS sh
       FROM d, unnest(generate_series(1, len(arr)-2)) t(i)),
sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
-- df cap mirrors ngram_jaccard_pairs(max_df=256): stopword shingles in
-- > 256 docs contribute no intersection counts (sizes still count them)
rare AS (SELECT sh FROM sh GROUP BY 1 HAVING count(*) <= 256),
inter AS (SELECT x.doc_id a, y.doc_id b, count(*) i
          FROM sh x JOIN sh y USING (sh) JOIN rare USING (sh)
          WHERE x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT a, b, ROUND(i*1.0/(sa.n+sb.n-i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id=a JOIN sizes sb ON sb.doc_id=b
WHERE i*1.0/(sa.n+sb.n-i) >= 0.5
""",
        "ann_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < 10),
c AS (SELECT query_id, vec_id,
             list_cosine_similarity(qe, embedding) AS s
      FROM q CROSS JOIN embeddings WHERE vec_id <> query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY s DESC, vec_id) rn FROM c)
SELECT query_id, vec_id, ROUND(CAST(s AS DOUBLE), 4) AS sim FROM r WHERE rn <= 5
""",
        "cosine_pairs": """
SELECT x.label, x.vec_id AS a, y.vec_id AS b,
       ROUND(CAST(list_cosine_similarity(x.embedding, y.embedding) AS DOUBLE), 4) AS sim
FROM embeddings x JOIN embeddings y
  ON x.label = y.label AND x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.3
""",
        "token_stats": """
WITH p AS (SELECT doc_id, text,
                  ' ' || replace(text, ' ', '  ') || ' ' AS padded
           FROM documents)
SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars,
       ROUND(length(text)*1.0 / len(string_split(text, ' ')), 6)
         AS avg_token_len,
       ROUND((len(string_split(padded, ' the ')) - 1
            + len(string_split(padded, ' a ')) - 1
            + len(string_split(padded, ' of ')) - 1
            + len(string_split(padded, ' and ')) - 1
            + len(string_split(padded, ' to ')) - 1)*1.0
            / len(string_split(text, ' ')), 6) AS stopword_ratio
FROM p
""",
        "fingerprint": (
            "SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', "
            "'g')))) AS fingerprint FROM documents"),
        "langid": _langid_sql(),
        # minhash_lsh / simhash / multimodal_decode: sketch- or
        # model-based -> no SQL oracle (driver records rows-only checks;
        # recall/accuracy pinned by unit tests instead)
    }


def _langid_sql() -> str:
    """DuckDB twin of stages/textstats.LanguageID: per-language marker
    counts via RE2 regexp_extract_all over lower(text), first-max argmax
    (language i wins iff strictly above every EARLIER language and >= every
    LATER one — numpy argmax tie-breaking), conf = max/total rounded 6."""
    from ..stages.textstats import LANG_MARKERS

    langs = list(LANG_MARKERS)
    scores = []
    for lang, words in LANG_MARKERS.items():
        pat = "|".join(rf"(?:(?:^|\s){w}(?:\s|$))" for w in words)
        scores.append("len(regexp_extract_all(lower(text), "
                      f"'{pat}')) AS s_{lang}")
    total = " + ".join(f"s_{lang}" for lang in langs)
    greatest = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    whens = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > s_{langs[j]}" for j in range(i)] + \
                [f"s_{lang} >= s_{langs[j]}" for j in range(i + 1, len(langs))]
        whens.append(f"WHEN {' AND '.join(conds) or 'TRUE'} THEN '{lang}'")
    case = "CASE WHEN total = 0 THEN 'unknown' " + " ".join(whens) + " END"
    return f"""
WITH s AS (SELECT doc_id, {', '.join(scores)} FROM documents),
t AS (SELECT *, {total} AS total FROM s)
SELECT doc_id, {case} AS lang_pred,
       CASE WHEN total > 0 THEN ROUND({greatest}*1.0 / total, 6)
            ELSE 0.0 END AS lang_conf
FROM t
"""


def _recombine_sql() -> str:
    glob = _transcripts_glob()
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text, ts FROM read_parquet('{glob}')
), s AS (
  SELECT *, CASE WHEN regexp_matches(text, '^\\S') THEN 1 ELSE 0 END AS isf
  FROM t
), g AS (
  SELECT *, SUM(isf) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS seg
  FROM s
)
SELECT conv_id, MIN(turn_idx) AS turn_idx, MIN(ts) AS ts,
       string_agg(text, chr(10) ORDER BY turn_idx) AS text,
       COUNT(*) AS n_lines
FROM g GROUP BY conv_id, seg
"""


def _uri_sql() -> str:
    v = parsed_view_sql()
    return v + """
SELECT conv_id, turn_idx, 'https' AS uri_scheme,
       'api.example.com' AS uri_host, '8443' AS uri_port,
       regexp_extract(http_path, '^([^?]*)', 1) AS uri_path,
       CASE WHEN http_path LIKE '%?%' THEN
         regexp_extract(http_path, '\\?(.*)$', 1) END AS uri_query
FROM routed WHERE http_path IS NOT NULL
"""


def _redact_sql() -> str:
    pat = "|".join(f"(?:{p})" for p in REDACT_PATTERNS)
    return (
        f"SELECT conv_id, turn_idx, "
        f"regexp_replace(text, '{pat}', '****', 'g') AS text, "
        f"CASE WHEN regexp_matches(text, '{pat}') THEN 1 ELSE 0 END"
        f"::BIGINT AS redacted_count "
        f"FROM read_parquet('{_transcripts_glob()}')")


def ray_queries() -> dict:
    return {
        "flagship_parse": q_parse,
        "flagship_route": q_route,
        "flagship_enrich": q_enrich,
        "flagship_sink_counts": q_sink_counts,
        "count_connector": q_count_connector,
        "sum_connector": q_sum_connector,
        "filter_errors": q_filter_errors,
        "filter_matchers": q_filter_matchers,
        "log_dedup": q_dedup,
        "recombine": q_recombine,
        "sampler": q_sampler,
        "sampler_equalizing": _consistent_sampler_query("equalizing"),
        "sampler_proportional": _consistent_sampler_query("proportional"),
        "redaction": q_redact,
        "attributes_chain": q_attributes,
        "transform_statements": q_transform_statements,
        "exceptions": q_exceptions,
        "signaltometrics": q_signaltometrics,
        "severity_range": q_severity_range,
        "journald": q_journald,
        "jsonarray": q_jsonarray,
        "trace_parse": q_trace_parse,
        "cumulative_to_delta": q_cumulative_to_delta,
        "delta_to_rate": q_delta_to_rate,
        "metric_start_time": q_metric_start_time,
        "csv_parse": q_csv_parse,
        "container_parse": q_container_parse,
        "time_parse": q_time_parse,
        "groupbyattrs": q_groupbyattrs,
        "rfc3164": q_rfc3164,
        "text_source": q_text_source,
        "multiline_source": q_multiline_source,
        "latin1_source": q_latin1_source,
        "latency_histogram": q_latency_histogram,
        "latency_exp_histogram": q_latency_exp_histogram,
        "metrics_transform": q_metrics_transform,
        "metrics_combine": q_metrics_combine,
        "metrics_ottl": q_metrics_ottl,
        "transform_datapoint": q_transform_datapoint,
        "schema_translate": q_schema_translate,
        "service_graph": q_service_graph,
        "delta_to_cumulative": q_delta_to_cumulative,
        "sessionize": q_sessionize,
        "tail_sample": q_tail_sample,
        "tail_sample_rate": q_tail_sample_rate,
        "window_counts": q_window_counts,
        "sum_events": q_sum_events,
        "grok_apache": q_grok,
        "geoip_ranges": q_geoip,
        "otlpjson": q_otlpjson,
        "uri_parse": q_uri_parse,
        "uri_query": q_uri_query,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_components": q_dedup_components,
        "dedup_keep": q_dedup_keep,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        # multimodal sits with the other rows-only training-data ops, NOT
        # last: round 2's gate recorded 50/51 rows with exactly the final
        # dict entry missing (a tail truncation), so the cheapest row no
        # longer rides in the caboose
        "multimodal_decode": q_multimodal,
        "multimodal_real": q_multimodal_real,
        "ann_topk": q_ann_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "cosine_pairs": q_cosine_pairs,
        "kmeans_ivf": q_kmeans,
        "token_stats": q_token_stats,
        "fingerprint": q_fingerprint,
        "langid": q_langid,
    }
