"""Vectorized parse stages (the stanza parser family re-expressed on Arrow).

Reference semantics (studied, not ported):
  - ParserConfig parse_from -> parse -> parse_to, on_error drop/send:
    pkg/stanza/operator/helper/parser.go:17-35,98-195
  - regex_parser (named captures): pkg/stanza/operator/parser/regex/parser.go:34-66
  - keyvalue/json/csv/syslog/severity/time parsers: pkg/stanza/operator/parser/*
  - OTTL ExtractGrokPatterns: pkg/ottl/ottlfuncs/func_extract_grok_patterns.go:38-90

Everything here is a pure function over a ``pyarrow.Table`` batch, built on
``pyarrow.compute`` kernels (RE2 regex engine — same engine family as Go's
``regexp``), suitable for ``ds.map_batches(fn, batch_format="pyarrow")``.
No Python-per-row loops in any hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..model import (
    ERROR,
    HTTP_RANGE_SEVERITY,
    SEVERITY_NAMES,
    SYSLOG_SEVERITY,
    SYSLOG_SEVERITY_TEXT,
    default_severity_mapping,
)

# --- flagship transcript templates (FIXTURES.md F1a) ---------------------
APACHE_RE = (r'^(?P<ip>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}) - (?P<user>\S+) '
             r'\[(?P<ats>[^\]]+)\] "(?P<method>[A-Z]+) (?P<path>\S+) HTTP/1\.1" '
             r'(?P<status>\d{3}) (?P<bytes>\d+)$')
KV_RE = (r'^level=(?P<level>\w+) code=(?P<code>\S+) latency_ms=(?P<latency>\d+) '
         r'msg="(?P<msg>[^"]*)" tool=(?P<tool>\w*)$')
JSON_RE = (r'^\{"severity":"(?P<sev>[A-Z]+)","error":\{"code":"(?P<code>[^"]+)",'
           r'"retryable":(?P<retryable>true|false)\},"dur":"(?P<dur>[0-9.]+)s"')
SYSLOG_RE = (r'^<(?P<pri>1[0-8]\d|19[01]|\d{1,2})>1 (?P<sts>\S+) (?P<host>\S+) (?P<app>\S+) '
             r'(?P<pid>\d+) (?P<msgid>\S+) - tool=(?P<tool>\w+) rc=(?P<rc>\d+)$')
TRACEBACK_HEAD_RE = r'^Traceback '
CONTINUATION_RE = r'^\s'

_SEV_MAP = default_severity_mapping()
_SEV_KEYS = pa.array(list(_SEV_MAP.keys()), pa.string())
_SEV_VALS = pa.array(list(_SEV_MAP.values()), pa.int32())
# canonical name per enum value, indexed 0..24
_SEV_NAME_BY_NUM = pa.array([SEVERITY_NAMES[i] for i in range(25)], pa.string())
_SYSLOG_SEV = pa.array(SYSLOG_SEVERITY, pa.int32())
_SYSLOG_TEXT = pa.array(SYSLOG_SEVERITY_TEXT, pa.string())
# http bucket 0..5 -> severity (only 2..5 defined)
_HTTP_SEV = pa.array([None, None] + [HTTP_RANGE_SEVERITY[i] for i in (2, 3, 4, 5)],
                     pa.int32())


def map_severity_tokens(tokens: pa.Array) -> pa.Array:
    """Lowercased token -> severity number via the default preset mapping
    (severity_builder.go:17-91). Unknown/null tokens -> null."""
    idx = pc.index_in(pc.utf8_lower(tokens), value_set=_SEV_KEYS)
    return pc.take(_SEV_VALS, idx)


def severity_name(nums: pa.Array) -> pa.Array:
    """Canonical severity text for enum values (overwrite_text=true behavior)."""
    return pc.take(_SEV_NAME_BY_NUM, nums)


def _coalesce(*arrays):
    return pc.coalesce(*arrays)


def parse_transcript_batch(batch: pa.Table) -> pa.Table:
    """Flagship envelope parse: classify each turn's text into one of the six
    template families and extract structured fields + severity.

    Adds columns:
      template:string, severity_number:int32, severity_text:string,
      http_status:int32, http_method:string, http_path:string,
      log_level:string, error_code:string, latency_ms:int64, msg:string,
      syslog_pri:int32, syslog_host:string, syslog_app:string, rc:int32,
      tool_attr:string

    Unmatched rows pass through with template='plain', severity 0/'' —
    the stanza on_error=send path (helper/parser.go:98-150).
    """
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    ap = pc.extract_regex(text, APACHE_RE)
    kv = pc.extract_regex(text, KV_RE)
    js = pc.extract_regex(text, JSON_RE)
    sy = pc.extract_regex(text, SYSLOG_RE)
    tb_head = pc.match_substring_regex(text, TRACEBACK_HEAD_RE)
    tb_cont = pc.match_substring_regex(text, CONTINUATION_RE)

    ap_ok, kv_ok, js_ok, sy_ok = (x.is_valid() for x in (ap, kv, js, sy))

    f = pc.struct_field
    null_str = pa.nulls(len(text), pa.string())
    null_i32 = pa.nulls(len(text), pa.int32())
    null_i64 = pa.nulls(len(text), pa.int64())

    # per-template severity
    status = pc.cast(f(ap, "status"), pa.int32())
    bucket = pc.divide(status, 100)
    # statuses >= 600 (nonstandard proxies) must pass through with null
    # severity, not ArrowIndexError the whole batch (on_error=send)
    bucket = pc.if_else(pc.and_(pc.greater_equal(bucket, 0),
                                pc.less_equal(bucket, 5)),
                        bucket, pa.nulls(len(text), pa.int32()))
    sev_ap = pc.take(_HTTP_SEV, bucket)
    sev_kv = map_severity_tokens(f(kv, "level"))
    sev_js = map_severity_tokens(f(js, "sev"))
    pri = pc.cast(f(sy, "pri"), pa.int32())
    sev_idx = pc.bit_wise_and(pri, 7)
    sev_sy = pc.take(_SYSLOG_SEV, sev_idx)
    sev_tb = pc.if_else(tb_head, pa.scalar(ERROR, pa.int32()), null_i32)

    severity = _coalesce(sev_ap, sev_kv, sev_js, sev_sy, sev_tb,
                         pa.scalar(0, pa.int32()))
    sev_text = _coalesce(
        severity_name(sev_ap), severity_name(sev_kv), severity_name(sev_js),
        pc.take(_SYSLOG_TEXT, pc.if_else(sy_ok, sev_idx, pa.nulls(len(text), pa.int32()))),
        pc.if_else(tb_head, pa.scalar("error"), null_str),
        pa.scalar(""))

    template = _coalesce(
        pc.if_else(ap_ok, pa.scalar("apache"), null_str),
        pc.if_else(kv_ok, pa.scalar("kv"), null_str),
        pc.if_else(js_ok, pa.scalar("json"), null_str),
        pc.if_else(sy_ok, pa.scalar("syslog"), null_str),
        pc.if_else(tb_head, pa.scalar("traceback"), null_str),
        pc.if_else(tb_cont, pa.scalar("traceback_cont"), null_str),
        pa.scalar("plain"))

    cols = {
        "template": template,
        "severity_number": severity,
        "severity_text": sev_text,
        "client_ip": f(ap, "ip"),
        "http_status": status,
        "http_method": f(ap, "method"),
        "http_path": f(ap, "path"),
        "log_level": f(kv, "level"),
        "error_code": _coalesce(f(kv, "code"), f(js, "code")),
        "latency_ms": pc.cast(f(kv, "latency"), pa.int64()),
        "msg": f(kv, "msg"),
        "syslog_pri": pri,
        "syslog_host": f(sy, "host"),
        "syslog_app": f(sy, "app"),
        "rc": pc.cast(f(sy, "rc"), pa.int32()),
        "tool_attr": _coalesce(f(kv, "tool"), f(sy, "tool")),
    }
    for name, arr in cols.items():
        batch = batch.append_column(name, arr)
    # keep dummy refs with fixed types for schema stability
    _ = null_i64
    return batch


# --- generic operator library --------------------------------------------

def regex_parser(pattern: str, parse_from: str = "text", prefix: str = "",
                 on_error: str = "send"):
    """stanza regex_parser (parser/regex/parser.go:34-66): named captures ->
    new columns named ``prefix+group``. on_error='drop' removes unmatched rows,
    'send' passes them through with nulls (helper/parser.go:98-150)."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        st = pc.extract_regex(col, pattern)
        for name in st.type.names if hasattr(st.type, "names") else [
                st.type.field(i).name for i in range(st.type.num_fields)]:
            batch = batch.append_column(prefix + name, pc.struct_field(st, name))
        if on_error == "drop":
            batch = batch.filter(st.is_valid())
        return batch
    return fn


def _parseutils_pairs(s: str, delimiter: str,
                      pair_delimiter: str, strict: bool = False) -> dict:
    """Exact parseutils.SplitString + ParseKeyValuePairs
    (internal/coreinternal/parseutils/parser.go:16-82): quote-aware
    pair split with quote stripping and backslash escapes, then
    SplitN(2) + TrimSpace on both sides; pairs without the delimiter
    are skipped (the reference records an error per pair and keeps
    the rest); an unterminated quote raises -> whole row unparsed."""
    result, cur = [], []
    dl = len(pair_delimiter)
    quote, esc = "", False
    i, L = 0, len(s)
    while i < L:
        if quote == "" and s[i:i + dl] == pair_delimiter:
            if cur:
                result.append("".join(cur))
                cur = []
            i += dl
            continue
        ch = s[i]
        if not esc:
            if quote == "" and ch in "\"'":
                quote = ch
                i += 1
                continue
            if ch == quote:
                quote = ""
                i += 1
                continue
            esc = ch == "\\"
        else:
            esc = False
        cur.append(ch)
        i += 1
    if quote:
        raise ValueError("never reached the end of a quoted value")
    if cur:
        result.append("".join(cur))
    out = {}
    for p in result:
        k, sep, v = p.partition(delimiter)
        if not sep:
            if strict:
                # ParseKeyValuePairs collects 'cannot split' via multierr
                # and the OTTL ParseKeyValue call FAILS on any such pair;
                # the stanza parser path keeps the rest (strict=False)
                raise ValueError(f"cannot split {p!r} into 2 items")
            continue
        out[k.strip()] = v.strip()
    return out


def keyvalue_parser(parse_from: str = "text", delimiter: str = "=",
                    pair_delimiter: str = " ", keys: list[str] | None = None,
                    prefix: str = "attr_"):
    """stanza key_value_parser (parser/keyvalue/config.go:36-39).

    With an explicit ``keys`` list the extraction is fully vectorized (one
    RE2 pass per key). Without it, falls back to a per-row split (only for
    small control data).
    """
    if keys:
        import re as _re
        # hybrid like the dynamic path: rows WITHOUT quote/backslash chars
        # take one vectorized RE2 pass per key with a greedy prefix so the
        # LAST occurrence of a repeated key wins (parseutils map overwrite
        # semantics); rows WITH them take the exact quote-aware scan —
        # a regex-only keyed path read key tokens inside other keys'
        # quoted values and returned FIRST occurrences.
        pd, dl = _re.escape(pair_delimiter), _re.escape(delimiter)
        stop = _re.escape(pair_delimiter)
        pats = {k: rf'^(?:.*{pd})?{_re.escape(k)}{dl}(?P<v>[^{stop}]*)'
                for k in keys}

        def fn(batch: pa.Table) -> pa.Table:
            import numpy as np
            col = batch[parse_from]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            col = pc.cast(col, pa.string())
            special = pc.fill_null(
                pc.match_substring_regex(col, r'["\'\\]'), False)
            scan_maps: dict[int, dict] = {}
            if pc.any(special).as_py():
                for ridx in np.nonzero(
                        special.to_numpy(zero_copy_only=False))[0]:
                    txt = col[int(ridx)].as_py()
                    if txt is None:
                        continue
                    try:
                        scan_maps[int(ridx)] = _parseutils_pairs(
                            txt, delimiter, pair_delimiter)
                    except ValueError:
                        scan_maps[int(ridx)] = {}
            for k, pat in pats.items():
                v = pc.utf8_trim_whitespace(
                    pc.struct_field(pc.extract_regex(col, pat), "v"))
                if scan_maps:
                    vals = v.to_pylist()
                    for ridx, m in scan_maps.items():
                        vals[ridx] = m.get(k)
                    v = pa.array(vals, pa.string())
                batch = batch.append_column(prefix + k, v)
            return batch
        return fn

    def fn_dynamic(batch: pa.Table) -> pa.Table:
        """Dynamic-keys path: rows WITHOUT quote/backslash characters go
        through the vectorized split -> splitn -> last-value-per-(row,key)
        -> pivot pipeline; rows WITH them take the exact parseutils scan
        (quote-aware splitting can't be expressed as a plain substring
        split). Both honor the reference semantics: keys/values
        whitespace-trimmed, pairs without the delimiter dropped, LAST
        occurrence of a repeated key wins."""
        import polars as pl

        col = batch[parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = batch.num_rows
        s = pl.from_arrow(col)
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        special = s.str.contains(r'["' + "'" + r'\\]').fill_null(False)
        any_special = bool(special.any())
        if any_special:
            s_clean = (pl.DataFrame({"s": s, "m": special})
                       .select(pl.when(pl.col("m")).then(None)
                               .otherwise(pl.col("s")).alias("s"))["s"])
        else:
            s_clean = s
        e = (pl.DataFrame({"_i": pl.int_range(n, eager=True), "_s": s_clean})
             .with_columns(_t=pl.col("_s").str.split(pair_delimiter))
             .explode("_t")
             .with_columns(_kv=pl.col("_t").str.splitn(delimiter, 2))
             .unnest("_kv")
             .filter(pl.col("field_1").is_not_null())
             .with_columns(pl.col("field_0").str.strip_chars())
             .group_by("_i", "field_0")
             .agg(_v=pl.col("field_1").str.strip_chars().last()))
        piv_cols: dict = {}
        if e.height:
            # a discovered key literally named "_i" (or "_i_", ...) would
            # collide with the pivot's index column: pick an index name
            # not present among this batch's keys (the key set is small)
            uniq = set(e["field_0"].to_list())
            idx = "_i"
            while idx in uniq:
                idx += "_"
            piv = e.rename({"_i": idx}).pivot(on="field_0", index=idx,
                                              values="_v") \
                .join(pl.DataFrame({idx: pl.int_range(n, eager=True)}),
                      on=idx, how="right").sort(idx)
            for k in piv.columns:
                if k != idx:
                    piv_cols[k] = piv[k].to_arrow().cast(pa.string())
        scan_maps: dict = {}
        if any_special:
            sp_idx = np.nonzero(special.to_numpy())[0]
            for ridx in sp_idx:
                txt = s[int(ridx)]
                if txt is None:
                    continue
                try:
                    scan_maps[int(ridx)] = _parseutils_pairs(
                        txt, delimiter, pair_delimiter)
                except ValueError:
                    pass
        scan_keys = {k for m in scan_maps.values() for k in m}
        for k in sorted(set(piv_cols) | scan_keys):
            arr = piv_cols.get(k)
            if arr is None:
                arr = pa.nulls(n, pa.string())
            if k in scan_keys:
                mask = np.zeros(n, bool)
                vals = []
                for ridx in sorted(scan_maps):
                    if k in scan_maps[ridx]:
                        mask[ridx] = True
                        vals.append(scan_maps[ridx][k])
                arr = pc.replace_with_mask(arr, pa.array(mask),
                                           pa.array(vals, pa.string()))
            batch = batch.append_column(prefix + k, arr)
        return batch
    return fn_dynamic


def json_parser(parse_from: str = "text", fields: dict[str, str] | None = None,
                prefix: str = "attr_"):
    """stanza json_parser (parser/json/parser.go). ``fields`` maps output
    column -> JSONPath (e.g. '$.error.code'); extraction runs in polars'
    vectorized json_path_match kernel (Rust, zero-copy from Arrow). Without
    ``fields``, the whole body is decoded to a struct column 'parsed'."""
    import polars as pl

    def fn(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch[parse_from])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        if fields:
            for out, path in fields.items():
                arr = s.str.json_path_match(path).to_arrow()
                batch = batch.append_column(prefix + out, pc.cast(arr, pa.string()))
            return batch
        try:
            decoded = s.str.json_decode()
        except pl.exceptions.ComputeError:
            # malformed rows -> null instead of failing the batch; pin the
            # dtype — an all-None list infers Null and json_decode would
            # raise SchemaError, failing the rescue path itself
            ok = [None if v is None else
                  (v if _is_json(v) else None) for v in s.to_list()]
            decoded = pl.Series(ok, dtype=pl.String).str.json_decode()
        return batch.append_column("parsed", decoded.to_arrow())
    return fn


def _is_json(v: str) -> bool:
    import json as _json
    try:
        _json.loads(v)
        return True
    except ValueError:
        return False


def _read_csv_row(row: str, delimiter: str) -> list[str]:
    """parseutils.ReadCSVRow (internal/coreinternal/parseutils/csv.go:
    18-70): quote-aware single-entry CSV parse; embedded newlines split
    the reader's output into multiple lines, and each subsequent line is
    a continuation of the previous line's LAST field (joined with \\n)."""
    import csv as _csv
    import io as _io

    lines = [ln for ln in _csv.reader(_io.StringIO(row),
                                      delimiter=delimiter) if ln]
    if not lines:
        raise ValueError("no csv lines found")
    joined = lines[0]
    for nxt in lines[1:]:
        joined[-1] += "\n" + nxt[0]
        joined.extend(nxt[1:])
    return joined


def csv_parser(parse_from: str = "text", header: list[str] | None = None,
               delimiter: str = ",", prefix: str = "",
               header_col: str | None = None,
               header_delimiter: str | None = None,
               ignore_quotes: bool = False):
    """stanza csv_parser (parser/csv/config.go:30-42, parser.go).

    Semantics mirror the reference: the field count must EQUAL the header
    count (MapCSVHeaders errors otherwise -> the row's parsed fields are
    all null, the batch analogue of on_error=send); quotes protect
    delimiters and are stripped unless ``ignore_quotes`` (which selects
    the plain-split parse, generateSplitParseFunc); ``header_col`` reads
    per-row headers from another column (header_attribute), split on
    ``header_delimiter`` (defaults to ``delimiter``).

    Plan: quote-free rows with the right field count go through one
    vectorized split; rows with quotes (or a dynamic header) take the
    exact per-row reader."""
    header = header or []
    hdelim = header_delimiter or delimiter

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.cast(col, pa.string())
        n = batch.num_rows

        if header_col is not None:
            # dynamic per-row headers: exact path, discovered-column union
            hcol = pc.cast(batch[header_col], pa.string()).to_pylist() \
                if header_col in batch.column_names else [None] * n
            maps: list[dict] = []
            for txt, h in zip(col.to_pylist(), hcol):
                d: dict = {}
                if txt is not None and h:
                    names = h.split(hdelim)
                    try:
                        fields = (txt.split(delimiter) if ignore_quotes
                                  else _read_csv_row(txt, delimiter))
                        if len(fields) == len(names):
                            d = dict(zip(names, fields))
                    except ValueError:
                        pass
                maps.append(d)
            for name in sorted({k for d in maps for k in d}):
                batch = batch.append_column(
                    prefix + name,
                    pa.array([d.get(name) for d in maps], pa.string()))
            return batch

        H = len(header)
        parts = pc.split_pattern(col, delimiter)
        offsets = np.asarray(parts.offsets)
        lengths = offsets[1:] - offsets[:-1]
        values = parts.values
        if ignore_quotes:
            special = np.zeros(n, bool)
        else:
            special = pc.fill_null(pc.match_substring(col, '"'), False) \
                .to_numpy(zero_copy_only=False).astype(bool)
        # the reference errors a row whose field count != header count ->
        # every parsed field null for that row
        ok = (~special) & (lengths == H)
        scan: dict[int, list[str]] = {}
        if special.any():
            for ridx in np.nonzero(special)[0]:
                txt = col[int(ridx)].as_py()
                if txt is None:
                    continue
                try:
                    fields = _read_csv_row(txt, delimiter)
                except ValueError:
                    continue
                if len(fields) == H:
                    scan[int(ridx)] = fields
        for i, name in enumerate(header):
            take = pa.array(np.where(ok, offsets[:-1] + i, 0), pa.int64())
            val = (pc.if_else(pa.array(ok), pc.take(values, take),
                              pa.nulls(n, values.type))
                   if len(values) else pa.nulls(n, pa.string()))
            if scan:
                mask = np.zeros(n, bool)
                repl = []
                for ridx in sorted(scan):
                    mask[ridx] = True
                    repl.append(scan[ridx][i])
                val = pc.replace_with_mask(pc.cast(val, pa.string()),
                                           pa.array(mask),
                                           pa.array(repl, pa.string()))
            batch = batch.append_column(prefix + name, val)
        return batch
    return fn


def _expand_severity_ranges(mapping: dict) -> dict[str, int]:
    """severity_builder.go:94-104 expandRange: '2xx'..'5xx' keys expand to
    the 100 literal status tokens; (min, max) tuple keys expand likewise
    (the reference's {min:, max:} range objects)."""
    import re as _re
    out: dict[str, int] = {}
    for k, v in mapping.items():
        if isinstance(k, tuple):
            lo, hi = k
            for s in range(int(lo), int(hi) + 1):
                out[str(s)] = v
        elif isinstance(k, str) and _re.fullmatch(r"[1-9]xx", k.lower()):
            base = int(k[0]) * 100
            for s in range(base, base + 100):
                out[str(s)] = v
        else:
            out[str(k).lower()] = v
    return out


def _expand_severity_mapping_ref(mapping: dict) -> dict[str, int]:
    """Reference-shaped custom mapping (severity_builder.go:56-114):
    keys are SEVERITY NAMES ('error', 'error2', ...), values are a token,
    an int token, a {'min','max'} range, or a LIST mixing those. Expands
    to the same token->number dict the column kernel consumes."""
    from ..model import SEVERITY_NAMES
    name_to_num = {v: k for k, v in SEVERITY_NAMES.items()}
    out: dict[str, int] = {}

    def one(num: int, v) -> None:
        if isinstance(v, dict):
            lo, hi = int(v["min"]), int(v["max"])
            if lo > hi:  # buildRange swaps out-of-order bounds
                lo, hi = hi, lo
            for s in range(lo, hi + 1):
                out[str(s)] = num
        elif isinstance(v, list):
            for item in v:
                one(num, item)
        elif isinstance(v, str) and re.fullmatch(r"[1-9]xx", v.lower()):
            base = int(v[0]) * 100
            for s in range(base, base + 100):
                out[str(s)] = num
        elif isinstance(v, float) and v == int(v):
            out[str(int(v))] = num
        else:
            out[str(v).lower()] = num

    for name, v in mapping.items():
        key = str(name).lower()
        num = name_to_num.get(key)
        if num is None and key.isdigit() and 0 <= int(key) <= 24:
            num = int(key)  # numeric keys name the severity value directly
        if num is None:
            raise ValueError(f"unknown severity name {name!r} in mapping")
        one(num, v)
    return out


def severity_parser(parse_from: str, mapping: dict | None = None,
                    out_num: str = "severity_number",
                    out_text: str = "severity_text",
                    mapping_shape: str = "tokens",
                    overwrite_text: bool | None = None):
    """stanza severity_parser (parser/severity + helper/severity_builder.go).
    Maps a token column through the (default or custom) mapping; unmapped
    tokens -> 0.

    ``mapping_shape``: 'tokens' = this repo's column-model shape
    ({token_or_range: number}); 'reference' = the stanza config shape
    ({severity_name: token|int|range|list}, severity_builder.go:56-114).

    ``overwrite_text``: None (column-model default, what the oracle gate
    pins) writes the canonical lowercase name for every row; False keeps
    the ORIGINAL token text (the reference default); True writes the
    canonical UPPERCASE name on matched rows, original text on unmatched
    (helper/severity.go overwrite_text)."""
    m = dict(default_severity_mapping())
    if mapping:
        if mapping_shape == "reference":
            m.update(_expand_severity_mapping_ref(mapping))
        else:
            m.update(_expand_severity_ranges(mapping))
    keys = pa.array(list(m.keys()), pa.string())
    vals = pa.array(list(m.values()), pa.int32())

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col_s = pc.cast(col, pa.string())
        idx = pc.index_in(pc.utf8_lower(col_s), value_set=keys)
        matched = pc.is_valid(idx)
        num = pc.coalesce(pc.take(vals, idx), pa.scalar(0, pa.int32()))
        if overwrite_text is None:
            txt = pc.coalesce(severity_name(num), pa.scalar("default"))
        elif overwrite_text:
            canon = pc.utf8_upper(severity_name(num))
            txt = pc.if_else(matched, canon, col_s)
        else:
            txt = col_s
        batch = _set_column(batch, out_num, num)
        batch = _set_column(batch, out_text, txt)
        return batch
    return fn


def time_parser(parse_from: str, layout: str, layout_type: str = "strptime",
                out: str = "ts_parsed"):
    """stanza time_parser (helper/time.go:19-29,138-175): strptime or
    epoch(s|ms|us|ns) -> timestamp[us]."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if layout_type == "strptime":
            parsed = pc.strptime(col, format=layout, unit="us",
                                 error_is_null=True)
        elif layout_type == "epoch":
            if layout in ("s.ms", "s.us", "s.ns"):
                # fractional-seconds layouts (helper/time.go parseUnix):
                # float seconds, truncated to the layout's precision
                # (engine cap: us — s.ns rounds to the nearest us)
                f = pc.cast(col, pa.float64())
                us = pc.round(pc.multiply(f, 1e6))
                if layout == "s.ms":
                    us = pc.multiply(
                        pc.floor(pc.divide(us, 1000.0)), 1000.0)
                v = pc.cast(us, pa.int64())
            else:
                unit = {"s": 1_000_000, "ms": 1_000, "us": 1,
                        "ns": 1}[layout]
                v = pc.cast(pc.cast(col, pa.float64()), pa.int64()) \
                    if pa.types.is_floating(col.type) \
                    else pc.cast(col, pa.int64())
                if layout == "ns":
                    v = pc.divide(v, 1000)
                else:
                    v = pc.multiply(v, unit)
            parsed = pc.cast(v, pa.timestamp("us"))
        else:
            raise ValueError(f"unknown layout_type {layout_type}")
        return _set_column(batch, out, parsed)
    return fn


def _set_column(batch: pa.Table, name: str, arr) -> pa.Table:
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)


# --- syslog RFC3164 (parser/syslog/parser.go BSD format path) -------------

RFC3164_RE = (r'^<(?P<pri>1[0-8]\d|19[01]|\d{1,2})>(?P<ts>[A-Z][a-z]{2} [ \d]\d '
              r'\d{2}:\d{2}:\d{2}) (?P<host>\S+) '
              r'(?P<app>[^\[:]+)(?:\[(?P<pid>\d+)\])?: (?P<msg>.*)$')


def syslog_rfc3164_parser(parse_from: str = "text", prefix: str = "syslog_"):
    """RFC3164 (BSD) syslog: `<pri>Mmm dd hh:mm:ss host app[pid]: msg` ->
    pri/host/app/pid/msg columns + severity from pri&7 (parser.go:239-260).
    Unmatched rows pass through with nulls (on_error=send)."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        st = pc.extract_regex(col, RFC3164_RE)
        pri = pc.cast(pc.struct_field(st, "pri"), pa.int32())
        sev_idx = pc.bit_wise_and(pri, 7)
        for name in ("host", "app", "pid", "msg"):
            batch = _set_column(batch, prefix + name, pc.struct_field(st, name))
        batch = _set_column(batch, prefix + "pri", pri)
        batch = _set_column(batch, prefix + "facility",
                            pc.cast(pc.divide(pri, 8), pa.int32()))
        parsed_num = pc.take(_SYSLOG_SEV, sev_idx)
        parsed_txt = pc.take(_SYSLOG_TEXT, sev_idx)
        # unmatched rows keep any severity set by earlier parsers
        # (on_error=send must not clobber the chain)
        old_num = batch["severity_number"] \
            if "severity_number" in batch.column_names \
            else pa.nulls(batch.num_rows, pa.int32())
        old_txt = batch["severity_text"] \
            if "severity_text" in batch.column_names \
            else pa.nulls(batch.num_rows, pa.string())
        batch = _set_column(batch, "severity_number",
                            pc.coalesce(parsed_num, old_num,
                                        pa.scalar(0, pa.int32())))
        batch = _set_column(batch, "severity_text",
                            pc.coalesce(parsed_txt, old_txt, pa.scalar("")))
        return batch
    return fn


def jsonarray_parser(parse_from: str = "text", header: list[str] | None = None,
                     prefix: str = ""):
    """stanza jsonarray_parser (parser/jsonarray/config.go:47-48): JSON
    array body -> positional named columns. Decode is polars' vectorized
    json_decode to list<utf8> (scalar values stringified — flat model,
    DIVERGENCES.md); positional access is the ragged-safe offset
    arithmetic shared with assign_keys. With a header, the array length
    must EQUAL the header length (parser.go:88-89 errors otherwise) —
    a mismatched row's parsed fields are all null."""
    import polars as pl

    header = header or []

    def fn(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch[parse_from])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        try:
            lst = s.str.json_decode(pl.List(pl.Utf8)).to_arrow()
        except pl.exceptions.ComputeError:
            # a malformed row fails polars' whole-column decode; fall back
            # per row with null for bad JSON (on_error=send)
            import json as _json

            def one(v):
                if v is None:
                    return None
                try:
                    d = _json.loads(v)
                except ValueError:
                    return None
                if not isinstance(d, list):
                    return None
                return ["true" if x is True else "false" if x is False
                        else _json.dumps(x, separators=(",", ":"))
                        if isinstance(x, (dict, list)) else str(x)
                        for x in d]
            lst = pa.array([one(v) for v in s.to_list()],
                           pa.list_(pa.string()))
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        lst = lst.cast(pa.list_(pa.string()))
        # ragged-safe positional access shared with assign_keys
        # (functions/maps.list_parts rebases sliced arrays)
        from ..functions.maps import list_parts
        offsets, values, lvalid = list_parts(lst)
        lengths = offsets[1:] - offsets[:-1]
        valid = np.asarray(lvalid)
        ok = (lengths == len(header)) & valid
        for i, name in enumerate(header):
            has = ok
            take = pa.array(np.where(has, offsets[:-1] + i, 0), pa.int64())
            val = (pc.if_else(pa.array(has), pc.take(values, take),
                              pa.nulls(batch.num_rows, pa.string()))
                   if len(values) else pa.nulls(batch.num_rows, pa.string()))
            batch = batch.append_column(prefix + name, val)
        return batch
    return fn


def _hex_to_bytes(col) -> pa.Array:
    """Best-effort hex decode per DISTINCT value (helper/trace.go
    parseHexField): invalid hex -> null."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = pc.dictionary_encode(pc.cast(col, pa.string()))
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()

    def dec(v):
        try:
            return bytes.fromhex(v)
        except ValueError:
            return None

    uniq = pa.array([None if v is None else dec(v)
                     for v in d.dictionary.to_pylist()], pa.binary())
    return pc.take(uniq, d.indices)


def trace_parser(trace_from: str = "trace_id", span_from: str = "span_id",
                 flags_from: str | None = "trace_flags",
                 prefix: str = ""):
    """stanza trace_parser (parser/trace/config.go:34-35 + helper/trace.go):
    hex string fields -> trace_id/span_id byte columns (+ int trace_flags).
    Best-effort: invalid hex -> null (the reference's on_error=send path)."""
    def fn(batch: pa.Table) -> pa.Table:
        if trace_from in batch.column_names:
            batch = _set_column(batch, prefix + "trace_id",
                                _hex_to_bytes(batch[trace_from]))
        if span_from in batch.column_names:
            batch = _set_column(batch, prefix + "span_id",
                                _hex_to_bytes(batch[span_from]))
        if flags_from and flags_from in batch.column_names:
            f = batch[flags_from]
            if isinstance(f, pa.ChunkedArray):
                f = f.combine_chunks()
            flags_bytes = _hex_to_bytes(f)
            first = pc.binary_slice(flags_bytes, 0, 1)
            # byte -> int per DISTINCT value (<= 256), like _hex_to_bytes:
            # no Python-per-row loop in this hot path
            d = pc.dictionary_encode(first)
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            ints = pa.array(
                [None if v is None or len(v) == 0 else v[0]
                 for v in d.dictionary.to_pylist()], pa.int32())
            as_int = pc.take(ints, d.indices) if len(ints) else \
                pa.nulls(batch.num_rows, pa.int32())
            batch = _set_column(batch, prefix + "trace_flags", as_int)
        return batch
    return fn


def scope_parser(parse_from: str, out: str = "scope_name"):
    """stanza scope_parser (parser/scope/config.go:34-35): field ->
    instrumentation scope name column."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return _set_column(batch, out, pc.cast(col, pa.string()))
    return fn
