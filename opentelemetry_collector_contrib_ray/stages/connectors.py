"""Connector-family operators beyond routing/count/sum (SURVEY.md §2.7-2.8)
plus the remaining stanza parsers (uri, container) and otlpjson.

- otlpjson_connector: re-parse OTLP-JSON-ish payload columns back into typed
  columns (connector/otlpjsonconnector/logs.go:43-64) — polars' Rust JSON
  path kernel, zero-copy from Arrow.
- uri_parser: stanza parser/uri (config.go:33) — URL -> component columns.
- container_parser: stanza parser/container (config.go:47-51) — docker /
  containerd(cri) log lines + path-derived metadata.
- groupbyattrs: re-key records under a promoted resource identity
  (processor/groupbyattrsprocessor/processor.go:63-99): in flat-table form
  the ResourceLogs grouping is a derived resource-id column (canonical
  over the promoted attrs), usable as a partition key.
- roundrobin: connector/roundrobinconnector -> ds.split(n).
- failover: connector/failoverconnector -> sink wrapper that falls back to
  the next sink callable on error.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..functions.ottl import URL_RE
from .aggregate import canonical_identity


def otlpjson_parser(parse_from: str, fields: dict[str, tuple[str, str]],
                    prefix: str = ""):
    """Extract JSONPath fields from a JSON string column into typed columns.

    fields: {out_col: (json_path, type)} with type in {int, double, string}.
    Uses polars' vectorized json_path_match (Rust) — no Python row loop.
    """
    import polars as pl

    types = {"int": pa.int64(), "double": pa.float64(), "string": pa.string()}

    def fn(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch[parse_from])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        for out, (path, typ) in fields.items():
            vals = s.str.json_path_match(path).to_arrow()
            arr = pc.cast(pc.cast(vals, pa.string()), types[typ])
            batch = batch.append_column(prefix + out, arr)
        return batch
    return fn


# RFC-3986-shaped grammar matching what Go's url.ParseRequestURI accepts
# for the stanza uri parser (pkg/stanza/operator/parser/uri/parser.go ->
# internal/coreinternal/parseutils/uri.go ParseURI/urlToMap): optional
# scheme, optional //authority (user@host:port), path, ?query. One
# divergence: '#fragment' is split off here, while ParseRequestURI leaves
# '#' in the path (request URIs never carry fragments in practice).
_URI_RE = (r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*):)?"
           r"(?:(?P<slashes>//)(?:(?P<userinfo>[^@/?#]*)@)?"
           r"(?P<host>[^:/?#]*)(?::(?P<port>[0-9]*))?)?"
           r"(?P<path>[^?#]*)"
           r"(?:\?(?P<query>[^#]*))?"
           r"(?:#(?P<fragment>.*))?$")

# a '%' not followed by exactly two hex digits (RE2-safe, no lookahead):
# Go's url.Parse/QueryUnescape reject the component -> the entry errors.
_BAD_PCT_RE = r"%([0-9A-Fa-f]?$|[^0-9A-Fa-f]|[0-9A-Fa-f][^0-9A-Fa-f])"


def _chunked(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _empty_to_null(arr: pa.Array) -> pa.Array:
    """'' -> null: urlToMap omits unset components; extract_regex reports
    a non-participating group as '' (it has no absent marker)."""
    return pc.if_else(pc.equal(pc.fill_null(arr, ""), ""),
                      pa.nulls(len(arr), pa.string()), arr)


QUERY_MAP_TYPE = pa.map_(pa.string(), pa.list_(pa.string()))


def query_values_map(q: pa.Array) -> pa.Array:
    """Go url.ParseQuery as a vectorized column op: '&'-separated tokens,
    key/value split at the FIRST '=' ('='-less token -> value ''), empty
    tokens skipped, percent+plus decoded, repeated keys accumulate values
    in occurrence order -> map<string, list<string>> (keys sorted by name:
    a Go map has no order). Null or empty input -> null map (queryToMap
    creates no 'query' key for an empty url.Values).

    Decode cost is O(distinct tokens) via dictionary encoding (the md5_hex
    trick, stages/dedup.py) — log query strings repeat heavily.
    """
    from urllib.parse import unquote_plus

    q = _chunked(q)
    n = len(q)
    has_q = pc.and_(pc.is_valid(q),
                    pc.not_equal(pc.fill_null(q, ""), "")) \
        .to_numpy(zero_copy_only=False)
    parts = _chunked(pc.split_pattern(pc.fill_null(q, ""), "&"))
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    flat = _chunked(parts.flatten())
    rows = np.repeat(np.arange(n, dtype=np.int64),
                     counts.astype(np.int64))
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    flat, rows = flat.filter(pa.array(nonempty)), rows[nonempty]

    if len(flat) == 0:
        offs = np.zeros(n + 1, np.int32).astype(object)
        offs[:-1][~has_q] = None
        return pa.MapArray.from_arrays(
            pa.array(list(offs), pa.int32()),
            pa.array([], pa.string()),
            pa.ListArray.from_arrays(pa.array([0], pa.int32()),
                                     pa.array([], pa.string())))

    d = pc.dictionary_encode(flat)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    ku, vu = [], []
    for tok in d.dictionary.to_pylist():
        k, _, v = tok.partition("=")
        ku.append(unquote_plus(k))
        vu.append(unquote_plus(v))
    idx = d.indices.to_numpy(zero_copy_only=False)
    keys_np = np.asarray(ku, object)[idx]
    vals_np = np.asarray(vu, object)[idx]

    ukeys, codes = np.unique(keys_np, return_inverse=True)
    order = np.lexsort((np.arange(len(rows)), codes, rows))
    r_s, c_s, v_s = rows[order], codes[order], vals_np[order]
    new_entry = np.ones(len(r_s), bool)
    new_entry[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
    val_offsets = np.concatenate(
        [np.flatnonzero(new_entry), [len(r_s)]]).astype(np.int32)
    items = pa.ListArray.from_arrays(pa.array(val_offsets),
                                     pa.array(v_s, pa.string()))
    keys_arr = pa.array(ukeys[c_s[new_entry]], pa.string())
    ent_per_row = np.bincount(r_s[new_entry], minlength=n)
    map_offsets = np.concatenate(
        [[0], np.cumsum(ent_per_row)]).astype(np.int32).astype(object)
    map_offsets[:-1][~has_q] = None  # null offset -> null map row
    return pa.MapArray.from_arrays(pa.array(list(map_offsets), pa.int32()),
                                   keys_arr, items)


def uri_parser(parse_from: str, prefix: str = "uri_",
               query_map: bool = True):
    """stanza uri parser: URL string -> scheme/user/host/port/path/query
    columns plus (``query_map=True``) the reference's url.Values map
    (``<prefix>query_map``: map<string, list<string>>).

    Mirrors parseutils.ParseURI(semconv=false): a leading '?' means a bare
    query string; otherwise the input must have a scheme or a '/'-rooted
    path (url.ParseRequestURI), components are omitted (null) when unset,
    and a row errors to all-null when the shape is invalid, a component
    has a malformed %-escape, or the query contains ';' (Go rejects the
    legacy semicolon separator). The raw query string column is kept
    alongside the map (null when no '?': the map alone loses the
    raw-vs-decoded distinction some pipelines filter on).
    """
    big = 2 ** 31 - 1

    def fn(batch: pa.Table) -> pa.Table:
        col = _chunked(batch[parse_from])
        st = pc.extract_regex(col, _URI_RE)
        matched = pc.is_valid(st)
        f = {name: pc.fill_null(pc.struct_field(st, name), "")
             for name in ("scheme", "userinfo", "host", "port", "path",
                          "query", "slashes")}
        bare = pc.fill_null(pc.starts_with(col, "?"), False)
        qsrc = pc.if_else(bare, pc.utf8_slice_codeunits(
            pc.fill_null(col, ""), 1, big), f["query"])
        shape_ok = pc.or_(pc.or_(pc.not_equal(f["scheme"], ""),
                                 pc.starts_with(f["path"], "/")), bare)
        # invalid port: with an authority present the path must be empty
        # or '/'-rooted. 'http://host:abc/x' leaves the port group empty
        # (':' consumed, no digits) and the remainder lands in path —
        # url.ParseRequestURI errors ('invalid port'), the stanza parser
        # nulls the entry (parseutils/uri.go ParseURI error path).
        bad_authority_path = pc.and_(
            pc.equal(f["slashes"], "//"),
            pc.and_(pc.not_equal(f["path"], ""),
                    pc.invert(pc.starts_with(f["path"], "/"))))
        shape_ok = pc.and_(shape_ok, pc.invert(bad_authority_path))
        bad = pc.match_substring_regex(f["userinfo"], _BAD_PCT_RE)
        for comp in ("host", "path"):
            bad = pc.or_(bad, pc.match_substring_regex(f[comp], _BAD_PCT_RE))
        bad = pc.or_(bad, pc.match_substring_regex(qsrc, _BAD_PCT_RE))
        bad = pc.or_(bad, pc.match_substring(qsrc, ";"))
        ok = pc.and_(pc.and_(matched, shape_ok), pc.invert(bad))

        def gate(arr):
            return pc.if_else(ok, arr, pa.nulls(len(col), arr.type))

        user = pc.if_else(
            pc.match_substring(f["userinfo"], ":"),
            pc.utf8_slice_codeunits(
                pc.list_element(pc.split_pattern(
                    f["userinfo"], ":", max_splits=1), 0), 0, big),
            f["userinfo"])
        out = {
            "scheme": f["scheme"], "user": user, "host": f["host"],
            "port": f["port"], "path": f["path"],
        }
        for name, arr in out.items():
            batch = batch.append_column(prefix + name,
                                        gate(_empty_to_null(arr)))
        # raw query: null when there is no '?' at all (bare '?' -> '')
        raw_q = pc.if_else(
            pc.or_(bare, pc.match_substring(pc.fill_null(col, ""), "?")),
            qsrc, pa.nulls(len(col), pa.string()))
        batch = batch.append_column(prefix + "query", gate(raw_q))
        if query_map:
            qm = query_values_map(pc.if_else(ok, qsrc,
                                             pa.nulls(len(col), pa.string())))
            batch = batch.append_column(prefix + "query_map", qm)
        return batch
    return fn


# docker json-file lines and containerd (cri) lines
_CRI_RE = (r"^(?P<time>\S+) (?P<stream>stdout|stderr) (?P<logtag>[PF]) "
           r"(?P<log>.*)$")
_PATH_RE = (r"/pods/(?P<namespace>[^_]+)_(?P<pod_name>[^_]+)_(?P<pod_uid>[^/]+)"
            r"/(?P<container_name>[^/]+)/(?P<restart_count>\d+)\.log$")


def container_parser(parse_from: str = "text", path_col: str | None = None):
    """stanza container parser: CRI-format line split + (optionally) k8s
    metadata derived from the log file path (parser/container/config.go)."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        st = pc.extract_regex(col, _CRI_RE)
        for name in ("time", "stream", "logtag", "log"):
            batch = batch.append_column("cri_" + name, pc.struct_field(st, name))
        if path_col is not None:
            p = batch[path_col]
            if isinstance(p, pa.ChunkedArray):
                p = p.combine_chunks()
            meta = pc.extract_regex(p, _PATH_RE)
            for name in ("namespace", "pod_name", "pod_uid", "container_name",
                         "restart_count"):
                batch = batch.append_column("k8s_" + name,
                                            pc.struct_field(meta, name))
        return batch
    return fn


def groupbyattrs(keys: list[str], out_col: str = "resource_id"):
    """Derive the promoted-resource identity column: records sharing the
    same values of ``keys`` belong to one Resource (the flat-table form of
    the groupbyattrs re-association; also the natural partition key)."""
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, canonical_identity(batch, keys))
    return fn


def roundrobin(ds: Dataset, n: int) -> list[Dataset]:
    """roundrobinconnector: distribute the stream across n pipelines.
    equal=False: equal=True may DROP records to even the splits, and a
    connector must deliver every record to some pipeline."""
    return ds.split(n, equal=False)


def failover_sink(*sinks):
    """failoverconnector: call sinks in priority order per batch; first
    success wins. Each sink: fn(batch) -> batch (writer stages)."""
    def fn(batch: pa.Table) -> pa.Table:
        last_err: Exception | None = None
        for s in sinks:
            try:
                return s(batch)
            except Exception as e:  # noqa: BLE001 - failover by design
                last_err = e
        raise last_err  # all sinks failed
    return fn


def exceptions_connector(ds: Dataset, *, condition, dims: list[str],
                         count_col: str = "exceptions_count",
                         mode: str = "metrics",
                         default_value: str = ""):
    """connector/exceptionsconnector: exception events -> metrics (counts
    keyed by service/type dimensions) or logs (the matching records,
    exception attributes attached upstream). ``condition`` is an Expr mask
    selecting exception rows (the batch form of the span-event
    'exception' filter in connector_logs.go / connector_metrics.go)."""
    from .aggregate import count_by

    if mode == "metrics":
        return count_by(ds, dims, condition=condition, count_col=count_col,
                        default_value=default_value)
    if mode == "logs":
        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(condition.mask(batch))
        return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
    raise ValueError(f"exceptions_connector: bad mode {mode!r}")


def signal_to_metrics(ds: Dataset, metric_defs: list[dict]) -> dict:
    """connector/signaltometricsconnector: generic OTTL-driven
    signal->metric. Each def: {name, type: count|sum|histogram,
    conditions: [OTTL condition strings, OR-ed — README 'Conditions'],
    attributes: [group-by cols], value: column (sum/histogram),
    bounds: [...] (histogram)}.

    Conditions use the REAL OTTL condition grammar via the statement
    engine's evaluator (pipelines/statements.py), so configs port over
    verbatim. Returns {name: Dataset} of metric tables.
    """
    from ..functions.ottl_parser import parse_ottl_condition
    from ..pipelines.statements import DEFAULT_COLMAP, _Ctx, _to_mask, \
        eval_expr
    from .aggregate import count_by, sum_by
    from .metrics import histogram_by

    out: dict = {}
    for d in metric_defs:
        conds = [parse_ottl_condition(c) for c in d.get("conditions", [])]

        def make_filter(conds=conds):
            def fn(batch: pa.Table) -> pa.Table:
                if not conds:
                    return batch
                ctx = _Ctx(batch, dict(DEFAULT_COLMAP))
                gate = None
                for c in conds:
                    m = _to_mask(eval_expr(c, ctx), ctx.n)
                    gate = m if gate is None else pc.or_kleene(gate, m)
                return batch.filter(pc.fill_null(gate, False))
            return fn

        filtered = ds.map_batches(make_filter(), batch_format="pyarrow",
                                  batch_size=None) if conds else ds
        typ = d.get("type", "count")
        # attributes are optional in the reference config: no attributes
        # = one unsegmented metric (grouped on nothing)
        attrs = d.get("attributes", [])
        if typ == "count":
            out[d["name"]] = count_by(filtered, attrs, count_col="value")
        elif typ == "sum":
            out[d["name"]] = sum_by(filtered, attrs, d["value"],
                                    sum_col="value")
        elif typ == "histogram":
            out[d["name"]] = histogram_by(filtered, attrs, d["value"],
                                          d["bounds"])
        else:
            raise ValueError(f"signal_to_metrics: bad type {typ!r}")
    return out
