"""transformprocessor statement-group executor.

Reference config shape (processor/transformprocessor/internal/common/
config.go:38-48): a list of ContextStatements groups
``{context: log|resource|scope, conditions: [...], statements: [...],
error_mode: ignore|silent|propagate}``; execution walks groups in order,
evaluates the OR-ed conditions per record, and runs each ``editor(...)
where <cond>`` statement against matching records
(internal/logs/processor.go:31-77). Severity enum constants, the
per-record ``cache`` scratch map, and nil-skipping `set` come from
pkg/ottl/contexts/ottllog.

Vectorized re-expression: one group == one pass over the Arrow batch.
Conditions and `where` clauses compile to boolean masks; editors become
masked column rewrites (pc.if_else / concat+take for nested types).
error_mode matches the reference's PER-RECORD isolation: under
ignore/silent a failing statement triggers a bisecting retry
(_apply_rowsafe) that applies the statement to every non-poisoned row
and skips only the failing records, after an O(1) empty-slice probe
separates config-level errors (skip for all rows) from data-dependent
ones; propagate raises.

The statement text itself is real OTTL (parsed by
functions/ottl_parser.py), so reference e2e cases replay verbatim:

    groups = [{
        "context": "log",
        "conditions": ['body == "operationA"'],
        "statements": ['set(attributes["test"], "pass")',
                       'set(body, ConvertCase(body, "upper"))'],
        "error_mode": "ignore",
    }]
    ds = ds.map_batches(transform_processor(groups),
                        batch_format="pyarrow", batch_size=None)
"""

from __future__ import annotations

import logging
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import jsonpath as J
from ..functions import maps as M
from ..functions import ottl as F
from ..functions.ottl_parser import parse_ottl_condition, parse_statement
from . import metric_editors as ME

logger = logging.getLogger(__name__)

# log-context path -> flat column (SURVEY.md §1.3 envelope mapping)
DEFAULT_COLMAP = {
    "body": "body", "time": "ts", "observed_time": "observed_ts",
    "severity_number": "severity_number", "severity_text": "severity_text",
    "trace_id": "trace_id", "span_id": "span_id", "flags": "flags",
    "attributes": "attributes", "resource.attributes": "resource",
    "instrumentation_scope.name": "scope_name",
    "instrumentation_scope.version": "scope_version",
    "instrumentation_scope.attributes": "scope_attributes",
    "instrumentation_scope.schema_url": "scope_schema_url",
    "resource.schema_url": "resource_schema_url",
    "scope.name": "scope_name", "scope.version": "scope_version",
    "scope.attributes": "scope_attributes",
    "scope.schema_url": "scope_schema_url",
}


def _rewrite_paths(node, fn):
    """Recursively rewrite every ("path", segs) node of a parsed AST."""
    if not isinstance(node, tuple):
        return node
    k = node[0]
    if k == "path":
        return fn(node)
    if k in ("lit", "fname"):
        return node
    if k == "list":
        return ("list", [_rewrite_paths(e, fn) for e in node[1]])
    if k == "map":
        return ("map", [(key, _rewrite_paths(e, fn)) for key, e in node[1]])
    if k == "call":
        return ("call", node[1], [_rewrite_paths(a, fn) for a in node[2]],
                {kk: _rewrite_paths(v, fn) for kk, v in node[3].items()})
    if k == "index":
        return ("index", _rewrite_paths(node[1], fn),
                _rewrite_paths(node[2], fn))
    if k == "binop":
        return ("binop", node[1], _rewrite_paths(node[2], fn),
                _rewrite_paths(node[3], fn))
    if k == "bool":
        return ("bool", node[1], [_rewrite_paths(e, fn) for e in node[2]])
    if k == "not":
        return ("not", _rewrite_paths(node[1], fn))
    if k == "editor":
        return ("editor", node[1],
                [_rewrite_paths(a, fn) for a in node[2]],
                {kk: _rewrite_paths(v, fn) for kk, v in node[3].items()},
                _rewrite_paths(node[4], fn) if node[4] is not None else None)
    return node


def _strip_context_prefix(node, context: str):
    """grammar.go path: ``(Context '.')? Fields`` — inside a group of
    context C, a leading ``C.`` on any path is the explicit context name
    and resolves to the same object as the bare path (``log.body`` ==
    ``body`` in a log group; processor_test.go runs every case in both
    spellings). Lower-context prefixes (``resource.`` inside a log group)
    are NOT stripped — they address the other object via the dotted
    colmap."""
    def strip(pnode):
        segs = pnode[1]
        if len(segs) > 1 and segs[0][0] == context and not segs[0][1]:
            segs = segs[1:]
        return ("path", [(nm, [_strip_context_prefix(i, context)
                               for i in (idxs or [])])
                         for nm, idxs in segs])
    return _rewrite_paths(node, strip)

_SCALAR_TYPES = (str, int, float, bool, bytes, type(None))


def _is_scalar(x) -> bool:
    import datetime as _dt
    return isinstance(x, _SCALAR_TYPES) or x is None or \
        isinstance(x, (_dt.datetime, _dt.timedelta, _dt.date))


def _arr(x):
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


def _broadcast(x, n: int) -> pa.Array:
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return _arr(x)
    if n == 0 and x is not None:
        # empty batches must keep the scalar's type (pa.array([]) is null)
        return pa.array([x]).slice(0, 0)
    return pa.array([x] * n)


def _choose_rows(mask: pa.Array, a, b):
    """Row-wise select between two equally-typed arrays; falls back to a
    concat+take permutation for types if_else can't handle (maps/lists)."""
    a, b = _arr(a), _arr(b)
    try:
        return pc.if_else(mask, a, b)
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
        n = len(a)
        m = pc.fill_null(mask, False).to_numpy(zero_copy_only=False)
        idx = np.where(m, np.arange(n), np.arange(n) + n)
        return pa.concat_arrays([a.cast(b.type) if a.type != b.type else a,
                                 b]).take(pa.array(idx))


class _Ctx:
    def __init__(self, batch: pa.Table, colmap: dict[str, str]):
        self.batch = batch
        self.n = batch.num_rows
        self.colmap = colmap
        self.cache: dict[str, pa.Array] = {}


# ---------------------------------------------------------------------------
# expression evaluation
# ---------------------------------------------------------------------------

def _map_len(col):
    a = _arr(col)
    off = np.asarray(a.offsets).astype(np.int64)  # lengths are slice-safe
    valid = ~np.asarray(pc.is_null(a))
    ln = off[1:] - off[:-1]
    return pc.if_else(pa.array(valid), pa.array(ln, pa.int64()),
                      pa.nulls(len(valid), pa.int64()))


def _adapter_len(ctx, args, kwargs):
    x = args[0]
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        a = _arr(x)
        if pa.types.is_map(a.type):
            return _map_len(a)
        if pa.types.is_list(a.type) or pa.types.is_fixed_size_list(a.type):
            return pc.cast(pc.list_value_length(a), pa.int64())
        if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
            # flat model: container-shaped strings are nested values
            return J.smart_len(a)
        return F.str_len(a)
    if isinstance(x, (list, dict, str)):
        return len(x)
    raise ValueError(f"Len: unsupported operand {type(x)}")


def _adapter_has_attr_on_datapoint(ctx, args, kwargs):
    """filterottl HasAttrOnDatapoint(key, value) (pkg/filter/filterottl/
    functions.go): true when a datapoint of the metric carries
    attributes[key] == value. Flat model: evaluated per datapoint row —
    the reference's per-METRIC any() is recovered by running the filter
    after metric_name co-location (DIVERGENCES #32d)."""
    key, val = str(args[0]), args[1]
    attrs = _column(ctx, ctx.colmap.get("attributes", "attributes"))
    if not pa.types.is_map(_arr(attrs).type):
        return pa.array([False] * ctx.n)
    got = M.map_get(_arr(attrs), key)
    return pc.fill_null(
        pc.equal(pc.cast(got, pa.string()), str(val)), False)


def _adapter_has_attr_key_on_datapoint(ctx, args, kwargs):
    """filterottl HasAttrKeyOnDatapoint(key): per-datapoint-row key
    presence (same flat-model note as HasAttrOnDatapoint)."""
    attrs = _column(ctx, ctx.colmap.get("attributes", "attributes"))
    if not pa.types.is_map(_arr(attrs).type):
        return pa.array([False] * ctx.n)
    return pa.array(M.map_has(_arr(attrs), str(args[0])))


def _adapter_ismap(ctx, args, kwargs):
    x = args[0]
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        a = _arr(x)
        if pa.types.is_map(a.type) or pa.types.is_struct(a.type):
            return pc.is_valid(a)
        if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
            return J.is_json_map(a)
        return False
    return isinstance(x, dict)


def _adapter_islist(ctx, args, kwargs):
    x = args[0]
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        a = _arr(x)
        if pa.types.is_list(a.type) or pa.types.is_large_list(a.type) \
                or pa.types.is_fixed_size_list(a.type):
            return pc.is_valid(a)
        if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
            return J.is_json_list(a)
        return False
    return isinstance(x, (list, tuple))


def _adapter_concat(ctx, args, kwargs):
    values, delim = args
    parts = [_broadcast(v, ctx.n) for v in values]
    return F.concat(delim, *parts)


def _adapter_format(ctx, args, kwargs):
    fmt, values = args
    parts = [_broadcast(v, ctx.n) for v in values]
    return F.format_str(fmt, parts)


def _sort_values(vals: list, order: str) -> list:
    """func_sort.go element ordering: homogeneous bool/number/string sort
    natively; mixed types compare string representations but keep the
    typed values."""
    rev = order == "desc"
    if all(isinstance(v, bool) for v in vals) \
            or all(isinstance(v, (int, float)) and not isinstance(v, bool)
                   for v in vals) \
            or all(isinstance(v, str) for v in vals):
        return sorted(vals, reverse=rev)
    return sorted(vals, key=J.encode_val, reverse=rev)


def _adapter_sort(ctx, args, kwargs):
    target = args[0]
    order = args[1] if len(args) > 1 else kwargs.get("order", "asc")
    if isinstance(target, list):  # literal list -> python sort, OTTL rules
        if not any(isinstance(v, (pa.Array, pa.ChunkedArray))
                   for v in target):
            return _sort_values(target, order)
        # converter elements evaluated to per-row arrays: sort per row,
        # return flat-model JSON list strings
        import json as _json
        cols = [(_arr(v).to_pylist()
                 if isinstance(v, (pa.Array, pa.ChunkedArray))
                 else [v] * ctx.n) for v in target]
        return pa.array(
            [_json.dumps(_sort_values(list(r), order),
                         separators=(",", ":"))
             for r in zip(*cols)], pa.string())
    return F.list_sort(_arr(target), order)


def _adapter_uuid(ctx, args, kwargs):
    return F.uuid_v4(ctx.n)


def _adapter_time(ctx, args, kwargs):
    target, layout = args[0], args[1]
    if isinstance(target, str):
        import datetime as _dt
        return _dt.datetime.strptime(target, layout)
    return F.time_parse(_arr(target), layout)


def _adapter_truncate_time(ctx, args, kwargs):
    target, dur = args
    # Duration seconds -> arrow unit name for the common cases
    unit = {1.0: "second", 60.0: "minute", 3600.0: "hour",
            86400.0: "day"}.get(float(dur))
    if unit is None:
        raise ValueError(f"TruncateTime: unsupported duration {dur}")
    return F.truncate_time(_arr(target), unit)


def _list_to_map(la: pa.ListArray, keys, items) -> pa.MapArray:
    """Assemble map<string,string> from a list array's offsets; null list
    rows become null maps (null offset slots)."""
    off = la.offsets.to_numpy().astype("int32", copy=False)
    mask = np.append(~la.is_valid().to_numpy(zero_copy_only=False), False)
    return pa.MapArray.from_arrays(pa.array(off, pa.int32(), mask=mask),
                                   keys, items)


def _kv_to_map(a, delim: str, pair: str) -> pa.MapArray:
    """ParseKeyValue with full parseutils parity (func_parse_key_value.go
    -> internal/coreinternal/parseutils/parser.go SplitString +
    ParseKeyValuePairs), replayed verbatim from
    func_parse_key_value_test.go in test_statement_executor.py.

    Hybrid plan like the stanza keyvalue parser (stages/parse.py): rows
    whose only quote syntax is BALANCED DOUBLE QUOTES (the dominant log
    shape, e.g. msg="...") run a fully vectorized polars pipeline —
    quote-aware tokenization via `(?:"[^"]*"|[^<pair>"])+` (exactly
    SplitString for such rows: pair delimiters inside quotes protected,
    quotes stripped anywhere, empty tokens skipped) -> splitn ->
    first-occurrence/last-value dedup. Rows with a backslash, a single
    quote OUTSIDE double-quoted regions, or any multi-character
    delimiter take the exact scan (_parseutils_pairs strict). Rows with
    an odd number of quotes (no backslash) are unterminated-quote
    errors outright. Reference error semantics -> null map row: empty
    target, unterminated quote, any pair that cannot split on the
    delimiter. Repeated keys: first-occurrence position, last value
    (Go map assignment)."""
    import re as _re

    import polars as pl

    from ..stages.parse import _parseutils_pairs

    a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    n = len(a)
    null_rows = ~pc.is_valid(a).to_numpy(zero_copy_only=False)
    texts = None
    if len(delim) != 1 or len(pair) != 1:
        special = np.ones(n, bool)  # multi-char delims: exact scan for all
        texts = a.to_pylist()
    else:
        filled = pc.fill_null(a, "")
        has_bs = pc.match_substring(filled, "\\").to_numpy(
            zero_copy_only=False)
        has_sq = pc.match_substring(filled, "'").to_numpy(
            zero_copy_only=False)
        dq_odd = (pc.count_substring(filled, '"').to_numpy(
            zero_copy_only=False) % 2).astype(bool)
        # a single quote OUTSIDE double-quoted regions opens a
        # '-quoted region the token regex can't see
        stripped_dq = pc.replace_substring_regex(filled, '"[^"]*"', "")
        sq_outside = pc.match_substring(stripped_dq, "'").to_numpy(
            zero_copy_only=False)
        # odd " count means an unterminated quote ONLY when no ' or \\
        # could be protecting a literal " (k='it"s ok' is valid); with
        # either present the exact scan decides
        null_rows |= (~has_bs) & (~has_sq) & dq_odd
        special = has_bs | sq_outside | (dq_odd & has_sq)

    triplets_i: list[np.ndarray] = []
    triplets_k: list = []
    triplets_v: list = []

    fast = ~(special | null_rows)
    if fast.any():
        P = _re.escape(pair)
        tok_re = f'(?:"[^"]*"|[^{P}"])+'
        s = pl.from_arrow(a)
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        e = (pl.DataFrame({"_i": pl.int_range(n, eager=True), "_s": s})
             .filter(pl.Series(fast))
             .with_columns(_t=pl.col("_s").str.extract_all(tok_re))
             .explode("_t")
             .with_columns(pl.col("_t").str.replace_all('"', "",
                                                        literal=True))
             .filter(pl.col("_t").is_not_null() & (pl.col("_t") != ""))
             .with_columns(_kv=pl.col("_t").str.splitn(delim, 2))
             .unnest("_kv"))
        bad = e.filter(pl.col("field_1").is_null())["_i"].to_numpy()
        null_rows[bad] = True
        g = (e.filter(pl.col("field_1").is_not_null())
             .group_by("_i", pl.col("field_0").str.strip_chars(),
                       maintain_order=True)
             .agg(_v=pl.col("field_1").str.strip_chars().last()))
        if g.height and not special.any():
            # all-fast batch (the hot shape): assemble straight from the
            # polars/arrow string buffers — round-tripping 5 entries/row
            # through numpy OBJECT arrays was ~40% of the kernel's time
            g = g.sort("_i", maintain_order=True)  # stable: keeps order
            rows = g["_i"].to_numpy().astype(np.int64, copy=False)
            keys_a = g["field_0"].to_arrow()
            vals_a = g["_v"].to_arrow()
            if isinstance(keys_a, pa.ChunkedArray):
                keys_a = keys_a.combine_chunks()
            if isinstance(vals_a, pa.ChunkedArray):
                vals_a = vals_a.combine_chunks()
            null_rows |= pc.equal(pc.fill_null(a, "x"), "").to_numpy(
                zero_copy_only=False)
            keep = ~null_rows[rows]
            if not keep.all():
                keys_a = keys_a.filter(pa.array(keep))
                vals_a = vals_a.filter(pa.array(keep))
                rows = rows[keep]
            counts = np.bincount(rows, minlength=n)
            offsets = np.concatenate(
                [[0], np.cumsum(counts)]).astype(np.int32)
            mask = np.append(null_rows, False)
            return pa.MapArray.from_arrays(
                pa.array(offsets, pa.int32(), mask=mask),
                pc.cast(keys_a, pa.string()),
                pc.cast(vals_a, pa.string()))
        if g.height:
            triplets_i.append(g["_i"].to_numpy())
            triplets_k.append(g["field_0"].to_numpy())
            triplets_v.append(g["_v"].to_numpy())

    if special.any():
        sp_idx = np.flatnonzero(special)
        if texts is None:
            # materialize ONLY the scan rows — one quoted row in a 100k
            # batch must not convert the whole column to Python objects
            texts = a.take(pa.array(sp_idx)).to_pylist()
            pairs_iter = zip(sp_idx, texts)
        else:
            pairs_iter = ((i, texts[i]) for i in sp_idx)
        for ridx, t in pairs_iter:
            if t is None:
                continue
            try:
                m = _parseutils_pairs(t, delim, pair, strict=True)
            except ValueError:
                null_rows[ridx] = True
                continue
            if m:
                triplets_i.append(np.full(len(m), ridx, np.int64))
                triplets_k.append(np.asarray(list(m.keys()), object))
                triplets_v.append(np.asarray(list(m.values()), object))

    # ParseKeyValue errors on an empty target string
    null_rows |= pc.equal(pc.fill_null(a, "x"), "").to_numpy(
        zero_copy_only=False)

    if triplets_i:
        rows = np.concatenate([x.astype(np.int64) for x in triplets_i])
        keys = np.concatenate([np.asarray(x, object) for x in triplets_k])
        vals = np.concatenate([np.asarray(x, object) for x in triplets_v])
        order = np.argsort(rows, kind="stable")  # within-row order kept
        rows, keys, vals = rows[order], keys[order], vals[order]
        keep = ~null_rows[rows]  # a row nulled late (e.g. bad pair) may
        rows, keys, vals = rows[keep], keys[keep], vals[keep]  # have entries
        counts = np.bincount(rows, minlength=n)
    else:
        keys = vals = np.zeros(0, object)
        counts = np.zeros(n, np.int64)

    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    mask = np.append(null_rows, False)
    return pa.MapArray.from_arrays(
        pa.array(offsets, pa.int32(), mask=mask),
        pa.array(list(keys), pa.string()),
        pa.array(list(vals), pa.string()))


def _adapter_parse_keyvalue(ctx, args, kwargs):
    target = args[0]
    delim = args[1] if len(args) > 1 else kwargs.get("delimiter", "=")
    pair = args[2] if len(args) > 2 else kwargs.get("pair_delimiter", " ")
    a = _arr(pc.cast(_broadcast(target, ctx.n), pa.string()))
    return _kv_to_map(a, delim, pair)


def _adapter_parse_csv(ctx, args, kwargs):
    """func_parse_csv.go: positional zip of static header names with the
    split fields. A row whose field count differs from the header count is
    an ERROR in the reference (parseutils.MapCSVHeaders: 'wrong number of
    fields') — here it yields a null map, which the statement executor's
    error_mode handling treats as that row's failure (same strict-equality
    rule as the stanza csv_parser, parse.py). Split + map assembly are
    vectorized (pc.split_pattern + offset arithmetic)."""
    target = args[0]
    headers = args[1] if len(args) > 1 else kwargs.get("header")
    delim = args[2] if len(args) > 2 else kwargs.get("delimiter", ",")
    hdelim = args[3] if len(args) > 3 else kwargs.get("headerDelimiter",
                                                      delim)
    names = headers.split(hdelim)

    a = _arr(pc.cast(_broadcast(target, ctx.n), pa.string()))
    la = pc.split_pattern(a, delim)
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    off = la.offsets.to_numpy().astype("int64", copy=False)
    ok = np.diff(off) == len(names)  # strict: mismatch -> null map
    counts = np.where(ok, len(names), 0)
    new_off = np.zeros(len(counts) + 1, dtype="int64")
    np.cumsum(counts, out=new_off[1:])
    within = (np.arange(int(new_off[-1]), dtype="int64")
              - np.repeat(new_off[:-1], counts))
    keys = pa.array(np.asarray(names, dtype=object)[within], pa.string())
    items = la.values.take(pa.array(np.repeat(off[:-1], counts) + within))
    mask = np.append(
        ~(la.is_valid().to_numpy(zero_copy_only=False) & ok), False)
    offs = pa.array(new_off.astype("int32"), pa.int32(), mask=mask)
    return pa.MapArray.from_arrays(offs, keys, items)


def _json_to_map_fast(a: pa.Array):
    """Vectorized ParseJSON for the common uniform-log shape: every row a
    flat JSON object with string/int/bool values and no JSON nulls. One
    polars json_decode + arrow take — no per-row Python. Returns None when
    the corpus doesn't fit (floats, nested values, mixed shapes, explicit
    nulls), and the caller falls back to the exact scan path; the gate is
    strict because the scan path's stringification (Python str(float),
    "None" for JSON null) is pinned by the e2e replay and can't be
    reproduced column-wise. Entry order follows the inferred schema — for
    rows whose keys appear in differing orders this reorders vs the scan
    path (pcommon maps are unordered in the reference, so only byte-level
    re-encodes can observe it)."""
    import polars as pl

    s = pl.from_arrow(a)
    try:
        d = s.str.json_decode(infer_schema_length=None)
    except Exception:
        return None
    if not isinstance(d.dtype, pl.Struct) or not d.dtype.fields:
        return None
    allowed = (pl.String, pl.Int64, pl.Boolean)
    if any(f.dtype not in allowed for f in d.dtype.fields):
        return None
    valid = d.is_not_null().to_numpy()
    df = d.struct.unnest()
    fields = df.columns
    # a null field inside a valid row is either an absent key or an
    # explicit JSON null — both diverge from the scan path
    n_invalid = int((~valid).sum())
    if any(df[c].null_count() != n_invalid for c in fields):
        return None
    n, k = len(a), len(fields)
    items_cols = [df[c].cast(pl.String).to_arrow().cast(pa.string())
                  for c in fields]
    cat = pa.concat_arrays([c.combine_chunks()
                            if isinstance(c, pa.ChunkedArray) else c
                            for c in items_cols])
    rows = np.nonzero(valid)[0]
    take = (np.arange(k)[None, :] * n + rows[:, None]).ravel()
    items = cat.take(pa.array(take.astype(np.int64)))
    keys = pa.array(np.tile(np.asarray(fields, dtype=object), len(rows)),
                    pa.string())
    counts = np.where(valid, k, 0)
    offs = np.zeros(n + 1, dtype="int32")
    np.cumsum(counts, out=offs[1:])
    mask = np.append(~valid, False)
    return pa.MapArray.from_arrays(pa.array(offs, pa.int32(), mask=mask),
                                   keys, items)


def _adapter_parse_json(ctx, args, kwargs):
    """Top-level object -> map<string,string> (flat model: scalar values
    stringified, Go-style for bools; nested values JSON-encoded —
    DIVERGENCES.md). Uniform scalar-object corpora take the vectorized
    polars path; anything else the exact per-row scan."""
    import json as _json

    def enc(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (dict, list)):
            return _json.dumps(v, separators=(",", ":"))
        return str(v)

    a = _broadcast(args[0], ctx.n)
    # StandardStringGetter strictness (pkg/ottl/expression.go:245-256):
    # ParseJSON(1) / ParseJSON(true) is a TYPE error the statement group's
    # error_mode isolates, not an implicit int->"1" coercion
    if not (pa.types.is_string(a.type) or pa.types.is_large_string(a.type)
            or pa.types.is_null(a.type)):
        raise ValueError(f"expected string but got {a.type}")
    astr = _arr(pc.cast(a, pa.string()))
    fast = _json_to_map_fast(astr)
    if fast is not None:
        return fast
    raw = [None if v is None else _json.loads(v) for v in astr.to_pylist()]
    # pcommon distinguishes top-level object (pmap) from array (pslice);
    # the flat model keeps arrays as compact-JSON strings. The choice is
    # per-row (never batch-composition-dependent): an object/array mix in
    # ONE batch has no single Arrow column type, so it raises and the
    # statement group's error_mode handles it.
    has_list = any(isinstance(d, list) for d in raw)
    has_dict = any(isinstance(d, dict) for d in raw)
    if has_list and has_dict:
        raise ValueError(
            "ParseJSON: batch mixes top-level objects and arrays — not "
            "representable as one flat-model column")
    if has_list:
        return pa.array(
            [None if d is None else _json.dumps(d, separators=(",", ":"))
             for d in raw], pa.string())
    py = [None if d is None else [(k, enc(x)) for k, x in d.items()]
          for d in raw]
    return pa.array(py, pa.map_(pa.string(), pa.string()))


def _adapter_tokv(ctx, args, kwargs):
    target = args[0]
    delim = args[1] if len(args) > 1 else "="
    pair = args[2] if len(args) > 2 else " "
    sort_keys = bool(args[3]) if len(args) > 3 \
        else bool(kwargs.get("sortKeys", False))
    return M.to_key_value_string(_arr(target), delim, pair, sort_keys)


def _adapter_grok(ctx, args, kwargs):
    """ExtractGrokPatterns(Target, Pattern, NamedCapturesOnly,
    PatternDefinitions) — func_extract_grok_patterns.go:17-23."""
    from ..functions.grok import GrokCompiler, parse_pattern_definitions
    target, pattern = args[0], args[1]
    nco = args[2] if len(args) > 2 else kwargs.get("named_captures_only",
                                                   kwargs.get("namedCapturesOnly", False))
    defs = args[3] if len(args) > 3 else kwargs.get("pattern_definitions",
                                                    kwargs.get("patternDefinitions"))
    extra = parse_pattern_definitions([str(d) for d in defs]) if defs \
        else None
    regex, _types, names = GrokCompiler(extra).compile(
        pattern, named_captures_only=bool(nco))
    return F.extract_patterns(_broadcast(target, ctx.n), regex, names=names)


def _adapter_slice_to_map(ctx, args, kwargs):
    """func_slice_to_map.go: key each slice element by keyPath; valuePath
    optionally projects the stored value. Flat-model inputs are
    JSON-encoded list strings -> JSON-encoded object strings."""
    target = args[0]
    keys = [str(k) for k in (args[1] if len(args) > 1
                             else kwargs.get("keyPath", []))]
    vpath = args[2] if len(args) > 2 else kwargs.get("valuePath")
    vpath = [str(k) for k in vpath] if vpath else None
    if isinstance(target, (pa.Array, pa.ChunkedArray)):
        a = _arr(target)
        if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
            import json as _json

            def walk(el, path):
                cur = el
                for p in path:
                    if not isinstance(cur, dict):
                        return None
                    cur = cur.get(p)
                return cur

            out = []
            for v in a.to_pylist():
                doc = J._try_decode(v)
                if not isinstance(doc, list):
                    out.append(None)
                    continue
                obj = {}
                for el in doc:
                    k = walk(el, keys) if isinstance(el, dict) else None
                    if k is None:
                        continue
                    obj[str(k)] = walk(el, vpath) if vpath else el
                out.append(_json.dumps(obj, separators=(",", ":")))
            return pa.array(out, pa.string())
    return M.slice_to_map(_arr(target), list(keys))


# functions whose evaluated args pass through raw (scalar in -> scalar out)
_SCALAR_PASSTHROUGH = {"Duration", "Hours", "Minutes", "Seconds",
                       "Milliseconds", "Microseconds", "Nanoseconds",
                       "Now", "Unix", "TraceID", "SpanID"}

_ADAPTERS = {
    "Len": _adapter_len, "Concat": _adapter_concat, "Format": _adapter_format,
    "Sort": _adapter_sort, "UUID": _adapter_uuid, "Time": _adapter_time,
    "TruncateTime": _adapter_truncate_time,
    "ParseKeyValue": _adapter_parse_keyvalue, "ParseCSV": _adapter_parse_csv,
    "ParseJSON": _adapter_parse_json, "ToKeyValueString": _adapter_tokv,
    "ExtractGrokPatterns": _adapter_grok, "SliceToMap": _adapter_slice_to_map,
    "IsMap": _adapter_ismap, "IsList": _adapter_islist,
    "HasAttrOnDatapoint": _adapter_has_attr_on_datapoint,
    "HasAttrKeyOnDatapoint": _adapter_has_attr_key_on_datapoint,
}


def eval_expr(node, ctx: _Ctx):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "list":
        return [eval_expr(e, ctx) for e in node[1]]
    if kind == "map":
        return {k: eval_expr(e, ctx) for k, e in node[1]}
    if kind == "path":
        return _eval_path(node[1], ctx)
    if kind == "index":
        base = eval_expr(node[1], ctx)
        idx = eval_expr(node[2], ctx)
        if isinstance(base, (pa.Array, pa.ChunkedArray)):
            a = _arr(base)
            if isinstance(idx, str):
                # string key on a converter result (grammar.go converter
                # Keys): map / struct columns index directly, anything
                # stringy is treated as a JSON document
                if pa.types.is_map(a.type):
                    return M.map_get(a, idx)
                if pa.types.is_struct(a.type):
                    return pc.struct_field(a, idx) \
                        if idx in a.type.names else pa.nulls(len(a),
                                                             pa.string())
                return J.json_get(a, [idx])
            return pc.list_element(a, int(idx))
        if isinstance(base, (list, dict)):
            try:
                return base[idx if isinstance(idx, str) else int(idx)]
            except (KeyError, IndexError):
                return None
        return base[int(idx)]
    if kind == "call":
        return _eval_call(node, ctx)
    if kind == "binop":
        return _eval_binop(node, ctx)
    if kind == "bool":
        vals = [eval_expr(e, ctx) for e in node[2]]
        op = pc.and_kleene if node[1] == "and" else pc.or_kleene
        acc = vals[0]
        for v in vals[1:]:
            if isinstance(acc, bool) and isinstance(v, bool):
                acc = (acc and v) if node[1] == "and" else (acc or v)
            else:
                acc = op(_to_mask(acc, ctx.n), _to_mask(v, ctx.n))
        return acc
    if kind == "not":
        v = eval_expr(node[1], ctx)
        return (not v) if isinstance(v, bool) else pc.invert(
            _to_mask(v, ctx.n))
    if kind == "fname":
        # a bare Uppercase name evaluated as a VALUE: Go resolves it as an
        # enum symbol here and errors (converter refs are only legal where
        # a FunctionGetter parameter consumes them)
        raise ValueError(f"enum symbol not found: {node[1]}")
    raise ValueError(f"unknown AST node {kind}")


def _to_mask(v, n: int) -> pa.Array:
    if isinstance(v, bool):
        return pa.array([v] * n, pa.bool_())
    return pc.fill_null(_arr(v), False)


def _eval_path(segs, ctx: _Ctx):
    name, idxs = segs[0]
    # context roots
    if name == "cache":
        key = str(eval_expr(idxs[0], ctx)) if idxs else None
        if key is None:
            raise ValueError("cache must be indexed")
        cur = ctx.cache.get(key, pa.nulls(ctx.n, pa.string()))
        # nested reads (cache["a"]["b"]): a MapArray value indexes via
        # map_get, a flat-model JSON string via json_get — ignoring the
        # extra indices silently returned the whole container
        for node in idxs[1:]:
            k = eval_expr(node, ctx)
            a = _broadcast(cur, ctx.n)
            if pa.types.is_map(a.type):
                cur = M.map_get_dyn(a, _broadcast(k, ctx.n)) \
                    if isinstance(k, (pa.Array, pa.ChunkedArray)) \
                    else M.map_get(a, str(k))
            else:
                cur = J.json_get_dyn(a, [k]) \
                    if isinstance(k, (pa.Array, pa.ChunkedArray)) \
                    else J.json_get(pc.cast(a, pa.string()), [k])
        return cur
    if name == "resource" and len(segs) > 1 and segs[1][0] == "attributes":
        colname = ctx.colmap.get("resource.attributes", "resource")
        idxs = segs[1][1]
        segs = [(colname, idxs)] + list(segs[2:])
        name, idxs = segs[0]
        cur = _column(ctx, name)
    elif len(segs) > 1 and \
            f"{name}.{segs[1][0]}" in ctx.colmap and not segs[0][1]:
        # dotted colmap entry (e.g. instrumentation_scope.name)
        colname = ctx.colmap[f"{name}.{segs[1][0]}"]
        segs = [(colname, segs[1][1])] + list(segs[2:])
        name, idxs = segs[0]
        cur = _column(ctx, name)
    else:
        colname = ctx.colmap.get(name, name)
        cur = _column(ctx, colname)
    for depth, (seg_name, seg_idxs) in enumerate(segs):
        if depth > 0:
            # nested segment: struct field access
            cur = pc.struct_field(_arr(cur), seg_name)
            seg_idxs = seg_idxs or []
        for ie in (seg_idxs or []):
            key = eval_expr(ie, ctx)
            cur = _index_into(cur, key, ctx)
    return cur


_TEMPORALITY_STRINGS = pa.array([None, "delta", "cumulative"], pa.string())
_METRIC_TYPE_NAMES = ["Gauge", "Sum", "Histogram", "ExponentialHistogram",
                      "Summary"]


def _column(ctx: _Ctx, name: str):
    if name == "__metric_type_code__":
        # virtual int view of metric_type (pmetric.MetricType codes via
        # METRIC_DATA_TYPE_* enum symbols; the path itself is read-only
        # in ottlmetric)
        s = pc.cast(_column(ctx, "metric_type"), pa.string())
        code = pc.index_in(s, value_set=pa.array(_METRIC_TYPE_NAMES))
        return pc.cast(pc.fill_null(pc.add(code, 1), 0), pa.int64())
    if name == "__temporality_code__":
        # virtual int view of metric_temporality (pmetric enum codes:
        # 0 unspecified / 1 delta / 2 cumulative), read by the
        # metric.aggregation_temporality path
        s = pc.cast(_column(ctx, "metric_temporality"), pa.string())
        code = pc.if_else(pc.equal(s, "delta"),
                          pa.scalar(1, pa.int64()),
                          pc.if_else(pc.equal(s, "cumulative"),
                                     pa.scalar(2, pa.int64()),
                                     pa.scalar(0, pa.int64())))
        return pc.fill_null(code, 0)
    if name not in ctx.batch.column_names:
        return pa.nulls(ctx.n, pa.string())
    return _arr(ctx.batch[name])


def _index_into(cur, key, ctx: _Ctx):
    a = _arr(cur)
    dynamic = isinstance(key, (pa.Array, pa.ChunkedArray))
    if pa.types.is_map(a.type):
        if dynamic:  # attributes[attributes["flags"]] — per-row key
            return M.map_get_dyn(a, pc.cast(_arr(key), pa.string()))
        if not isinstance(key, str):
            # ctxutil GetMapValue: map keys must be strings
            raise ValueError("unable to resolve a string index in map: "
                             "invalid key type")
        return M.map_get(a, key)
    if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
        # flat model: nested values are JSON-encoded strings
        if dynamic:
            return J.json_get_dyn(a, [_arr(key)])
        return J.json_get(a, [key])
    if dynamic:
        raise ValueError(f"dynamic index into {a.type} unsupported")
    if pa.types.is_list(a.type) or pa.types.is_fixed_size_list(a.type):
        return pc.list_element(a, int(key))
    if pa.types.is_struct(a.type):
        return pc.struct_field(a, str(key))
    raise ValueError(f"cannot index into {a.type}")


def _eval_call(node, ctx: _Ctx):
    _, name, arg_nodes, kw_nodes = node
    if name not in F.REGISTRY and name not in _ADAPTERS:
        raise ValueError(f"unknown OTTL function {name!r}")
    args = [eval_expr(a, ctx) for a in arg_nodes]
    kwargs = {k: eval_expr(v, ctx) for k, v in kw_nodes.items()}
    if name in _ADAPTERS:
        return _ADAPTERS[name](ctx, args, kwargs)
    fn = F.REGISTRY[name]
    if name in _SCALAR_PASSTHROUGH:
        return fn(*args, **kwargs)
    if not args:
        return fn()
    head = args[0]
    if _is_scalar(head) or isinstance(head, list):
        head = _broadcast(head, ctx.n)
    return fn(head, *args[1:], **kwargs)


def _coerce_numeric(a: pa.Array) -> pa.Array:
    if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
        try:
            return pc.cast(a, pa.int64())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return pc.cast(a, pa.float64())
    return a


def _cmp_scalars(op: str, lv, rv):
    import datetime as _dt
    if isinstance(lv, _dt.timedelta):
        lv = lv.total_seconds()
    if isinstance(rv, _dt.timedelta):
        rv = rv.total_seconds()
    try:
        return {"==": lambda: lv == rv, "!=": lambda: lv != rv,
                "<": lambda: lv < rv, "<=": lambda: lv <= rv,
                ">": lambda: lv > rv, ">=": lambda: lv >= rv}[op]()
    except TypeError:
        # OTTL comparison rules: cross-type compares are "not equal"
        return op == "!="


def _eval_binop(node, ctx: _Ctx):
    _, op, ln, rn = node
    lv, rv = eval_expr(ln, ctx), eval_expr(rn, ctx)
    both_scalar = _is_scalar(lv) and _is_scalar(rv)
    if op in ("+", "-", "*", "/"):
        if both_scalar:
            if op == "/" and isinstance(lv, int) and isinstance(rv, int) \
                    and not isinstance(lv, bool) and not isinstance(rv, bool):
                # OTTL int/int truncates (math.go) — match the array path
                # (pc.divide on int64) instead of Python float division
                return int(lv / rv)
            return {"+": lambda: lv + rv, "-": lambda: lv - rv,
                    "*": lambda: lv * rv, "/": lambda: lv / rv}[op]()
        a, b = _broadcast(lv, ctx.n), _broadcast(rv, ctx.n)
        k = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
             "/": pc.divide}[op]
        try:
            return k(a, b)
        except (pa.ArrowNotImplementedError, pa.ArrowTypeError,
                pa.ArrowInvalid):
            # flat model stores typed map values as strings; numeric
            # strings participate in arithmetic (attributes["n"] + 1)
            return k(_coerce_numeric(a), _coerce_numeric(b))
    # comparisons
    if both_scalar:
        return _cmp_scalars(op, lv, rv)
    # nil comparisons: equality tests validity; ORDERING vs nil is
    # false for every row (LANGUAGE.md: nil participates in == and !=
    # only) — returning the validity mask made "x < nil" match all
    # non-null rows
    if rv is None or lv is None:
        arr = _broadcast(lv if rv is None else rv, ctx.n)
        valid = pc.is_valid(arr)
        if op == "==":
            return pc.invert(valid)
        if op == "!=":
            return valid
        return pa.array(np.zeros(ctx.n, bool))
    a, b = _broadcast(lv, ctx.n), _broadcast(rv, ctx.n)
    try:
        k = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
             "<=": pc.less_equal, ">": pc.greater,
             ">=": pc.greater_equal}[op]
        out = k(a, b)
        if op in ("==", "!="):
            # LANGUAGE.md: nil == nil is true (equality only); nil vs
            # non-nil is not-equal. Fill only the null comparison slots:
            # == gets both-null, != gets exactly-one-null (xor validity).
            lv_m, rv_m = pc.is_valid(a), pc.is_valid(b)
            fill = (pc.xor(lv_m, rv_m) if op == "!="
                    else pc.invert(pc.or_(lv_m, rv_m)))
            out = pc.if_else(pc.and_(lv_m, rv_m), out, fill)
        return out
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid, pa.ArrowTypeError):
        # cross-type: == -> false, != -> true (LANGUAGE.md comparison rules)
        if op == "==":
            return pa.array([False] * ctx.n, pa.bool_())
        if op == "!=":
            return pa.array([True] * ctx.n, pa.bool_())
        raise


# ---------------------------------------------------------------------------
# editors
# ---------------------------------------------------------------------------

def _set_column(batch: pa.Table, name: str, arr) -> pa.Table:
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)


def _resolve_target(segs, ctx: _Ctx, allow_dyn: bool = False):
    """-> ("column", colname) | ("mapkey", colname, key) |
    ("mapkey_dyn", colname, key_array) | ("map", colname) | ("cache", key) |
    ("json_path", colname, key_or_array, rest_segs).
    json_path = more than one index (``attributes["foo"]["bar"]``): the
    edit happens inside the flat-model JSON-encoded map value.
    Dynamic per-row keys raise unless the editor opts in."""
    name, idxs = segs[0]
    if name == "cache":
        key = str(eval_expr(idxs[0], ctx))
        return ("cache", key, [eval_expr(i, ctx) for i in idxs[1:]])
    if name == "resource" and len(segs) > 1 and segs[1][0] == "attributes":
        colname = ctx.colmap.get("resource.attributes", "resource")
        idxs = segs[1][1]
        extra = segs[2:]
    elif len(segs) > 1 and not idxs and \
            f"{name}.{segs[1][0]}" in ctx.colmap:
        # dotted colmap target (metric.name, instrumentation_scope.name)
        colname = ctx.colmap[f"{name}.{segs[1][0]}"]
        idxs = segs[1][1]
        extra = segs[2:]
    else:
        colname = ctx.colmap.get(name, name)
        extra = segs[1:]
    if extra:
        raise ValueError("nested editor targets unsupported in flat model")
    if not idxs:
        col = ctx.batch[colname] if colname in ctx.batch.column_names else None
        if col is not None and pa.types.is_map(_arr(col).type):
            return ("map", colname)
        return ("column", colname)
    key = eval_expr(idxs[0], ctx)
    rest = [eval_expr(e, ctx) for e in idxs[1:]]
    if isinstance(key, (pa.Array, pa.ChunkedArray)):
        if not allow_dyn:
            raise ValueError(
                "dynamic (per-row) map keys are only supported by `set`")
        key = pc.cast(_arr(key), pa.string())
        return ("json_path", colname, key, rest) if rest \
            else ("mapkey_dyn", colname, key)
    if rest:
        return ("json_path", colname, str(key), rest)
    return ("mapkey", colname, str(key))


def _apply_set(ctx: _Ctx, args, mask):
    target_node, value_node = args
    if value_node == ("lit", None):
        return ctx.batch  # set(x, nil) is a no-op (e2e corpus)
    value = eval_expr(value_node, ctx)
    tgt = _resolve_target(target_node[1], ctx, allow_dyn=True)
    if tgt[0] == "cache":
        rest = tgt[2]
        if not rest:
            ctx.cache[tgt[1]] = _broadcast(value, ctx.n)
            return ctx.batch
        # nested write (cache["a"]["b"]): edit INSIDE the cached value —
        # clobbering the whole entry silently lost the sibling keys
        cur = _broadcast(ctx.cache.get(tgt[1],
                                       pa.nulls(ctx.n, pa.string())),
                         ctx.n)
        if pa.types.is_map(cur.type) and len(rest) == 1 \
                and not isinstance(rest[0], (pa.Array, pa.ChunkedArray)):
            ctx.cache[tgt[1]] = M.map_set(cur, str(rest[0]),
                                          _broadcast(value, ctx.n))
            return ctx.batch
        if isinstance(value, (dict, list)):
            value = J.encode_rowwise(value, ctx.n)
        vals = _arr(pc.cast(_broadcast(value, ctx.n),
                            pa.string())).to_pylist()
        ctx.cache[tgt[1]] = J.json_set(pc.cast(cur, pa.string()), rest,
                                       vals)
        return ctx.batch
    if isinstance(value, (dict, list)) and tgt[0] == "map":
        # replace the whole map column with a map literal
        if not isinstance(value, dict):
            raise ValueError("cannot set a map column to a non-map value")
        if J._contains_array(value):
            raise ValueError("per-row values unsupported in whole-map set")
        rows = [[(k, J.encode_val(J._pyify(v))) for k, v in value.items()]]
        new = pa.array(rows * ctx.n, pa.map_(pa.string(), pa.string()))
        old = _arr(ctx.batch[tgt[1]]) if tgt[1] in ctx.batch.column_names \
            else pa.array([[]] * ctx.n, pa.map_(pa.string(), pa.string()))
        return _set_column(ctx.batch, tgt[1], _choose_rows(mask, new, old))
    if isinstance(value, (dict, list)):
        # map/list literal -> flat-model compact JSON (per-row when the
        # literal embeds path expressions)
        value = J.encode_rowwise(value, ctx.n)
    if tgt[0] == "json_path":
        return _apply_set_json(ctx, tgt, value, mask)
    varr = _broadcast(value, ctx.n)
    eff = pc.and_(mask, pc.is_valid(varr))  # nil values don't overwrite
    if tgt[0] in ("mapkey", "mapkey_dyn"):
        colname, key = tgt[1], tgt[2]
        if colname in ctx.batch.column_names:
            old = _arr(ctx.batch[colname])
        else:  # set creates the map (PutStr semantics), dyn or not
            old = pa.array([[]] * ctx.n, pa.map_(pa.string(), pa.string()))
        if not pa.types.is_map(old.type):
            raise ValueError(f"{colname} is not a map column")
        vstr = _coerce_map_value(varr)
        if tgt[0] == "mapkey_dyn":
            new = M.map_set_dyn(old, key, vstr)
            eff = pc.and_(eff, pc.is_valid(key))
        else:
            new = M.map_set(old, key, vstr)
        return _set_column(ctx.batch, colname, _choose_rows(eff, new, old))
    # plain column
    colname = tgt[1]
    if colname == "__temporality_code__":
        # write-through: int enum codes -> metric_temporality strings
        codes = pc.cast(varr, pa.int64())
        varr = pc.take(_TEMPORALITY_STRINGS,
                       pc.if_else(pc.and_(pc.greater_equal(codes, 0),
                                          pc.less_equal(codes, 2)),
                                  codes, pa.scalar(0, pa.int64())))
        colname = "metric_temporality"
    if colname in ctx.batch.column_names:
        old = _arr(ctx.batch[colname])
        if old.type != varr.type and not pa.types.is_null(old.type):
            try:
                varr = pc.cast(varr, old.type)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                old = pc.cast(old, varr.type)
    else:
        old = pa.nulls(ctx.n, varr.type)
    return _set_column(ctx.batch, colname, _choose_rows(eff, varr, old))


def _map_col_or_empty(ctx: _Ctx, colname: str) -> pa.Array:
    if colname in ctx.batch.column_names:
        old = _arr(ctx.batch[colname])
        if not pa.types.is_map(old.type):
            raise ValueError(f"{colname} is not a map column")
        return old
    return pa.array([[]] * ctx.n, pa.map_(pa.string(), pa.string()))


def _apply_set_json(ctx: _Ctx, tgt, value, mask):
    """set(attributes["foo"]["bar"...], v): patch inside the JSON-encoded
    map value (ctxutil SetMapValue semantics)."""
    _, colname, key0, rest = tgt
    old = _map_col_or_empty(ctx, colname)
    dyn = isinstance(key0, (pa.Array, pa.ChunkedArray))
    vals = M.map_get_dyn(old, key0) if dyn else M.map_get(old, key0)
    varr = _broadcast(value, ctx.n)
    new_vals = J.json_set(vals, rest, _arr(varr).to_pylist())
    new = M.map_set_dyn(old, key0, new_vals) if dyn \
        else M.map_set(old, key0, new_vals)
    eff = pc.and_(mask, pc.is_valid(new_vals))
    if dyn:
        eff = pc.and_(eff, pc.is_valid(key0))
    return _set_column(ctx.batch, colname, _choose_rows(eff, new, old))


def _coerce_map_value(varr: pa.Array) -> pa.Array:
    """Value array -> string items for a map<string,string> slot. Nested
    values (map/list/struct) are JSON-encoded — flat model, same
    divergence as ParseXML (DIVERGENCES.md)."""
    if pa.types.is_map(varr.type) or pa.types.is_list(varr.type) \
            or pa.types.is_struct(varr.type):
        import json as _json
        return pa.array(
            [None if v is None else _json.dumps(
                dict(v) if isinstance(v, list) and v and
                isinstance(v[0], tuple) else v,
                separators=(",", ":"), default=str)
             for v in varr.to_pylist()], pa.string())
    if not pa.types.is_string(varr.type):
        return pc.cast(varr, pa.string())
    return varr


def _map_editor(fn, dict_fn=None):
    """Wrap an (old_map, *args) -> new_map kernel as a masked editor.
    With dict_fn, a nested target (``attributes["test"]``) applies the
    dict-level op inside the JSON-encoded map value."""
    def apply(ctx: _Ctx, args, mask):
        tgt = _resolve_target(args[0][1], ctx)
        extra = [eval_expr(a, ctx) for a in args[1:]]
        if tgt[0] == "map":
            colname = tgt[1]
            old = _arr(ctx.batch[colname])
            new = fn(old, *extra)
            return _set_column(ctx.batch, colname,
                               _choose_rows(mask, new, old))
        if tgt[0] == "mapkey" and dict_fn is not None:
            colname, key0 = tgt[1], tgt[2]
            old = _map_col_or_empty(ctx, colname)
            cur = M.map_get(old, key0)
            new_vals = J.obj_apply(cur, lambda d: dict_fn(d, *extra))
            new = M.map_set(old, key0, new_vals)
            eff = pc.and_(mask, pc.is_valid(cur))
            return _set_column(ctx.batch, colname,
                               _choose_rows(eff, new, old))
        raise ValueError("editor target must be a map column")
    return apply


# dict-level map ops for nested (JSON-encoded) targets
def _d_keep_keys(d, keys):
    ks = set(keys)
    return {k: v for k, v in d.items() if k in ks}


def _d_delete_key(d, key):
    return {k: v for k, v in d.items() if k != key}


def _d_delete_matching(d, pattern):
    import re as _re
    r = _re.compile(pattern)
    return {k: v for k, v in d.items() if not r.search(k)}


def _d_keep_matching(d, pattern):
    import re as _re
    r = _re.compile(pattern)
    return {k: v for k, v in d.items() if r.search(k)}


def _apply_flatten(ctx: _Ctx, args, kwargs, mask):
    """func_flatten.go: flatten(target, prefix?, depth=, resolveConflicts=)
    on the map column, or on a nested JSON object value."""
    tgt = _resolve_target(args[0][1], ctx)
    prefix = eval_expr(args[1], ctx) if len(args) > 1 else (
        eval_expr(kwargs["prefix"], ctx) if "prefix" in kwargs else "")
    depth = None
    if len(args) > 2:
        depth = int(eval_expr(args[2], ctx))
    elif "depth" in kwargs:
        depth = int(eval_expr(kwargs["depth"], ctx))
    if depth is not None and depth < 1:
        raise ValueError(f"invalid depth '{depth}' for flatten function, "
                         "must be greater than 0")
    resolve = bool(eval_expr(kwargs["resolveConflicts"], ctx)) \
        if "resolveConflicts" in kwargs else False
    if tgt[0] == "map":
        colname = tgt[1]
        old = _arr(ctx.batch[colname])
        new = J.flatten_map_rows(old, prefix, depth, resolve)
        return _set_column(ctx.batch, colname, _choose_rows(mask, new, old))
    if tgt[0] == "mapkey":
        colname, key0 = tgt[1], tgt[2]
        old = _map_col_or_empty(ctx, colname)
        cur = M.map_get(old, key0)
        new_vals = J.obj_apply(
            cur, lambda d: J.flatten_native(d, prefix, depth, resolve))
        new = M.map_set(old, key0, new_vals)
        eff = pc.and_(mask, pc.is_valid(cur))
        return _set_column(ctx.batch, colname, _choose_rows(eff, new, old))
    raise ValueError("flatten target must be a map column or map value")


def _replace_pattern_hashed(col: pa.Array, pattern: str, template: str,
                            hash_fn) -> pa.Array:
    """func_replace_pattern.go applyOptReplaceFunction: for EACH submatch,
    expand the replacement template against that match, apply the
    converter (hash) to the EXPANDED string, then replace every occurrence
    of the full match text. Two different captured values must hash to two
    different digests — hashing the raw template once would give every
    match the same constant. The expansions are collected first and hashed
    in ONE registry call; only the regex scan is per-row (cold path: the
    vectorized kernel handles the no-converter case)."""
    pat = re.compile(pattern)
    tmpl = template.replace("$$", "\\")  # $$n -> \n group refs (OTTL $$)
    vals = col.to_pylist() if not isinstance(col, list) else col
    per_row: list[list[tuple[str, int]]] = []  # (full_match, expansion idx)
    expansions: list[str] = []
    for v in vals:
        row: list[tuple[str, int]] = []
        if v is not None:
            for m in pat.finditer(v):
                row.append((m.group(0), len(expansions)))
                expansions.append(m.expand(tmpl))
        per_row.append(row)
    hashed = hash_fn(pa.array(expansions, pa.string())).to_pylist() \
        if expansions else []
    out = []
    for v, row in zip(vals, per_row):
        if v is None:
            out.append(None)
            continue
        s = v
        for full, ei in row:
            s = s.replace(full, str(hashed[ei]))
        out.append(s)
    return pa.array(out, pa.string())


def _apply_replace_pattern(ctx: _Ctx, args, mask, glob: bool = False):
    target_node = args[0]
    pattern = eval_expr(args[1], ctx)
    repl = eval_expr(args[2], ctx)
    hash_fn = None
    if len(args) > 3 and not glob:
        # optional `function` arg hashes each expanded replacement
        # (func_replace_pattern.go: replacementFn applied per substitution)
        fnode = args[3]
        fname = fnode[1] if fnode[0] == "fname" else (
            fnode[1][0][0] if fnode[0] == "path" and len(fnode[1]) == 1
            and not fnode[1][0][1] else None)
        if fname not in F.REGISTRY:
            raise ValueError("replace_pattern: 4th arg must be a converter")
        hash_fn = F.REGISTRY[fname]
    tgt = _resolve_target(target_node[1], ctx)
    if hash_fn is not None:
        def fn(col, pattern_, repl_):
            return _replace_pattern_hashed(_arr(col), pattern_, repl_,
                                           hash_fn)
    else:
        fn = F.replace_match if glob else F.replace_pattern
    if tgt[0] == "mapkey":
        colname, key = tgt[1], tgt[2]
        old = _arr(ctx.batch[colname])
        vals = M.map_get(old, key)
        new_vals = fn(vals, pattern, repl)
        new = M.map_set(old, key, new_vals)
        # only rewrite rows that had the key
        eff = pc.and_(mask, pc.is_valid(vals))
        return _set_column(ctx.batch, colname, _choose_rows(eff, new, old))
    colname = tgt[1]
    old = _arr(ctx.batch[colname])
    new = fn(old, pattern, repl)
    return _set_column(ctx.batch, colname, _choose_rows(mask, new, old))


def _map_values_rewrite(old: pa.MapArray, fn):
    arr, offsets, keys, items, valid = M._map_parts(old)
    new_items = fn(items)
    return pa.MapArray.from_arrays(M._offsets_arr(np.asarray(offsets), valid),
                                   keys, new_items)


def _apply_replace_all_patterns(ctx: _Ctx, args, mask):
    tgt = _resolve_target(args[0][1], ctx)
    mode = eval_expr(args[1], ctx)
    if mode not in ("key", "value"):
        raise ValueError(
            f"replace_all_patterns: mode must be 'key' or 'value', "
            f"got {mode!r}")
    pattern = eval_expr(args[2], ctx)
    repl = eval_expr(args[3], ctx)
    colname = tgt[1]
    old = _arr(ctx.batch[colname])
    arr, offsets, keys, items, valid = M._map_parts(old)
    if mode == "key":
        new_keys = F.replace_pattern(keys, pattern, repl)
        new = pa.MapArray.from_arrays(
            M._offsets_arr(np.asarray(offsets), valid), new_keys, items)
        # a rename can collide two keys within one row; pcommon.Map key
        # uniqueness keeps ONE entry — the LAST write wins (Range +
        # PutStr iteration order). Scan only when a key actually changed.
        if not pc.any(pc.fill_null(pc.not_equal(new_keys, keys),
                                   False)).as_py():
            return _set_column(ctx.batch, colname,
                               _choose_rows(mask, new, old))
        karr = np.asarray(new_keys, dtype=object)
        row_of = np.searchsorted(np.asarray(offsets)[1:],
                                 np.arange(len(karr)), side="right")
        seen: dict[tuple, int] = {}
        for i, rk in enumerate(zip(row_of, karr)):
            seen[rk] = i  # last occurrence per (row, key)
        if len(seen) != len(karr):
            keep = np.zeros(len(karr), bool)
            keep[list(seen.values())] = True
            new = M._rebuild(np.asarray(offsets), new_keys, items, keep,
                             valid)
    else:
        new = _map_values_rewrite(old, lambda it: F.replace_pattern(
            it, pattern, repl))
    return _set_column(ctx.batch, colname, _choose_rows(mask, new, old))


def _apply_replace_all_matches(ctx: _Ctx, args, mask):
    tgt = _resolve_target(args[0][1], ctx)
    glob = eval_expr(args[1], ctx)
    repl = eval_expr(args[2], ctx)
    colname = tgt[1]
    old = _arr(ctx.batch[colname])
    new = _map_values_rewrite(old, lambda it: F.replace_match(it, glob, repl))
    return _set_column(ctx.batch, colname, _choose_rows(mask, new, old))


def _apply_truncate_all(ctx: _Ctx, args, mask):
    tgt = _resolve_target(args[0][1], ctx)
    limit = int(eval_expr(args[1], ctx))
    colname = tgt[1]
    old = _arr(ctx.batch[colname])

    def trunc(it):
        # reference truncates ValueTypeStr only — container-shaped values
        # are nested maps/slices in the flat model, leave them whole
        shaped = pc.fill_null(pc.or_(pc.starts_with(it, "{"),
                                     pc.starts_with(it, "[")), False)
        return pc.if_else(shaped, it, pc.utf8_slice_codeunits(it, 0, limit))

    new = _map_values_rewrite(old, trunc)
    return _set_column(ctx.batch, colname, _choose_rows(mask, new, old))


def _apply_append(ctx: _Ctx, args, kwargs, mask):
    tgt = _resolve_target(args[0][1], ctx)
    if "values" in kwargs:
        vals = eval_expr(kwargs["values"], ctx)
    else:
        vals = [eval_expr(args[1], ctx)]
    if tgt[0] in ("mapkey", "json_path"):
        # func_append.go at a (possibly nested) map value: slice extends,
        # scalar converts to slice, missing creates (flat-model JSON)
        colname, key0 = tgt[1], tgt[2]
        rest = tgt[3] if tgt[0] == "json_path" else []
        if any(isinstance(v, (pa.Array, pa.ChunkedArray)) for v in vals):
            raise ValueError("append values must be literals")
        old = _map_col_or_empty(ctx, colname)
        cur = M.map_get(old, key0)
        new_vals = J.json_append(cur, rest, vals)
        new = M.map_set(old, key0, new_vals)
        return _set_column(ctx.batch, colname, _choose_rows(mask, new, old))
    if tgt[0] != "column":
        raise ValueError("append target must be a list column or map value")
    colname = tgt[1]
    old = _arr(ctx.batch[colname])
    new = old
    for v in vals:
        new = F.list_append(new, v)
    return _set_column(ctx.batch, colname, _choose_rows(mask, new, old))


def _apply_merge_maps(ctx: _Ctx, args, mask):
    tgt = _resolve_target(args[0][1], ctx)
    source = eval_expr(args[1], ctx)
    strategy = eval_expr(args[2], ctx) if len(args) > 2 else "upsert"
    colname = tgt[1]
    old = _arr(ctx.batch[colname])
    if isinstance(source, dict):
        source = pa.array(
            [[(k, J.encode_val(J._pyify(v))) for k, v in source.items()]]
            * ctx.n, pa.map_(pa.string(), pa.string()))
    else:
        s = _arr(source)
        if pa.types.is_string(s.type) or pa.types.is_large_string(s.type):
            # nested map value (flat-model JSON object) as merge source
            source = J.obj_to_map_rows(s)
    new = M.merge_maps(old, _arr(source), strategy)
    eff = pc.and_(mask, pc.is_valid(_arr(source)))
    return _set_column(ctx.batch, colname, _choose_rows(eff, new, old))


def _apply_limit(ctx: _Ctx, args, mask):
    tgt = _resolve_target(args[0][1], ctx)
    n = int(eval_expr(args[1], ctx))
    priority = [str(x) for x in eval_expr(args[2], ctx)] if len(args) > 2 \
        else []
    colname = tgt[1]
    old = _arr(ctx.batch[colname])
    new = M.limit_map(old, n, priority)
    return _set_column(ctx.batch, colname, _choose_rows(mask, new, old))


def _concat_aligned(tables: list[pa.Table]) -> pa.Table:
    """Concat row-slices whose schemas may have drifted (a statement
    created a column on one half only): missing columns null-fill, type
    conflicts promote permissively, string as the last resort."""
    names: list[str] = []
    for t in tables:
        for c in t.column_names:
            if c not in names:
                names.append(c)
    fixed = []
    for t in tables:
        for c in names:
            if c not in t.column_names:
                # type borrowed from the first table that has the column
                donor = next(x[c].type for x in tables
                             if c in x.column_names)
                t = t.append_column(c, pa.nulls(t.num_rows, donor))
        fixed.append(t.select(names))
    try:
        return pa.concat_tables(fixed, promote_options="permissive")
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        casted = []
        for t in fixed:
            cols = []
            for c in names:
                a = _arr(t[c])
                types = {str(x[c].type) for x in fixed}
                if len(types) > 1 and not pa.types.is_map(a.type):
                    a = pc.cast(a, pa.string())
                cols.append(a)
            casted.append(pa.table(dict(zip(names, cols))))
        return pa.concat_tables(casted, promote_options="permissive")


def _merge_caches(caches: list[dict], lengths: list[int]) -> dict:
    """Row-slice cache dicts -> one cache; keys a failing slice never
    wrote null-fill for its rows."""
    keys = {k for c in caches for k in c}
    out = {}
    for k in keys:
        donor = _arr(next(c[k] for c in caches if k in c))
        parts = [_arr(c[k]) if k in c else pa.nulls(ln, donor.type)
                 for c, ln in zip(caches, lengths)]
        try:
            out[k] = pa.concat_arrays(parts)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            out[k] = pa.concat_arrays(
                [pc.cast(p, pa.string()) for p in parts])
    return out


# ---------------------------------------------------------------------------
# the group executor
# ---------------------------------------------------------------------------

class StatementGroupExecutor:
    """One transformprocessor: ordered ContextStatements groups compiled to
    a single map_batches callable."""

    def __init__(self, groups: list[dict],
                 colmap: dict[str, str] | None = None):
        self.colmap = dict(DEFAULT_COLMAP, **(colmap or {}))
        self.compiled = []
        for g in groups:
            context = g.get("context", "log")
            conds = [_strip_context_prefix(parse_ottl_condition(c), context)
                     for c in g.get("conditions", [])]
            stmts = [_strip_context_prefix(parse_statement(s), context)
                     for s in g.get("statements", [])]
            mode = g.get("error_mode", "propagate")
            if mode not in ("ignore", "silent", "propagate"):
                raise ValueError(f"bad error_mode {mode!r}")
            if context not in ("log", "resource", "scope", "datapoint",
                               "metric"):
                raise ValueError(f"bad context {context!r}")
            self.compiled.append((context, conds, stmts, mode,
                                  bool(g.get("shared_cache"))))

    def _group_colmap(self, context: str) -> dict[str, str]:
        """Context selects the object bare paths address
        (transformprocessor contexts: in a resource group,
        `attributes["k"]` means resource attributes)."""
        if context == "resource":
            return dict(self.colmap,
                        attributes=self.colmap.get("resource.attributes",
                                                   "resource"),
                        schema_url=self.colmap.get("resource.schema_url",
                                                   "resource_schema_url"))
        if context == "scope":
            # bare paths address the scope object (ottlscope): name,
            # version, attributes, schema_url map to the scope_* columns
            # (absent columns read as null — the flat envelope only
            # guarantees scope_name, SURVEY.md §1.3)
            return dict(self.colmap,
                        name=self.colmap.get("instrumentation_scope.name",
                                             "scope_name"),
                        version=self.colmap.get(
                            "instrumentation_scope.version",
                            "scope_version"),
                        attributes=self.colmap.get(
                            "instrumentation_scope.attributes",
                            "scope_attributes"),
                        schema_url=self.colmap.get(
                            "instrumentation_scope.schema_url",
                            "scope_schema_url"))
        if context == "datapoint":
            # ottldatapoint (pkg/ottl/contexts/ottldatapoint): datapoint
            # fields + the owning metric's via `metric.*` dotted paths.
            # The metric-STRUCTURAL editors (copy_metric, scale_metric,
            # extract_sum_metric, ...) create new metric objects — use
            # stages/metrics.py metrics_transform for those shapes.
            return dict(self.colmap, **{
                "__context__": "datapoint",
                "metric.name": "metric_name",
                "metric.unit": "metric_unit",
                "metric.description": "metric_description",
                "metric.type": "__metric_type_code__",
                "metric.aggregation_temporality": "__temporality_code__",
                "metric.is_monotonic": "metric_is_monotonic",
                "value_double": "value", "value_int": "value",
                "count": "count", "time": "ts",
                "start_time": "start_ts",
                # the flat envelope holds ONE timestamp column per slot;
                # the *_unix_nano integer views alias it (ctxdatapoint)
                "time_unix_nano": "ts",
                "start_time_unix_nano": "start_ts",
                # exponential-histogram point fields (ottldatapoint
                # contexts/ottldatapoint; flat envelope spellings)
                "positive.offset": "positive_offset",
                "negative.offset": "negative_offset",
                "positive.bucket_counts": "positive_bucket_counts",
                "negative.bucket_counts": "negative_bucket_counts"})
        if context == "metric":
            # ottlmetric: bare name/unit/description address the metric
            return dict(self.colmap,
                        __context__="metric",
                        name="metric_name", unit="metric_unit",
                        description="metric_description",
                        type="__metric_type_code__",
                        aggregation_temporality="__temporality_code__",
                        is_monotonic="metric_is_monotonic",
                        **{"metric.aggregation_temporality":
                           "__temporality_code__",
                           "metric.is_monotonic": "metric_is_monotonic"})
        return self.colmap

    def __call__(self, batch: pa.Table) -> pa.Table:
        # shared_cache groups read/write ONE cache per batch invocation
        # (transformprocessor common.ContextStatements.SharedCache);
        # unflagged groups keep their own transient cache
        shared: dict = {}
        for context, conds, stmts, mode, shares in self.compiled:
            batch = self._run_group(batch, context, conds, stmts, mode,
                                    shared if shares else None)
        return batch

    def _run_group(self, batch, context, conds, stmts, mode, shared=None):
        ctx = _Ctx(batch, self._group_colmap(context))
        if shared is not None:
            ctx.cache = shared
        if conds:  # OR-ed group gate (config.go conditions)
            gate = None
            for c in conds:
                m = _to_mask(eval_expr(c, ctx), ctx.n)
                gate = m if gate is None else pc.or_kleene(gate, m)
            gate = pc.fill_null(gate, False)
        else:
            gate = pa.array([True] * ctx.n, pa.bool_())
        for st in stmts:
            try:
                ctx.batch = self._apply(ctx, st, gate)
            except Exception as e:  # noqa: BLE001 — error_mode boundary
                if mode == "propagate":
                    raise
                if mode == "ignore":
                    logger.warning("OTTL statement failed (ignored): %s", e)
                # ignore/silent: the reference isolates per record
                # (transformprocessor internal/logs/processor.go:31-77) —
                # retry on row subsets so only the failing records skip
                # this statement
                ctx.batch, ctx.cache = self._apply_rowsafe(
                    ctx.batch, ctx.cache, ctx.colmap, st, gate)
            if ctx.batch.num_rows != ctx.n:
                # metric-structural editor changed the row count
                # (copy_metric/extract_*/aggregate_*): resync the context
                # and re-evaluate the group gate so appended rows are
                # condition-gated for subsequent statements, like the
                # reference's grow-during-iteration metrics slice. Cache
                # rows: null-extended on append, dropped on merge (a
                # merge has no stable row mapping).
                grown = ctx.batch.num_rows - ctx.n
                if grown > 0:
                    ctx.cache = {k: pa.concat_arrays(
                        [_arr(v), pa.nulls(grown, _arr(v).type)])
                        for k, v in ctx.cache.items()}
                else:
                    ctx.cache = {}
                keep_cache = ctx.cache
                ctx = _Ctx(ctx.batch, ctx.colmap)
                ctx.cache = keep_cache
                if conds:
                    gate = None
                    for c in conds:
                        cm = _to_mask(eval_expr(c, ctx), ctx.n)
                        gate = cm if gate is None else pc.or_kleene(gate, cm)
                    gate = pc.fill_null(gate, False)
                else:
                    gate = pa.array([True] * ctx.n, pa.bool_())
        if shared is not None and ctx.cache is not shared:
            # rowsafe retry rebuilt the cache dict — fold it back into the
            # shared store so later shared groups observe the writes
            shared.clear()
            shared.update(ctx.cache)
        return ctx.batch

    def _apply_rowsafe(self, batch, cache, colmap, st, gate):
        """Bisecting per-record retry after a statement failed on the full
        batch. An empty-slice probe separates config-level errors (unknown
        function, bad arguments — raise with no rows, skip the statement
        for everyone, O(1)) from data-dependent errors (bisect to the
        failing rows, O(k log n) attempts for k poisoned rows)."""
        try:
            probe = _Ctx(batch.slice(0, 0), colmap)
            self._apply(probe, st, gate.slice(0, 0))
        except Exception:  # noqa: BLE001 — config-level: skip for all rows
            return batch, cache
        if st[1] in _COLOCATING_EDITORS:
            # cross-row editors can't bisect (a merge inside an arbitrary
            # row slice is a different answer): isolate per METRIC like
            # the reference's per-TransformContext error scope — failing
            # metrics pass through unchanged, the rest aggregate
            return self._metric_isolated_apply(batch, cache, colmap, st,
                                               _arr(gate))
        # the caller just saw the FULL batch fail — skip straight to the
        # halves instead of re-running the known-failing full attempt
        return self._bisect_apply(batch, cache, colmap, st, _arr(gate),
                                  known_failing=True)

    def _metric_isolated_apply(self, batch, cache, colmap, st, gate):
        name = _arr(batch["metric_name"]) \
            if "metric_name" in batch.column_names \
            else pa.array([""] * batch.num_rows)
        outs = []
        for key in pc.unique(pc.fill_null(
                pc.cast(name, pa.string()), "")).to_pylist():
            sel = pc.fill_null(pc.equal(
                pc.cast(name, pa.string()), key),
                key == "")
            sub = batch.filter(sel)
            ctx = _Ctx(sub, colmap)
            try:
                outs.append(self._apply(ctx, st, _arr(gate).filter(sel)))
            except Exception:  # noqa: BLE001 — this metric skips
                outs.append(sub)
        # cache rows have no stable mapping across a merge — drop, same
        # rule as the success path's row-count resync
        return _concat_aligned(outs), {}

    def _bisect_apply(self, batch, cache, colmap, st, gate,
                      known_failing: bool = False):
        n = batch.num_rows
        if n == 0:
            return batch, cache
        if not known_failing:
            ctx = _Ctx(batch, colmap)
            ctx.cache = dict(cache)
            try:
                out = self._apply(ctx, st, gate)
                return out, ctx.cache
            except Exception:  # noqa: BLE001
                pass
        if n == 1:  # this record skips the statement, keeps prior edits
            return batch, cache
        mid = n // 2
        outs, caches = [], []
        for lo, sz in ((0, mid), (mid, n - mid)):
            c = {k: _arr(v).slice(lo, sz) for k, v in cache.items()}
            o, c2 = self._bisect_apply(
                batch.slice(lo, sz), c, colmap, st, gate.slice(lo, sz))
            outs.append(o)
            caches.append(c2)
        return (_concat_aligned(outs),
                _merge_caches(caches, [mid, n - mid]))

    def _apply(self, ctx: _Ctx, st, gate):
        _, name, args, kwargs, where = st
        mask = gate
        if where is not None:
            wm = _to_mask(eval_expr(where, ctx), ctx.n)
            mask = pc.and_(pc.fill_null(wm, False), gate)
        if name == "set":
            return _apply_set(ctx, args, mask)
        if name == "delete_key":
            return _map_editor(M.delete_key, _d_delete_key)(ctx, args, mask)
        if name == "delete_matching_keys":
            return _map_editor(M.delete_matching_keys,
                               _d_delete_matching)(ctx, args, mask)
        if name == "keep_matching_keys":
            return _map_editor(M.keep_matching_keys,
                               _d_keep_matching)(ctx, args, mask)
        if name == "keep_keys":
            return _map_editor(M.keep_keys, _d_keep_keys)(ctx, args, mask)
        if name == "truncate_all":
            return _apply_truncate_all(ctx, args, mask)
        if name == "limit":
            return _apply_limit(ctx, args, mask)
        if name == "merge_maps":
            return _apply_merge_maps(ctx, args, mask)
        if name == "replace_pattern":
            return _apply_replace_pattern(ctx, args, mask, glob=False)
        if name == "replace_match":
            return _apply_replace_pattern(ctx, args, mask, glob=True)
        if name == "replace_all_patterns":
            return _apply_replace_all_patterns(ctx, args, mask)
        if name == "replace_all_matches":
            return _apply_replace_all_matches(ctx, args, mask)
        if name == "append":
            return _apply_append(ctx, args, kwargs, mask)
        if name == "flatten":
            return _apply_flatten(ctx, args, kwargs, mask)
        if name in ME.METRIC_EDITORS:
            # metric-structural editors (transformprocessor metrics
            # contexts only, processor/transformprocessor/internal/
            # metrics/functions.go)
            if ctx.colmap.get("__context__") not in ("datapoint", "metric"):
                raise ValueError(
                    f"{name} requires a datapoint/metric context")
            return ME.METRIC_EDITORS[name](ctx, args, kwargs, mask)
        raise ValueError(f"unknown editor {name!r}")


def transform_processor(groups: list[dict],
                        colmap: dict[str, str] | None = None):
    """Build the map_batches callable for a transformprocessor config."""
    ex = StatementGroupExecutor(groups, colmap)

    def fn(batch: pa.Table) -> pa.Table:
        return ex(batch)

    return fn


# editors whose semantics span rows of one metric: the input must be
# partitioned so each metric's datapoints co-locate (DIVERGENCES #32d)
_COLOCATING_EDITORS = ("aggregate_on_attributes",
                       "aggregate_on_attribute_value")


def transform_metrics(ds, groups: list[dict], *,
                      colmap: dict[str, str] | None = None,
                      n_parts: int | None = None):
    """Dataset-level transformprocessor for the metrics contexts. Plain
    row-local statement chains map per batch with no shuffle; when a
    statement merges datapoints across rows (aggregate_on_*), the input
    hash-partitions by metric_name first so each task holds whole
    metrics — the batch analogue of the reference's per-ResourceMetrics
    execution scope. Partition count is adaptive (cluster CPUs) unless
    pinned."""
    fn = transform_processor(groups, colmap)
    needs_colocate = any(
        parse_statement(s)[1] in _COLOCATING_EDITORS
        for g in groups for s in g.get("statements", []))
    if not needs_colocate:
        return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
    from ..stages.shuffle import adaptive_n_parts, key_partitioner
    add_part = key_partitioner("metric_name", n_parts or adaptive_n_parts())

    def per_part(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns(["_part"]))

    return ds.map_batches(add_part, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def value_expression(expr: str, colmap: dict[str, str] | None = None):
    """ottl ParseValueExpression analogue (pkg/ottl/parser.go
    ParseValueExpression; replayed by e2e Test_e2e_ottl_value_expressions):
    compile a bare OTTL expression to a callable(batch) -> per-row value
    (pa.Array) or scalar for literal-only expressions. Flat-model return
    encoding: nested map/slice values come back as compact JSON text."""
    node = parse_ottl_condition(expr)
    cmap = dict(DEFAULT_COLMAP, **(colmap or {}))

    def fn(batch: pa.Table):
        ctx = _Ctx(batch, cmap)
        return eval_expr(node, ctx)

    return fn
