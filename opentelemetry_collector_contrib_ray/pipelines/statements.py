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
error_mode granularity is the STATEMENT (a failing statement is skipped
under ignore/silent, raised under propagate) rather than the record —
per-record error isolation does not exist in columnar execution
(documented in DIVERGENCES.md).

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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import maps as M
from ..functions import ottl as F
from ..functions.ottl_parser import parse_ottl_condition, parse_statement

logger = logging.getLogger(__name__)

# log-context path -> flat column (SURVEY.md §1.3 envelope mapping)
DEFAULT_COLMAP = {
    "body": "body", "time": "ts", "observed_time": "observed_ts",
    "severity_number": "severity_number", "severity_text": "severity_text",
    "trace_id": "trace_id", "span_id": "span_id", "flags": "flags",
    "attributes": "attributes", "resource.attributes": "resource",
    "instrumentation_scope.name": "scope_name",
}

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
        return F.str_len(a)
    if isinstance(x, (list, dict, str)):
        return len(x)
    raise ValueError(f"Len: unsupported operand {type(x)}")


def _adapter_concat(ctx, args, kwargs):
    values, delim = args
    parts = [_broadcast(v, ctx.n) for v in values]
    return F.concat(delim, *parts)


def _adapter_format(ctx, args, kwargs):
    fmt, values = args
    parts = [_broadcast(v, ctx.n) for v in values]
    return F.format_str(fmt, parts)


def _adapter_sort(ctx, args, kwargs):
    target = args[0]
    order = args[1] if len(args) > 1 else kwargs.get("order", "asc")
    if isinstance(target, list):  # literal list -> python sort, OTTL rules
        if all(isinstance(v, bool) for v in target):
            return sorted(target, reverse=(order == "desc"))
        if all(isinstance(v, (int, float)) and not isinstance(v, bool)
               for v in target):
            return sorted(target, reverse=(order == "desc"))
        return sorted(map(str, target), reverse=(order == "desc"))
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


def _adapter_parse_keyvalue(ctx, args, kwargs):
    target = args[0]
    delim = args[1] if len(args) > 1 else kwargs.get("delimiter", "=")
    pair = args[2] if len(args) > 2 else kwargs.get("pair_delimiter", " ")

    def one(v: str):
        out = []
        i = 0
        s = v
        # quoted values may contain the pair delimiter
        while i < len(s):
            j = s.find(delim, i)
            if j < 0:
                break
            key = s[i:j].strip()
            if j + 1 < len(s) and s[j + 1] == '"':
                k = s.find('"', j + 2)
                val = s[j + 2:k if k > 0 else len(s)]
                i = (k + 1 + len(pair)) if k > 0 else len(s)
            else:
                k = s.find(pair, j + 1)
                val = s[j + 1:k if k >= 0 else len(s)]
                i = (k + len(pair)) if k >= 0 else len(s)
            out.append((key, val))
        return out

    a = _broadcast(target, ctx.n)
    py = [None if v is None else one(v) for v in _arr(pc.cast(a, pa.string())).to_pylist()]
    return pa.array(py, pa.map_(pa.string(), pa.string()))


def _adapter_parse_csv(ctx, args, kwargs):
    target = args[0]
    headers = args[1] if len(args) > 1 else kwargs.get("header")
    delim = args[2] if len(args) > 2 else kwargs.get("delimiter", ",")
    hdelim = args[3] if len(args) > 3 else kwargs.get("headerDelimiter",
                                                      delim)
    names = headers.split(hdelim)

    def one(v: str):
        vals = v.split(delim)
        return list(zip(names, vals))

    a = _broadcast(target, ctx.n)
    py = [None if v is None else one(v)
          for v in _arr(pc.cast(a, pa.string())).to_pylist()]
    return pa.array(py, pa.map_(pa.string(), pa.string()))


def _adapter_parse_json(ctx, args, kwargs):
    """Top-level object -> map<string,string> (flat model: scalar values
    stringified, Go-style for bools; nested values JSON-encoded —
    DIVERGENCES.md)."""
    import json as _json

    def enc(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (dict, list)):
            return _json.dumps(v, separators=(",", ":"))
        return str(v)

    def one(v: str):
        d = _json.loads(v)
        if isinstance(d, dict):
            return [(k, enc(x)) for k, x in d.items()]
        return [(str(i), enc(x)) for i, x in enumerate(d)]

    a = _broadcast(args[0], ctx.n)
    py = [None if v is None else one(v)
          for v in _arr(pc.cast(a, pa.string())).to_pylist()]
    return pa.array(py, pa.map_(pa.string(), pa.string()))


def _adapter_tokv(ctx, args, kwargs):
    target = args[0]
    delim = args[1] if len(args) > 1 else "="
    pair = args[2] if len(args) > 2 else " "
    return M.to_key_value_string(_arr(target), delim, pair)


def _adapter_grok(ctx, args, kwargs):
    from ..functions.grok import GrokCompiler
    target, pattern = args[0], args[1]
    regex, _types = GrokCompiler().compile(pattern)
    return F.extract_patterns(_broadcast(target, ctx.n), regex)


def _adapter_slice_to_map(ctx, args, kwargs):
    target = args[0]
    keys = args[1]
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
            return pc.list_element(_arr(base), int(idx))
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
        return ctx.cache.get(key, pa.nulls(ctx.n, pa.string()))
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


def _column(ctx: _Ctx, name: str):
    if name not in ctx.batch.column_names:
        return pa.nulls(ctx.n, pa.string())
    return _arr(ctx.batch[name])


def _index_into(cur, key, ctx: _Ctx):
    a = _arr(cur)
    dynamic = isinstance(key, (pa.Array, pa.ChunkedArray))
    if pa.types.is_map(a.type):
        if dynamic:  # attributes[attributes["flags"]] — per-row key
            return M.map_get_dyn(a, pc.cast(_arr(key), pa.string()))
        return M.map_get(a, str(key))
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
        return k(a, b)
    # comparisons
    if both_scalar:
        return _cmp_scalars(op, lv, rv)
    # nil comparisons -> validity checks
    if rv is None or lv is None:
        arr = _broadcast(lv if rv is None else rv, ctx.n)
        valid = pc.is_valid(arr)
        return pc.invert(valid) if op == "==" else valid
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
    ("mapkey_dyn", colname, key_array) | ("map", colname) | ("cache", key).
    Dynamic per-row keys raise unless the editor opts in (only `set`)."""
    name, idxs = segs[0]
    if name == "cache":
        key = str(eval_expr(idxs[0], ctx))
        return ("cache", key)
    if name == "resource" and len(segs) > 1 and segs[1][0] == "attributes":
        colname = ctx.colmap.get("resource.attributes", "resource")
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
    if isinstance(key, (pa.Array, pa.ChunkedArray)):
        if not allow_dyn:
            raise ValueError(
                "dynamic (per-row) map keys are only supported by `set`")
        return ("mapkey_dyn", colname, pc.cast(_arr(key), pa.string()))
    return ("mapkey", colname, str(key))


def _apply_set(ctx: _Ctx, args, mask):
    target_node, value_node = args
    if value_node == ("lit", None):
        return ctx.batch  # set(x, nil) is a no-op (e2e corpus)
    value = eval_expr(value_node, ctx)
    tgt = _resolve_target(target_node[1], ctx, allow_dyn=True)
    if tgt[0] == "cache":
        ctx.cache[tgt[1]] = _broadcast(value, ctx.n)
        return ctx.batch
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


def _map_editor(fn):
    """Wrap an (old_map, *args) -> new_map kernel as a masked editor."""
    def apply(ctx: _Ctx, args, mask):
        tgt = _resolve_target(args[0][1], ctx)
        if tgt[0] != "map":
            raise ValueError("editor target must be a map column")
        colname = tgt[1]
        old = _arr(ctx.batch[colname])
        extra = [eval_expr(a, ctx) for a in args[1:]]
        new = fn(old, *extra)
        return _set_column(ctx.batch, colname,
                           _choose_rows(mask, new, old))
    return apply


def _apply_replace_pattern(ctx: _Ctx, args, mask, glob: bool = False):
    target_node = args[0]
    pattern = eval_expr(args[1], ctx)
    repl = eval_expr(args[2], ctx)
    tgt = _resolve_target(target_node[1], ctx)
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
    new = _map_values_rewrite(
        old, lambda it: pc.utf8_slice_codeunits(it, 0, limit))
    return _set_column(ctx.batch, colname, _choose_rows(mask, new, old))


def _apply_append(ctx: _Ctx, args, kwargs, mask):
    tgt = _resolve_target(args[0][1], ctx)
    if "values" in kwargs:
        vals = eval_expr(kwargs["values"], ctx)
    else:
        vals = [eval_expr(args[1], ctx)]
    colname = tgt[1] if tgt[0] == "column" else None
    if colname is None:
        raise ValueError("append supports top-level list columns only")
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
            [[(k, str(v)) for k, v in source.items()]] * ctx.n,
            pa.map_(pa.string(), pa.string()))
    new = M.merge_maps(old, _arr(source), strategy)
    return _set_column(ctx.batch, colname, _choose_rows(mask, new, old))


def _apply_limit(ctx: _Ctx, args, mask):
    tgt = _resolve_target(args[0][1], ctx)
    n = int(eval_expr(args[1], ctx))
    priority = [str(x) for x in eval_expr(args[2], ctx)] if len(args) > 2 \
        else []
    colname = tgt[1]
    old = _arr(ctx.batch[colname])
    new = M.limit_map(old, n, priority)
    return _set_column(ctx.batch, colname, _choose_rows(mask, new, old))


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
            conds = [parse_ottl_condition(c) for c in g.get("conditions", [])]
            stmts = [parse_statement(s) for s in g.get("statements", [])]
            mode = g.get("error_mode", "propagate")
            if mode not in ("ignore", "silent", "propagate"):
                raise ValueError(f"bad error_mode {mode!r}")
            context = g.get("context", "log")
            if context not in ("log", "resource", "scope"):
                raise ValueError(f"bad context {context!r}")
            self.compiled.append((context, conds, stmts, mode))

    def _group_colmap(self, context: str) -> dict[str, str]:
        """Context selects the object bare paths address
        (transformprocessor contexts: in a resource group,
        `attributes["k"]` means resource attributes)."""
        if context == "resource":
            return dict(self.colmap,
                        attributes=self.colmap.get("resource.attributes",
                                                   "resource"))
        if context == "scope":
            # scope attributes are not part of the flat envelope
            # (SURVEY.md §1.3) — only the scope name is addressable;
            # attributes paths in a scope group would silently hit LOG
            # attributes, so unmap them to a clearly-named missing column
            return dict(self.colmap,
                        name=self.colmap.get("instrumentation_scope.name",
                                             "scope_name"),
                        attributes="__scope_attributes_unmapped__")
        return self.colmap

    def __call__(self, batch: pa.Table) -> pa.Table:
        for context, conds, stmts, mode in self.compiled:
            batch = self._run_group(batch, context, conds, stmts, mode)
        return batch

    def _run_group(self, batch, context, conds, stmts, mode):
        ctx = _Ctx(batch, self._group_colmap(context))
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
                # ignore/silent: skip this statement, keep going
        return ctx.batch

    def _apply(self, ctx: _Ctx, st, gate):
        _, name, args, kwargs, where = st
        mask = gate
        if where is not None:
            wm = _to_mask(eval_expr(where, ctx), ctx.n)
            mask = pc.and_(pc.fill_null(wm, False), gate)
        if name == "set":
            return _apply_set(ctx, args, mask)
        if name == "delete_key":
            return _map_editor(M.delete_key)(
                ctx, args, mask)
        if name == "delete_matching_keys":
            return _map_editor(M.delete_matching_keys)(ctx, args, mask)
        if name == "keep_matching_keys":
            return _map_editor(M.keep_matching_keys)(ctx, args, mask)
        if name == "keep_keys":
            return _map_editor(M.keep_keys)(ctx, args, mask)
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
            raise ValueError(
                "flatten(attributes) needs nested maps — flat model keeps "
                "attributes single-level (DIVERGENCES.md); use "
                "functions.maps.flatten_struct for struct columns")
        raise ValueError(f"unknown editor {name!r}")


def transform_processor(groups: list[dict],
                        colmap: dict[str, str] | None = None):
    """Build the map_batches callable for a transformprocessor config."""
    ex = StatementGroupExecutor(groups, colmap)

    def fn(batch: pa.Table) -> pa.Table:
        return ex(batch)

    return fn
