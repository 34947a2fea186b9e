"""Flat-model JSON nested-value kernels (the nested-target shim).

The engine's row model keeps attributes/resource as ``map<string,string>``
with nested pdata values (pcommon.Map / pcommon.Slice) stored as compact
JSON text (DIVERGENCES.md). These kernels give OTTL statements one or
more levels of access into those encoded values, closing the
``attributes["foo"]["bar"]`` gap against the reference behavior spec
(pkg/ottl/contexts/internal/ctxutil GetMapValue/SetMapValue index
resolution; pkg/ottl/ottlfuncs/func_flatten.go; the nested-indexing cases
of pkg/ottl/e2e/e2e_test.go).

Execution strategy:
- static reads compile to ONE polars ``str.json_path_match`` call
  (vectorized Rust JSON cursor; scalars come back as bare text,
  containers as JSON text — exactly the flat-model value encoding);
- dynamic (per-row) segments and all writes decode/patch/re-encode per
  row. Nested writes are rare control-plane edits (transform configs),
  never the flagship parse hot path;
- key-type mismatches raise ValueError so the statement executor's
  error_mode boundary sees them (mirrors ctxutil errors: "invalid key
  type", "expecting 'int64'"); missing keys / out-of-range indexes
  yield null (OTTL nil).
"""

from __future__ import annotations

import json
import math
import re

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "encode_val", "json_get", "json_get_dyn", "json_set", "json_append",
    "smart_len", "is_json_map", "is_json_list", "obj_apply",
    "flatten_native", "flatten_map_rows", "encode_rowwise",
]

# keys that can go into a polars JSONPath bracket segment verbatim
_SAFE_KEY = re.compile(r"^[^'\"\\\x00-\x1f]*$")


def _arr(x):
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


def _as_str_series(arr: pa.Array) -> pl.Series:
    a = _arr(arr)
    if not (pa.types.is_string(a.type) or pa.types.is_large_string(a.type)):
        a = pc.cast(a, pa.string())
    return pl.from_arrow(a)


def _go_float(v: float) -> str:
    """pcommon.Value.AsString float encoding (encoding/json rules):
    positional 'f' shortest-round-trip for 1e-6 <= |v| < 1e21 (so 1e16
    prints bare digits, 1.0 prints "1"), scientific shortest otherwise —
    a 1e15 cutoff diverged on [1e15, 1e21)."""
    if v == 0:
        return "0"
    if math.isfinite(v) and 1e-6 <= abs(v) < 1e21:
        return np.format_float_positional(v, unique=True, trim="-")
    return repr(v)


def encode_val(v) -> str | None:
    """Flat-model encoding of one decoded JSON value: bools Go-style,
    containers compact JSON, floats Go-formatted, else str()."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    if isinstance(v, float):
        return _go_float(v)
    return str(v)


def _seg_to_path(seg) -> str:
    if isinstance(seg, bool):
        raise ValueError("unable to resolve an integer index in slice: "
                         "could not resolve key, got bool")
    if isinstance(seg, int):
        return f"[{seg}]"
    if isinstance(seg, float):
        # ctxutil: slice indexes must be int64 — float64 keys are an error
        raise ValueError("unable to resolve an integer index in slice: "
                         "expecting 'int64' but got 'float64'")
    if isinstance(seg, str):
        if not _SAFE_KEY.match(seg):
            return None  # caller falls back to per-row
        return f"['{seg}']"
    raise ValueError(f"cannot index with key of type {type(seg)}")


def json_get(arr: pa.Array, segs: list) -> pa.Array:
    """Static path read: arr rows are flat-model value strings; extract
    segs (str object keys / int list indexes). Scalars come back as bare
    text, containers as compact JSON text, missing/invalid as null."""
    parts = [_seg_to_path(s) for s in segs]
    if any(p is None for p in parts):  # quote/backslash-bearing key
        return json_get_dyn(arr, segs)
    path = "$" + "".join(parts)
    s = _as_str_series(arr)
    out = s.str.json_path_match(path).to_arrow()
    out = out.cast(pa.string()) if not pa.types.is_string(out.type) else out
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    # polars returns null on key-type mismatches (str key into a list,
    # index into a map) that the dyn path — and the reference's ctxutil —
    # raise for; error_mode must see the same error whichever path a key
    # took. Only the null-result container-shaped rows are re-checked via
    # the exact walker (rare), so the vectorized read stays the fast path.
    a = _arr(arr)
    a = pc.cast(a, pa.string()) if not pa.types.is_string(a.type) else a
    sus = pc.and_(pc.and_(pc.is_null(out), pc.is_valid(a)),
                  pc.fill_null(pc.or_(pc.starts_with(a, "{"),
                                      pc.starts_with(a, "[")), False))
    if pc.any(sus).as_py():
        idx = np.nonzero(sus.to_numpy(zero_copy_only=False))[0]
        sub = json_get_dyn(a.take(pa.array(idx)), segs)  # raises on mismatch
        vals = out.to_pylist()
        for i, v in zip(idx, sub.to_pylist()):
            vals[i] = v
        out = pa.array(vals, pa.string())
    return out


def _as_int_key(s):
    """Slice-index coercion. Flat model stores ints as numeric strings, so
    accept integral strings where Go has int64; reject everything else the
    way ctxutil does."""
    if isinstance(s, bool):
        raise ValueError("unable to resolve an integer index in slice: "
                         "could not resolve key, got bool")
    if isinstance(s, int):
        return s
    if isinstance(s, float):
        raise ValueError("unable to resolve an integer index in slice: "
                         "expecting 'int64' but got 'float64'")
    if isinstance(s, str):
        try:
            return int(s)
        except ValueError:
            raise ValueError(
                "unable to resolve an integer index in slice: could not "
                f"resolve key for map/slice, expecting 'int64' but got {s!r}")
    raise ValueError(f"cannot index a slice with {type(s)}")


def _walk_get(doc, segs_row):
    cur = doc
    for s in segs_row:
        if cur is None:
            return None
        if isinstance(cur, dict):
            if not isinstance(s, str):
                raise ValueError("unable to resolve a string index in map: "
                                 "invalid key type")
            cur = cur.get(s)
        elif isinstance(cur, list):
            i = _as_int_key(s)
            if not 0 <= i < len(cur):
                return None
            cur = cur[i]
        else:
            # indexing into a scalar-valued row yields nil, matching the
            # static path (polars json_path_match returns null there) —
            # the same logical read must not change error behavior based
            # on whether the key is per-row
            return None
    return cur


def _materialize_segs(segs, n: int) -> list[list]:
    """Per-row segment lists: static segs repeated, array segs unpacked."""
    cols = []
    for s in segs:
        if isinstance(s, (pa.Array, pa.ChunkedArray)):
            cols.append(_arr(s).to_pylist())
        else:
            cols.append([s] * n)
    return [list(row) for row in zip(*cols)] if cols else [[] for _ in
                                                           range(n)]


def _try_decode(v):
    """Decode a flat-model value string: container-shaped text -> dict or
    list, everything else stays a scalar string."""
    if v is None:
        return None
    if isinstance(v, str) and v[:1] in ("{", "["):
        try:
            return json.loads(v)
        except (ValueError, TypeError):
            return v
    return v


def json_get_dyn(arr: pa.Array, segs: list) -> pa.Array:
    """Per-row path read; segs may contain pa.Array (per-row key)
    elements. Raises on key-type mismatches (ctxutil semantics)."""
    a = _arr(arr)
    vals = pc.cast(a, pa.string()).to_pylist() \
        if not pa.types.is_string(a.type) else a.to_pylist()
    n = len(vals)
    rows = _materialize_segs(segs, n)
    out = []
    for v, segs_row in zip(vals, rows):
        doc = _try_decode(v)
        if doc is None or any(s is None for s in segs_row):
            out.append(None)
            continue
        out.append(encode_val(_walk_get(doc, segs_row)))
    return pa.array(out, pa.string())


def _container_rows(arr: pa.Array):
    """(values_pylist, bool list: row is {- or [-shaped)."""
    a = _arr(arr)
    vals = a.to_pylist()
    return vals, [isinstance(v, str) and v[:1] in ("{", "[") for v in vals]


def smart_len(arr: pa.Array) -> pa.Array:
    """Len over flat-model strings: container-shaped rows report container
    length, other rows string length (divergence: a plain string that
    parses as a JSON container is indistinguishable from a nested
    value — DIVERGENCES.md). Only the container-SHAPED rows (vectorized
    starts_with mask) are decoded in Python — one stray '{' log line must
    not push the whole column off the utf8_length kernel."""
    a = _arr(arr)
    base = pc.cast(pc.utf8_length(a), pa.int64())
    shaped = pc.fill_null(pc.or_(pc.starts_with(a, "{"),
                                 pc.starts_with(a, "[")), False)
    if not pc.any(shaped).as_py():
        return base
    idx = np.nonzero(shaped.to_numpy(zero_copy_only=False))[0]
    out = base.to_pylist()
    sub = a.take(pa.array(idx)).to_pylist()
    for i, v in zip(idx, sub):
        try:
            out[i] = len(json.loads(v))
        except (ValueError, TypeError):
            pass
    return pa.array(out, pa.int64())


def _is_json_kind(arr: pa.Array, head: str, kind) -> pa.Array:
    a = _arr(arr)
    starts = pc.fill_null(pc.starts_with(a, head), False)
    if not pc.any(starts).as_py():
        return pa.array([False] * len(a), pa.bool_())
    vals = a.to_pylist()
    out = []
    for v in vals:
        ok = False
        if isinstance(v, str) and v[:1] == head:
            try:
                ok = isinstance(json.loads(v), kind)
            except (ValueError, TypeError):
                ok = False
        out.append(ok)
    return pa.array(out, pa.bool_())


def is_json_map(arr: pa.Array) -> pa.Array:
    return _is_json_kind(arr, "{", dict)


def is_json_list(arr: pa.Array) -> pa.Array:
    return _is_json_kind(arr, "[", list)


def _from_flat(v):
    """Value from an evaluated OTTL expression -> native JSON value."""
    if isinstance(v, bytes):
        return v.hex()
    return v


def json_set(arr: pa.Array, segs: list, values: list) -> pa.Array:
    """Set the value at segs inside each row's JSON document, creating
    missing objects along string segments (ctxutil SetMapValue). values
    is a per-row python list (typed — ints stay JSON numbers). Rows whose
    value is None come back null (set(x, nil) is masked by the caller)."""
    for s in segs:
        if isinstance(s, float):
            _seg_to_path(s)  # raises the ctxutil float-key error
    a = _arr(arr)
    vals = a.to_pylist() if pa.types.is_string(a.type) \
        else pc.cast(a, pa.string()).to_pylist()
    n = len(vals)
    rows = _materialize_segs(segs, n)
    out = []
    for v, segs_row, newval in zip(vals, rows, values):
        if newval is None or any(s is None for s in segs_row):
            out.append(None)
            continue
        if not segs_row:
            # empty path = replace the whole document (json_append
            # supports segs=[], so this entry point must too)
            out.append(encode_val(_from_flat(newval)))
            continue
        doc = _try_decode(v)
        if doc is None or not isinstance(doc, (dict, list)):
            doc = {} if isinstance(segs_row[0], str) else []
        cur = doc
        for i, s in enumerate(segs_row):
            last = i == len(segs_row) - 1
            if isinstance(cur, dict):
                if not isinstance(s, str):
                    raise ValueError("unable to resolve a string index in "
                                     "map: invalid key type")
                if last:
                    cur[s] = _from_flat(newval)
                else:
                    nxt = cur.get(s)
                    if not isinstance(nxt, (dict, list)):
                        nxt = cur[s] = {} if isinstance(segs_row[i + 1],
                                                        str) else []
                    cur = nxt
            elif isinstance(cur, list):
                j = _as_int_key(s)
                if not 0 <= j < len(cur):
                    raise ValueError(
                        f"index {j} out of range of slice len {len(cur)}")
                if last:
                    cur[j] = _from_flat(newval)
                else:
                    nxt = cur[j]
                    if not isinstance(nxt, (dict, list)):
                        nxt = cur[j] = {} if isinstance(segs_row[i + 1],
                                                        str) else []
                    cur = nxt
            else:
                raise ValueError("cannot set into a scalar value")
        out.append(json.dumps(doc, separators=(",", ":")))
    return pa.array(out, pa.string())


def json_append(arr: pa.Array, segs: list, values: list) -> pa.Array:
    """func_append.go semantics at a nested path: existing slice extends,
    scalar converts to a one-element slice first, missing creates. segs
    may be [] (the row value itself is the append target)."""
    a = _arr(arr)
    vals = a.to_pylist() if pa.types.is_string(a.type) \
        else pc.cast(a, pa.string()).to_pylist()
    n = len(vals)
    rows = _materialize_segs(segs, n)
    appended = [_from_flat(v) for v in values]
    out = []
    for v, segs_row in zip(vals, rows):
        doc = _try_decode(v)
        if not segs_row:
            if doc is None:
                new = list(appended)
            elif isinstance(doc, list):
                new = doc + appended
            else:
                new = [doc] + appended
            out.append(json.dumps(new, separators=(",", ":")))
            continue
        if doc is None or not isinstance(doc, (dict, list)):
            doc = {} if isinstance(segs_row[0], str) else []
        parent = _walk_get(doc, segs_row[:-1]) if len(segs_row) > 1 else doc
        if parent is None:
            # create intermediate objects for string segments
            cur = doc
            for i, s in enumerate(segs_row[:-1]):
                if isinstance(cur, dict):
                    nxt = cur.get(s)
                    if not isinstance(nxt, (dict, list)):
                        nxt = cur[s] = {}
                    cur = nxt
                else:
                    raise ValueError("cannot append through a slice "
                                     "segment that does not exist")
            parent = cur
        last = segs_row[-1]
        if isinstance(parent, dict):
            if not isinstance(last, str):
                raise ValueError("unable to resolve a string index in map: "
                                 "invalid key type")
            cur = parent.get(last)
            if cur is None:
                parent[last] = list(appended)
            elif isinstance(cur, list):
                parent[last] = cur + appended
            else:
                parent[last] = [cur] + appended
        elif isinstance(parent, list):
            j = _as_int_key(last)
            if not 0 <= j < len(parent):
                raise ValueError(
                    f"index {j} out of range of slice len {len(parent)}")
            cur = parent[j]
            parent[j] = (cur + appended if isinstance(cur, list)
                         else [cur] + appended)
        else:
            raise ValueError("cannot append into a scalar value")
        out.append(json.dumps(doc, separators=(",", ":")))
    return pa.array(out, pa.string())


def obj_to_map_rows(arr: pa.Array) -> pa.Array:
    """Object-shaped JSON strings -> map<string,string> rows (values
    flat-encoded); non-object rows -> null. Used when a nested map value
    feeds a map-typed slot (merge_maps source)."""
    a = _arr(arr)
    vals = a.to_pylist() if pa.types.is_string(a.type) \
        else pc.cast(a, pa.string()).to_pylist()
    out = []
    for v in vals:
        doc = _try_decode(v)
        if isinstance(doc, dict):
            out.append([(k, encode_val(x)) for k, x in doc.items()])
        else:
            out.append(None)
    return pa.array(out, pa.map_(pa.string(), pa.string()))


def obj_apply(arr: pa.Array, fn) -> pa.Array:
    """Apply fn(dict) -> dict to object-shaped rows; other rows pass
    through unchanged (the reference's map editors error on non-map
    targets — the executor masks those rows out)."""
    a = _arr(arr)
    vals = a.to_pylist() if pa.types.is_string(a.type) \
        else pc.cast(a, pa.string()).to_pylist()
    out = []
    for v in vals:
        doc = _try_decode(v)
        if isinstance(doc, dict):
            out.append(json.dumps(fn(doc), separators=(",", ":")))
        else:
            out.append(v)
    return pa.array(out, pa.string())


def flatten_native(d: dict, prefix: str = "", depth: int | None = None,
                   resolve_conflicts: bool = False) -> dict:
    """func_flatten.go flattenMap on a decoded dict -> flat dict with
    native leaf values. Duplicate keys: last-wins without
    resolve_conflicts (pcommon Put), '.0'/'.1' suffixes with it."""
    max_depth = depth if depth is not None else (1 << 62)
    result: dict = {}
    existing: dict = {}

    def put(key, v):
        if resolve_conflicts:
            if key in result:
                nk = f"{key}.{existing[key]}"
                existing[key] += 1
                result[nk] = v
            else:
                existing[key] = 0
                result[key] = v
        else:
            result[key] = v

    def flatten_value(k, v, cur_depth, pfx):
        key = pfx + k
        if isinstance(v, dict) and cur_depth < max_depth:
            flatten_map(v, key, cur_depth + 1)
        elif isinstance(v, list) and cur_depth < max_depth:
            for i, el in enumerate(v):
                if isinstance(el, dict) and cur_depth + 1 < max_depth:
                    flatten_map(el, f"{key}.{i}", cur_depth + 2)
                elif isinstance(el, list) and cur_depth + 1 < max_depth:
                    flatten_slice(el, f"{key}.{i}", cur_depth + 2)
                elif resolve_conflicts:
                    put(key, el)
                else:
                    result[f"{key}.{i}"] = el
        else:
            put(key, v)

    def flatten_map(m, pfx, cur_depth):
        p = pfx + "." if pfx else ""
        for k, v in m.items():
            flatten_value(k, v, cur_depth, p)

    def flatten_slice(s, pfx, cur_depth):
        for i, el in enumerate(s):
            flatten_value(str(i), el, cur_depth + 1, pfx + ".")

    flatten_map(d, prefix, 0)
    return result


def flatten_map_rows(maparr: pa.Array, prefix: str = "",
                     depth: int | None = None,
                     resolve_conflicts: bool = False) -> pa.Array:
    """flatten(attributes) on a map<string,string> column: container-shaped
    values explode into dotted keys (per-row python — flatten is a
    control-plane editor, not the parse hot path)."""
    a = _arr(maparr)
    out = []
    for row in a.to_pylist():
        if row is None:
            out.append(None)
            continue
        d = {k: _try_decode(v) for k, v in row}
        flat = flatten_native(d, prefix, depth, resolve_conflicts)
        out.append([(k, encode_val(v)) for k, v in flat.items()])
    return pa.array(out, pa.map_(pa.string(), pa.string()))


def _contains_array(v) -> bool:
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return True
    if isinstance(v, dict):
        return any(_contains_array(x) for x in v.values())
    if isinstance(v, (list, tuple)):
        return any(_contains_array(x) for x in v)
    return False


def encode_rowwise(value, n: int) -> pa.Array:
    """A map/list literal (possibly holding per-row pa.Array leaves from
    path expressions) -> per-row compact-JSON string array. Timestamps
    stay ints/strings per their evaluated representation."""
    if not _contains_array(value):
        enc = json.dumps(_pyify(value), separators=(",", ":"), default=str)
        return pa.array([enc] * n, pa.string())

    # materialize arrays once, then slice per row
    def mat2(v):
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            return ("__rows__", _arr(v).to_pylist())
        if isinstance(v, dict):
            return {k: mat2(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [mat2(x) for x in v]
        return v

    def pick(v, i):
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "__rows__":
            return _pyify_scalar(v[1][i])
        if isinstance(v, dict):
            return {k: pick(x, i) for k, x in v.items()}
        if isinstance(v, list):
            return [pick(x, i) for x in v]
        return _pyify_scalar(v)

    tree = mat2(value)
    return pa.array(
        [json.dumps(pick(tree, i), separators=(",", ":"), default=str)
         for i in range(n)], pa.string())


def _pyify_scalar(v):
    if isinstance(v, bytes):
        return v.hex()
    import datetime as _dt
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    return v


def _pyify(v):
    if isinstance(v, dict):
        return {k: _pyify(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_pyify(x) for x in v]
    return _pyify_scalar(v)
