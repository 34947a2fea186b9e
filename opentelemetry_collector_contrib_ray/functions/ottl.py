"""OTTL converter/editor library re-expressed as vectorized Arrow kernels.

Reference: pkg/ottl/ottlfuncs/func_*.go (92 function files — SURVEY.md §2.5).
We do NOT port the participle grammar (pkg/ottl/grammar.go); statements are
composed in Python: each function here maps Arrow array(s) -> Arrow array,
usable inside any map_batches stage, and the REGISTRY mirrors the collector's
function-factory map (ottlfuncs/functions.go) as the user-extension surface.

Conventions:
  - null in -> null out (OTTL converters propagate pcommon empty similarly)
  - string kernels are pyarrow.compute (zero-copy); hashes vectorize over the
    DICTIONARY of distinct values (cost O(cardinality), not O(rows))
  - time functions take/return timestamp[us] arrays

Functions whose semantics need per-row dynamic typing (is_list on a variant
column etc.) operate on the declared Arrow column type instead — the flat
schema makes most is_* checks compile-time constants, documented divergence.
"""

from __future__ import annotations

import hashlib
import re
import uuid as _uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _arr(x) -> pa.Array:
    if isinstance(x, pa.ChunkedArray):
        return x.combine_chunks()
    return x


def _dict_apply(col, fn, out_type=pa.string()):
    """Apply a python fn over DISTINCT values only (dictionary-encode trick:
    per-unique cost, vectorized take back)."""
    d = pc.dictionary_encode(pc.cast(_arr(col), pa.string()))
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    vals = [None if v is None else fn(v) for v in d.dictionary.to_pylist()]
    return pc.take(pa.array(vals, out_type), d.indices)


# --- string (func_convert_case.go, func_split.go, func_substring.go, ...) --

def to_upper_case(col):
    return pc.utf8_upper(_arr(col))


def to_lower_case(col):
    return pc.utf8_lower(_arr(col))


def to_snake_case(col):
    """func_to_snake_case.go: camel/pascal -> snake."""
    s = pc.replace_substring_regex(_arr(col), r"(\p{Ll})(\p{Lu})", r"\1_\2")
    s = pc.replace_substring_regex(s, r"[\s-]+", "_")
    return pc.utf8_lower(s)


def to_camel_case(col):
    """func_to_camel_case.go: snake/space -> UpperCamel."""
    def one(v: str) -> str:
        return "".join(w[:1].upper() + w[1:] for w in v.replace("-", "_")
                       .replace(" ", "_").split("_") if w)
    return _dict_apply(col, one)


def convert_case(col, to: str):
    return {"upper": to_upper_case, "lower": to_lower_case,
            "snake": to_snake_case, "camel": to_camel_case}[to](col)


def trim(col, chars: str | None = None):
    a = _arr(col)
    return pc.utf8_trim_whitespace(a) if chars is None else pc.utf8_trim(a, chars)


def split(col, delimiter: str):
    return pc.split_pattern(_arr(col), delimiter)


def substring(col, start: int, length: int):
    return pc.utf8_slice_codeunits(_arr(col), start, start + length)


def concat(delimiter: str, *cols):
    """func_concat.go: join operands with delimiter (null -> '')."""
    parts = [pc.fill_null(pc.cast(_arr(c), pa.string()), "")
             if isinstance(c, (pa.Array, pa.ChunkedArray)) else c
             for c in cols]
    return pc.binary_join_element_wise(*parts, delimiter)


def format_str(fmt: str, cols):
    """func_format.go: %-style sprintf per row (row loop over pylists —
    Format is control-plane, not a hot-path kernel). All-literal operands
    (no Arrow array among them) produce a single-row constant the caller
    broadcasts — max() over no arrays was an unhandled crash."""
    lens = [len(_arr(c)) for c in cols
            if isinstance(c, (pa.Array, pa.ChunkedArray))]
    n = max(lens) if lens else 1
    cols_py = [(_arr(c).to_pylist() if isinstance(c, (pa.Array, pa.ChunkedArray))
                else [c] * n) for c in cols]
    return pa.array([fmt % tuple(vals) for vals in zip(*cols_py)], pa.string())


def str_len(col):
    return pc.cast(pc.utf8_length(_arr(col)), pa.int64())


def truncate_all(col, limit: int):
    """func_truncate_all.go: cap string length at limit."""
    return pc.utf8_slice_codeunits(_arr(col), 0, limit)


def replace_pattern(col, pattern: str, replacement: str):
    """func_replace_pattern.go ($$n group refs -> RE2 \\n)."""
    return pc.replace_substring_regex(_arr(col), pattern,
                                      replacement.replace("$$", "\\"))


def _glob_to_re2(glob: str) -> str:
    """filepath.Match-style glob -> anchored RE2 (fnmatch.translate emits
    atomic groups `(?>...)` on py3.11+, which RE2 rejects)."""
    out = []
    for ch in glob:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def replace_match(col, glob: str, replacement: str):
    """func_replace_match.go: glob full-match -> literal replacement."""
    m = pc.match_substring_regex(_arr(col), _glob_to_re2(glob))
    return pc.if_else(pc.fill_null(m, False), pa.scalar(replacement), _arr(col))


def is_match(col, pattern: str):
    """func_is_match.go: RE2 partial match -> bool."""
    return pc.match_substring_regex(_arr(col), pattern)


# --- hash / crypto (func_md5.go, func_sha*.go, func_fnv.go, ...) -----------

def _hashlib_fn(name):
    def f(col):
        return _dict_apply(col, lambda v: hashlib.new(name, v.encode())
                           .hexdigest())
    f.__name__ = name
    return f


md5 = _hashlib_fn("md5")
sha1 = _hashlib_fn("sha1")
sha256 = _hashlib_fn("sha256")
sha512 = _hashlib_fn("sha512")


def fnv(col):
    """func_fnv.go: FNV-1a 64 -> int64 (Go casts the uint64)."""
    from ..stages.transform import fnv1a_64
    h = fnv1a_64(_arr(col)).astype(np.int64)
    out = pa.array(h, pa.int64())
    return pc.if_else(pc.is_valid(_arr(col)), out, pa.nulls(len(out), pa.int64()))


def hex_encode(col):
    """func_hex.go: bytes/string -> lowercase hex."""
    return _dict_apply(col, lambda v: v.encode().hex())


def uuid_v4(n):
    """func_uuid.go — nondeterministic by design; provide seeded variant for
    reproducible pipelines. Accepts a row count OR (like every other
    registry converter) a column to derive the count from."""
    if isinstance(n, (pa.Array, pa.ChunkedArray)):
        n = len(n)
    return pa.array([str(_uuid.uuid4()) for _ in range(int(n))],
                    pa.string())


def deterministic_uuid(col):
    """Seeded uuid5 from value (our reproducibility-friendly variant)."""
    return _dict_apply(col, lambda v: str(_uuid.uuid5(_uuid.NAMESPACE_OID, v)))


# --- base64 / decode (func_base64decode.go, func_decode.go) ----------------

def base64_decode(col, encoding: str = "base64"):
    """func_base64decode.go / func_decode.go: Decode(target[, encoding]).
    Supported encodings: base64 (default), base64-raw, base64-url, hex,
    us-ascii/utf-8 passthrough decode."""
    import base64

    def dec(v: str) -> str:
        e = encoding.lower().replace("_", "-")
        if e in ("base64", "base64-std"):
            return base64.b64decode(v).decode("utf-8", "replace")
        if e == "base64-raw":
            return base64.b64decode(v + "=" * (-len(v) % 4)) \
                .decode("utf-8", "replace")
        if e in ("base64-url", "base64-rawurl"):
            return base64.urlsafe_b64decode(v + "=" * (-len(v) % 4)) \
                .decode("utf-8", "replace")
        if e == "hex":
            return bytes.fromhex(v).decode("utf-8", "replace")
        if e in ("us-ascii", "utf-8", "utf8"):
            return v
        raise ValueError(f"Decode: unsupported encoding {encoding!r}")

    return _dict_apply(col, dec)


def base64_encode(col):
    import base64
    return _dict_apply(col, lambda v: base64.b64encode(v.encode()).decode())


# --- time (func_time.go, func_unix*.go, func_truncate_time.go, ...) --------

def time_parse(col, layout: str):
    """func_time.go: strptime layout -> timestamp[us] (unparseable -> null)."""
    return pc.strptime(_arr(col), format=layout, unit="us", error_is_null=True)


def format_time(col, layout: str):
    """func_formattime.go."""
    return pc.strftime(_arr(col), format=layout)


def truncate_time(col, unit: str):
    """func_truncate_time.go: floor to second/minute/hour/day."""
    return pc.floor_temporal(_arr(col), unit=unit)


_EPOCH_PER_S = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _epoch(col, target: str):
    """timestamp[any unit] -> int64 epoch in target unit (func_unix_*.go).
    Go's Unix()/UnixMilli()/UnixMicro() FLOOR for pre-epoch instants (sec
    is the floored quotient, nsec stays non-negative), so the down-convert
    is floor division, not the truncate-toward-zero of pc.divide."""
    a = _arr(col)
    unit = a.type.unit if pa.types.is_timestamp(a.type) else "us"
    i = pc.cast(a, pa.int64())
    src, dst = _EPOCH_PER_S[unit], _EPOCH_PER_S[target]
    if dst >= src:
        return pc.multiply(i, dst // src)
    q = src // dst
    # floor(i/q): truncate-toward-zero, then step negatives with a
    # remainder down by one unit
    mod = pc.subtract(i, pc.multiply(pc.divide(i, q), q))
    adj = pc.if_else(pc.less(mod, 0), pc.add(mod, q), mod)
    return pc.divide(pc.subtract(i, adj), q)


def unix_seconds(col):
    return _epoch(col, "s")


def unix_milli(col):
    return _epoch(col, "ms")


def unix_micro(col):
    return _epoch(col, "us")


def unix_nano(col):
    return _epoch(col, "ns")


def year(col):
    return pc.cast(pc.year(_arr(col)), pa.int64())


def month(col):
    return pc.cast(pc.month(_arr(col)), pa.int64())


def day(col):
    return pc.cast(pc.day(_arr(col)), pa.int64())


def weekday(col):
    """func_weekday.go: Go Sunday=0; Arrow day_of_week Monday=0."""
    return pc.cast(pc.add(pc.day_of_week(_arr(col), count_from_zero=True,
                                         week_start=7), 0), pa.int64())


def hour(col):
    return pc.cast(pc.hour(_arr(col)), pa.int64())


def minute(col):
    return pc.cast(pc.minute(_arr(col)), pa.int64())


def second(col):
    return pc.cast(pc.second(_arr(col)), pa.int64())


def duration_seconds(col):
    """func_duration.go equivalent on '1.2s'/'83ms'-style strings -> float
    seconds."""
    a = _arr(col)
    st = pc.extract_regex(a, r"^(?P<num>[0-9.]+)(?P<unit>ns|us|ms|s|m|h)$")
    num = pc.cast(pc.struct_field(st, "num"), pa.float64())
    unit = pc.struct_field(st, "unit")
    factors = pa.array(["ns", "us", "ms", "s", "m", "h"], pa.string())
    mult = pa.array([1e-9, 1e-6, 1e-3, 1.0, 60.0, 3600.0], pa.float64())
    f = pc.take(mult, pc.index_in(unit, value_set=factors))
    return pc.multiply(num, f)


# --- type conversion (func_int.go, func_double.go, func_string.go, is_*) ---

def to_int(col):
    try:
        return pc.cast(_arr(col), pa.int64())
    except pa.ArrowInvalid:
        return _dict_apply(col, _try_int, pa.int64())


def _try_int(v):
    try:
        return int(float(v))
    except (ValueError, TypeError):
        return None


def to_double(col):
    try:
        return pc.cast(_arr(col), pa.float64())
    except pa.ArrowInvalid:
        return _dict_apply(col, _try_float, pa.float64())


def _try_float(v):
    try:
        return float(v)
    except (ValueError, TypeError):
        return None


def to_string(col):
    a = _arr(col)
    if pa.types.is_binary(a.type) or pa.types.is_fixed_size_binary(a.type) \
            or pa.types.is_large_binary(a.type):
        # pcommon.Value.AsString on bytes: JSON int-array ("[1,2,3]")
        return pa.array(
            [None if v is None else
             "[" + ",".join(str(b) for b in v) + "]"
             for v in a.to_pylist()], pa.string())
    if pa.types.is_list(a.type) or pa.types.is_large_list(a.type) \
            or pa.types.is_fixed_size_list(a.type):
        import json as _json
        return pa.array(
            [None if v is None else _json.dumps(v, separators=(",", ":"))
             for v in a.to_pylist()], pa.string())
    return pc.cast(a, pa.string())


def is_string(col):
    t = _arr(col).type
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def is_int(col):
    return pa.types.is_integer(_arr(col).type)


def is_double(col):
    return pa.types.is_floating(_arr(col).type)


def is_bool(col):
    return pa.types.is_boolean(_arr(col).type)


def is_list(col):
    t = _arr(col).type
    return pa.types.is_list(t) or pa.types.is_fixed_size_list(t) or \
        pa.types.is_large_list(t)


def is_map(col):
    t = _arr(col).type
    return pa.types.is_map(t) or pa.types.is_struct(t)


# --- url / useragent (func_url.go, func_useragent.go) ----------------------

URL_RE = (r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://"
          r"(?:(?P<userinfo>[^@/]*)@)?"
          r"(?P<host>[^:/?#]*)(?::(?P<port>\d+))?"
          r"(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$")


def url_parse(col):
    """func_url.go semconv fields as a struct column (url.scheme/domain/...)."""
    return pc.extract_regex(_arr(col), URL_RE)


UA_PATTERNS = [
    ("Firefox", r"Firefox/(?P<version>[\d.]+)"),
    ("Chrome", r"Chrome/(?P<version>[\d.]+)"),
    ("Safari", r"Version/(?P<version>[\d.]+).*Safari"),
    ("curl", r"curl/(?P<version>[\d.]+)"),
]


def useragent_parse(col):
    """func_useragent.go (ua-parser lite): browser name + version columns."""
    a = _arr(col)
    name = pa.nulls(len(a), pa.string())
    version = pa.nulls(len(a), pa.string())
    for nm, rx in reversed(UA_PATTERNS):
        st = pc.extract_regex(a, rx)
        hit = st.is_valid()
        name = pc.if_else(hit, pa.scalar(nm), name)
        version = pc.if_else(hit, pc.struct_field(st, "version"), version)
    st = pa.StructArray.from_arrays(
        [pc.fill_null(name, "Other"), version], ["name", "version"])
    # null UA in -> null struct out (not a concrete 'Other' classification)
    valid = pc.is_valid(a)
    if pc.all(valid).as_py():
        return st
    return pc.if_else(valid, st, pa.nulls(len(a), st.type))


# --- registry (the function-factory map, ottlfuncs/functions.go) -----------

REGISTRY = {
    "ConvertCase": convert_case, "ToUpperCase": to_upper_case,
    "ToLowerCase": to_lower_case, "ToSnakeCase": to_snake_case,
    "ToCamelCase": to_camel_case, "Trim": trim, "Split": split,
    "Substring": substring, "Concat": concat, "Format": format_str,
    "Len": str_len, "TruncateAll": truncate_all,
    "ReplacePattern": replace_pattern, "ReplaceMatch": replace_match,
    "IsMatch": is_match,
    "MD5": md5, "SHA1": sha1, "SHA256": sha256, "SHA512": sha512,
    "FNV": fnv, "Hex": hex_encode, "UUID": uuid_v4,
    "Base64Decode": base64_decode, "Decode": base64_decode,
    "Time": time_parse, "FormatTime": format_time,
    "TruncateTime": truncate_time, "UnixSeconds": unix_seconds,
    "UnixMilli": unix_milli, "UnixMicro": unix_micro, "UnixNano": unix_nano,
    "Year": year, "Month": month, "Day": day, "Weekday": weekday,
    "Hour": hour, "Minute": minute, "Second": second,
    "Duration": duration_seconds,
    "Int": to_int, "Double": to_double, "String": to_string,
    "IsString": is_string, "IsInt": is_int, "IsDouble": is_double,
    "IsBool": is_bool, "IsList": is_list, "IsMap": is_map,
    "URL": url_parse, "UserAgent": useragent_parse,
}


def register(name: str, fn) -> None:
    """User-extension surface (mirrors operator.Register /
    ottl function factories)."""
    REGISTRY[name] = fn


# --- list ops (func_append.go, func_sort.go) -------------------------------

def list_append(col, value):
    """func_append.go: append a scalar (or per-row values) to a list column."""
    from .maps import list_parts
    a = _arr(col)
    offsets, vals, _valid = list_parts(a)   # slice-normalized
    n = len(a)
    if isinstance(value, (pa.Array, pa.ChunkedArray)):
        value = _arr(value)
    else:
        value = pa.array([value] * n, vals.type)
    # vectorized interleave (concatenated-aranges trick, no per-row loop)
    old_counts = (offsets[1:] - offsets[:-1]).astype(np.int64)
    new_counts = old_counts + 1
    new_offsets = np.concatenate([[0], np.cumsum(new_counts)])
    total = int(new_offsets[-1])
    within = np.arange(total, dtype=np.int64) - np.repeat(
        new_offsets[:-1], new_counts)
    is_new = within == np.repeat(old_counts, new_counts)
    pos = np.where(is_new, 0,
                   np.repeat(offsets[:-1].astype(np.int64), new_counts)
                   + within)
    row_take = np.searchsorted(new_offsets[1:], np.arange(total),
                               side="right")
    if len(vals) == 0:  # all lists empty/null: every entry is the appended one
        out_vals = pc.take(value, pa.array(row_take, pa.int64()))
    else:
        out_vals = pc.if_else(pa.array(is_new),
                              pc.take(value, pa.array(row_take, pa.int64())),
                              pc.take(vals, pa.array(np.where(is_new, 0, pos),
                                                     pa.int64())))
    return pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()),
                                    out_vals)


def list_sort(col, order: str = "asc"):
    """func_sort.go: sort each list's elements."""
    a = _arr(col)
    lists = a.to_pylist()
    out = [None if v is None else sorted(v, reverse=(order == "desc"))
           for v in lists]
    return pa.array(out, a.type)


# --- XML (func_parse_xml.go, func_parse_simplified_xml.go) -----------------

_XML_ELEM = re.compile(r"<(?P<tag>[A-Za-z_][\w.-]*)(?:\s[^>]*)?>"
                       r"(?P<body>[^<]*)</(?P=tag)>")


def parse_simplified_xml(col):
    """func_parse_simplified_xml.go: XML -> simplified map (attributes and
    declarations dropped). An element with element children becomes a
    nested map, a leaf keeps its character data; nested maps are
    JSON-encoded in the flat model (DIVERGENCES.md). Unparseable rows
    yield an empty map (on_error-friendly)."""
    import json as _json
    a = _arr(col)

    def conv(el):
        kids = list(el)
        if not kids:
            return (el.text or "").strip()
        return {c.tag: conv(c) for c in kids}

    out = []
    for v in a.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            root = _et_parse(f"<__root__>{v}</__root__>")
            out.append([
                (c.tag, cv if isinstance(cv := conv(c), str)
                 else _json.dumps(cv, separators=(",", ":")))
                for c in root])
        except Exception:  # noqa: BLE001 — malformed XML -> empty map
            out.append([])
    return pa.array(out, pa.map_(pa.string(), pa.string()))


def get_xml(col, tag: str):
    """func_get_xml.go (element-text subset): first <tag>...</tag> body.
    The tag is regex-escaped — XML names legally contain '.' and '-',
    which must match literally, not as metacharacters."""
    t = re.escape(tag)
    st = pc.extract_regex(_arr(col),
                          rf"<{t}(?:\s[^>]*)?>(?P<body>[^<]*)</{t}>")
    return pc.struct_field(st, "body")


# wire the map/list/parse editors into the registry (the remaining names
# from the 92-function inventory that operate on map/list columns live in
# functions/maps.py; parse_* stages live in stages/parse.py)
def _late_registry():
    from ..stages.parse import csv_parser, json_parser, keyvalue_parser
    from . import maps as _m
    REGISTRY.update({
        "Append": list_append, "SortList": list_sort,
        "ParseSimplifiedXML": parse_simplified_xml, "GetXML": get_xml,
        "KeepKeys": _m.keep_keys, "DeleteKey": _m.delete_key,
        "DeleteMatchingKeys": _m.delete_matching_keys,
        "KeepMatchingKeys": _m.keep_matching_keys, "Limit": _m.limit_map,
        "MergeMaps": _m.merge_maps, "Flatten": _m.flatten_struct,
        "ToKeyValueString": _m.to_key_value_string,
        "SliceToMap": _m.slice_to_map,
        "ParseJSON": json_parser, "ParseCSV": csv_parser,
        "ParseKeyValue": keyvalue_parser,
    })


_late_registry()


def log_fn(col):
    """func_log.go: natural log of a numeric value (<=0 -> null, the
    error-per-row becomes null in columnar form)."""
    a = pc.cast(_arr(col), pa.float64())
    safe = pc.if_else(pc.greater(a, 0.0), a, pa.nulls(len(a), pa.float64()))
    return pc.ln(safe)


REGISTRY["Log"] = log_fn


# ---------------------------------------------------------------------------
# OTTL tail: murmur3, ExtractPatterns, Now/Unix, duration components,
# full XML family, typed Hex, TraceID/SpanID (round-2 coverage —
# func_murmur3_hash.go, func_extract_patterns.go, func_now.go, func_unix.go,
# func_hours.go..func_nanoseconds.go, func_parse_xml.go, func_insert_xml.go,
# func_remove_xml.go, func_convert_*_xml.go, func_trace_id.go)
# ---------------------------------------------------------------------------

def murmur3_hash(col):
    """func_murmur3_hash.go: Sum32 -> little-endian hex."""
    from . import murmur3 as _m3
    return _dict_apply(
        col, lambda v: _m3.sum32(v.encode()).to_bytes(4, "little").hex())


def murmur3_hash128(col):
    """func_murmur3_hash128.go: x64 Sum128 -> h1||h2 little-endian hex."""
    from . import murmur3 as _m3

    def one(v: str) -> str:
        h1, h2 = _m3.sum128(v.encode())
        return h1.to_bytes(8, "little").hex() + h2.to_bytes(8, "little").hex()
    return _dict_apply(col, one)


def extract_patterns(col, pattern: str, names: dict[str, str] | None = None):
    """func_extract_patterns.go: named captures -> map<string,string>
    (unmatched rows -> null map). ``names`` renames capture groups to
    display keys (grok ECS nested names like url.port)."""
    st = pc.extract_regex(_arr(col), pattern)
    rename = names or {}
    groups = [st.type.field(i).name for i in range(st.type.num_fields)]
    names = [rename.get(g, g) for g in groups]
    n = len(st)
    valid_np = np.asarray(st.is_valid())
    cols_py = [pc.struct_field(st, g).to_pylist() for g in groups]
    keys_flat, items_flat = [], []
    # offsets[i] = row start (None marks a null row); offsets[n] = total
    offsets: list[int | None] = []
    total = 0
    for i in range(n):
        offsets.append(total if valid_np[i] else None)
        if valid_np[i]:
            for nm, colv in zip(names, cols_py):
                # '' = non-participating optional group (Arrow has no
                # absent marker): the reference omits unmatched captures
                # from the map (matched-empty is indistinguishable — the
                # documented flat-model trade)
                if colv[i] is not None and colv[i] != "":
                    keys_flat.append(nm)
                    items_flat.append(colv[i])
                    total += 1
    offsets.append(total)
    return pa.MapArray.from_arrays(pa.array(offsets, pa.int32()),
                                   pa.array(keys_flat, pa.string()),
                                   pa.array(items_flat, pa.string()))


def now():
    """func_now.go — wall clock, nondeterministic by design."""
    import datetime as _dt
    return _dt.datetime.now()


def unix(seconds, nanoseconds=0):
    """func_unix.go: epoch seconds(+ns) -> timestamp."""
    import datetime as _dt
    if isinstance(seconds, (pa.Array, pa.ChunkedArray)):
        us = pc.add(pc.multiply(pc.cast(_arr(seconds), pa.int64()),
                                1_000_000), int(nanoseconds) // 1000)
        return pc.cast(us, pa.timestamp("us"))
    return _dt.datetime.fromtimestamp(seconds + nanoseconds / 1e9,
                                      tz=_dt.timezone.utc).replace(tzinfo=None)


_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")
_DUR_FACTOR = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3,
               "s": 1.0, "m": 60.0, "h": 3600.0}


def duration(s):
    """func_duration.go: Go ParseDuration subset ('90m', '1h30m', '1.5s')
    -> float seconds. Array input -> float64 array."""
    if isinstance(s, (pa.Array, pa.ChunkedArray)):
        return _dict_apply(s, _duration_scalar, pa.float64())
    return _duration_scalar(s)


def _duration_scalar(s: str) -> float:
    # Go ParseDuration: a single optional leading sign only — interior
    # signs ('1h-30m') are rejected.
    body = s[1:] if s[:1] in "+-" else s
    if body == "0":  # Go ParseDuration special-cases unitless zero
        return 0.0
    total, matched = 0.0, 0
    for m in _DUR_RE.finditer(body):
        total += float(m.group(1)) * _DUR_FACTOR[m.group(2)]
        matched += len(m.group(0))
    if matched != len(body) or not body:
        raise ValueError(f"invalid duration {s!r}")
    return -total if s.startswith("-") else total


def _dur_component(factor: float, as_int: bool):
    """Go time.Duration components: Hours/Minutes/Seconds -> float64;
    Milliseconds/Microseconds/Nanoseconds -> int64 (func_hours.go etc.).
    The int components TRUNCATE toward zero like Go's integer division
    (Duration("1.5ms").Milliseconds() == 1), never round."""
    fns = int(round(factor * 1e9))  # component size in integer nanoseconds

    def f(x):
        if isinstance(x, (pa.Array, pa.ChunkedArray)):
            xs = pc.cast(_arr(x), pa.float64())
            if not as_int:
                return pc.divide(xs, factor)
            # Go stores Durations as int64 ns and integer-divides, which
            # truncates toward zero; mirror that exactly (float trunc after
            # division is off-by-one-prone: 0.002/0.001 can be 1.999...).
            ns = pc.cast(pc.round(pc.multiply(xs, 1e9)), pa.int64())
            return pc.divide(ns, fns)
        if not as_int:
            return x / factor
        ns = int(round(x * 1e9))
        q = abs(ns) // fns
        return -q if ns < 0 else q
    return f


dur_hours = _dur_component(3600.0, False)
dur_minutes = _dur_component(60.0, False)
dur_seconds = _dur_component(1.0, False)
dur_milliseconds = _dur_component(1e-3, True)
dur_microseconds = _dur_component(1e-6, True)
dur_nanoseconds = _dur_component(1e-9, True)


def nanosecond(col):
    """func_nanosecond.go: t.Nanosecond() — ns within the second
    (null in -> null out; the numpy round-trip would NaN-crash). A ns-unit
    column keeps its sub-us precision; bare ints are taken as us."""
    a = _arr(col)
    if pa.types.is_timestamp(a.type):
        ns = pc.fill_null(pc.cast(pc.cast(a, pa.timestamp("ns")),
                                  pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        out = pa.array(ns % 1_000_000_000, pa.int64())
    else:
        us = pc.fill_null(pc.cast(a, pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        out = pa.array((us % 1_000_000) * 1000, pa.int64())
    return pc.if_else(pc.is_valid(a), out, pa.nulls(len(a), pa.int64()))


def millisecond(col):
    return pc.cast(pc.millisecond(_arr(col)), pa.int64())


def microsecond(col):
    a = _arr(col)
    if pa.types.is_timestamp(a.type):
        a2 = pc.cast(a, pa.timestamp("us"), safe=False)
    else:
        a2 = a
    us = pc.fill_null(pc.cast(a2, pa.int64()), 0) \
        .to_numpy(zero_copy_only=False)
    out = pa.array(us % 1_000_000, pa.int64())
    return pc.if_else(pc.is_valid(a), out, pa.nulls(len(a), pa.int64()))


def hex_typed(col):
    """func_hex.go across input types: int64 -> 8-byte BE hex; float64 ->
    IEEE-754 BE hex; bool -> 01/00; string/bytes -> content hex."""
    import struct as _struct
    a = _arr(col)
    t = a.type
    if pa.types.is_integer(t):
        # int(v) directly — routing through float would lose precision
        # past 2^53 (Hex on large ids must be exact, func_hex.go)
        return _dict_apply(a, lambda v: "%016x" % (int(v) & (2**64 - 1)),
                           pa.string())
    if pa.types.is_floating(t):
        return _dict_apply(a, lambda v: _struct.pack(">d", float(v)).hex(),
                           pa.string())
    if pa.types.is_boolean(t):
        return pc.if_else(a, pa.scalar("01"), pa.scalar("00"))
    if pa.types.is_binary(t) or pa.types.is_fixed_size_binary(t):
        return pa.array([None if v is None else v.hex()
                         for v in a.to_pylist()], pa.string())
    return _dict_apply(a, lambda v: v.encode().hex())


# --- XML family (ElementTree per DISTINCT value — control-plane cost) ------

def _et_parse(v: str):
    import xml.etree.ElementTree as ET
    return ET.fromstring(v)


def _et_tostring(el) -> str:
    import xml.etree.ElementTree as ET
    return ET.tostring(el, encoding="unicode", short_empty_elements=False)


def _xpath_find(root, path: str):
    """Reference xpath subset: '/Root/child', '/Root//any', '//any'.
    Returns [(parent, element)] under an already-parsed root."""
    if path.startswith("//"):
        return [(None, e) for e in root.iter() if e.tag == path[2:]]
    head = "/" + root.tag
    if path == head:
        return [(None, root)]
    if path.startswith(head + "/"):
        rest = path[len(head):]          # '/Message', '//b', '/c/b'
        sub = "." + rest if rest.startswith("//") else rest[1:]
        return [(None, e) for e in root.findall(sub)]
    return []


def parse_xml(col):
    """func_parse_xml.go: full XML -> the reference's nested map shape
    {tag, attributes?, content?, children?} — emitted as a JSON string
    (dynamic nesting; documented divergence DIVERGENCES.md)."""
    import json as _json

    def conv(el) -> dict:
        out: dict = {"tag": el.tag}
        if el.attrib:
            out["attributes"] = dict(el.attrib)
        if el.text and el.text.strip():
            out["content"] = el.text.strip()
        kids = [conv(c) for c in el]
        if kids:
            out["children"] = kids
        return out

    return _dict_apply(col, lambda v: _json.dumps(conv(_et_parse(v)),
                                                  separators=(",", ":")))


def insert_xml(col, xpath: str, sub_document: str):
    """func_insert_xml.go: append sub_document under each xpath match."""
    def one(v: str) -> str:
        root = _et_parse(v)
        sub = _et_parse(sub_document)
        for _, el in _xpath_find(root, xpath):
            el.append(sub)
        return _et_tostring(root)
    return _dict_apply(col, one)


def remove_xml(col, xpath: str):
    """func_remove_xml.go: drop elements matching xpath."""
    def one(v: str) -> str:
        root = _et_parse(v)
        parts = xpath.strip("/").split("/")
        if parts and parts[0] == root.tag and len(parts) > 1:
            sub = "/".join(parts[1:]).replace("//", ".//")
            victims = set(map(id, root.findall(sub)))
            for parent in root.iter():
                for child in list(parent):
                    if id(child) in victims:
                        parent.remove(child)
        return _et_tostring(root)
    return _dict_apply(col, one)


def get_xml_xpath(col, xpath: str):
    """func_get_xml.go: concatenated serialization of all xpath matches."""
    def one(v: str) -> str:
        root = _et_parse(v)
        return "".join(_et_tostring(e) for _, e in _xpath_find(root, xpath))
    return _dict_apply(col, one)


def convert_attributes_to_elements_xml(col, xpath: str | None = None):
    """func_convert_attributes_to_elements_xml.go: each attribute becomes a
    child element (sorted by name, appended after existing children)."""
    def fix(el):
        for c in el:
            fix(c)
        for k in sorted(el.attrib):
            import xml.etree.ElementTree as ET
            child = ET.SubElement(el, k)
            child.text = el.attrib[k]
        el.attrib.clear()

    def one(v: str) -> str:
        root = _et_parse(v)
        fix(root)
        return _et_tostring(root)
    return _dict_apply(col, one)


def convert_text_to_elements_xml(col, xpath: str = "/",
                                 elements_name: str = "value"):
    """func_convert_text_to_elements_xml.go: stray text content becomes a
    <elements_name> child (scoped to xpath matches; default everywhere)."""
    import xml.etree.ElementTree as ET

    def fix(el):
        for c in el:
            fix(c)
        texts = []
        if el.text and el.text.strip():
            texts.append(el.text.strip())
            el.text = None
        for c in el:
            if c.tail and c.tail.strip():
                texts.append(c.tail.strip())
                c.tail = None
        for t in texts:
            child = ET.SubElement(el, elements_name)
            child.text = t

    def one(v: str) -> str:
        # multi-root payloads allowed (reference wraps internally)
        wrapped = _et_parse(f"<__r__>{v}</__r__>")
        targets = list(wrapped) if xpath == "/" else \
            [el for child in wrapped
             for _, el in _xpath_find(child, xpath)]
        for el in targets:
            fix(el)
        return "".join(_et_tostring(c) for c in wrapped)
    return _dict_apply(col, one)


def trace_id_bytes(v: bytes) -> bytes:
    """func_trace_id.go: 16-byte trace id constructor."""
    b = v.rjust(16, b"\x00") if len(v) < 16 else v
    if len(b) != 16:
        raise ValueError("TraceID needs 16 bytes")
    return b


def span_id_bytes(v: bytes) -> bytes:
    """func_span_id.go: 8-byte span id constructor."""
    b = v.rjust(8, b"\x00") if len(v) < 8 else v
    if len(b) != 8:
        raise ValueError("SpanID needs 8 bytes")
    return b


REGISTRY.update({
    "Murmur3Hash": murmur3_hash, "Murmur3Hash128": murmur3_hash128,
    "ExtractPatterns": extract_patterns,
    "Now": now, "Unix": unix, "Duration": duration,
    "Hours": dur_hours, "Minutes": dur_minutes, "Seconds": dur_seconds,
    "Milliseconds": dur_milliseconds, "Microseconds": dur_microseconds,
    "Nanoseconds": dur_nanoseconds,
    "Nanosecond": nanosecond, "Millisecond": millisecond,
    "Microsecond": microsecond,
    "ParseXML": parse_xml, "InsertXML": insert_xml, "RemoveXML": remove_xml,
    "ConvertAttributesToElementsXML": convert_attributes_to_elements_xml,
    "ConvertTextToElementsXML": convert_text_to_elements_xml,
    "Sort": list_sort,
    "TraceID": trace_id_bytes, "SpanID": span_id_bytes,
    "Base64Encode": base64_encode,
    "DeterministicUUID": deterministic_uuid,
})
# Duration was previously bound to the array-only variant; Hex gains the
# typed dispatch; GetXML gains the xpath form under its reference name.
def _extract_grok_registry(col, pattern: str, named_only: bool = False,
                           definitions: list | None = None):
    """ExtractGrokPatterns as a registry converter: captures -> map.
    Defaults mirror the Go optionals (func_extract_grok_patterns.go:38):
    NamedCapturesOnly false (un-aliased %{NAME} references capture under
    the pattern name), PatternDefinitions as 'NAME=pattern' strings."""
    from .grok import GrokCompiler, parse_pattern_definitions
    extra = parse_pattern_definitions([str(d) for d in definitions]) \
        if definitions else None
    regex, _types, names = GrokCompiler(extra).compile(
        pattern, named_captures_only=bool(named_only))
    return extract_patterns(col, regex, names=names)


REGISTRY["ExtractGrokPatterns"] = _extract_grok_registry
REGISTRY["Hex"] = hex_typed
REGISTRY["GetXML"] = get_xml_xpath
