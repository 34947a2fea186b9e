"""Per-record transformers: the stanza transformer family + attributesprocessor
action list, re-expressed as vectorized column ops over Arrow batches.

Reference semantics (studied, not ported):
  - stanza add/remove/move/copy/retain/unquote/regex_replace/filter/noop:
    pkg/stanza/operator/transformer/*/config.go (SURVEY.md §2.4); all gate on
    an `if` expr and route errors per on_error (helper/transformer.go:23-70).
  - attributesprocessor action list insert/update/upsert/delete/hash/extract/
    convert: internal/coreinternal/attraction/attraction.go:113-139,287-342,
    404-441.
  - filter transformer drop_ratio (sampled dropping):
    pkg/stanza/operator/transformer/filter/config.go:44-45.
  - probabilisticsamplerprocessor: FNV-like hash of a key attribute vs
    threshold (logsprocessor.go:122-141, sampler_mode.go).
  - redactionprocessor allowed_keys/blocked_values/hash:
    processor/redactionprocessor/processor.go:90-96,193-295.

Every transformer is ``fn(config) -> (batch: pa.Table) -> pa.Table`` usable in
``ds.map_batches(fn, batch_format='pyarrow', batch_size=None)``; the `if`
gate appears as an optional ``where`` Expr whose False/null rows pass through
unchanged (masked rewrite via pc.if_else), matching helper/transformer.go.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..expr import Expr
from ..functions.gostr import go_unquote


def _get(batch: pa.Table, name: str) -> pa.Array:
    c = batch[name]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _set(batch: pa.Table, name: str, arr) -> pa.Table:
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)


def _masked(batch: pa.Table, name: str, new, where: Expr | None) -> pa.Table:
    """Write ``new`` into column ``name``, only where the gate holds
    (stanza `if` expr, helper/transformer.go:40-52)."""
    if where is None:
        return _set(batch, name, new)
    m = where.mask(batch)
    old = _get(batch, name) if name in batch.column_names else \
        pa.nulls(batch.num_rows, new.type if hasattr(new, "type") else pa.string())
    return _set(batch, name, pc.if_else(m, new, old))


# --- stanza transformers ---------------------------------------------------

def add(field: str, value=None, expr: Expr | None = None,
        where: Expr | None = None):
    """add transformer (transformer/add/config.go:37-39): static value or
    expression result into a (possibly new) column."""
    def fn(batch: pa.Table) -> pa.Table:
        if expr is not None:
            out = expr.evaluate(batch)
            if isinstance(out, pa.ChunkedArray):
                out = out.combine_chunks()
        else:
            out = pa.nulls(batch.num_rows, pa.string()) if value is None else \
                pa.array([value] * batch.num_rows)
        return _masked(batch, field, out, where)
    return fn


def remove(fields: list[str]):
    """remove transformer (transformer/remove/config.go:36-38)."""
    def fn(batch: pa.Table) -> pa.Table:
        return batch.drop_columns([f for f in fields if f in batch.column_names])
    return fn


def move(src: str, dest: str, where: Expr | None = None):
    """move transformer (transformer/move/config.go:36-38): rename/relocate.
    Ungated: the src column is dropped. Row-gated: the column must stay
    (other rows still own it), but the MOVED rows' src values are nulled —
    without this a gated move silently degrades to a gated copy."""
    def fn(batch: pa.Table) -> pa.Table:
        src_vals = _get(batch, src)
        if where is None:
            return _set(batch, dest, src_vals).drop_columns([src])
        mask = pc.fill_null(where.mask(batch), False)
        out = _masked(batch, dest, src_vals, where)
        cleared = pc.if_else(mask, pa.nulls(len(src_vals), src_vals.type),
                             src_vals)
        return _set(out, src, cleared)
    return fn


def copy(src: str, dest: str, where: Expr | None = None):
    """copy transformer (transformer/copy/config.go:36-38)."""
    def fn(batch: pa.Table) -> pa.Table:
        return _masked(batch, dest, _get(batch, src), where)
    return fn


def retain(fields: list[str]):
    """retain transformer (transformer/retain/config.go:37-38): keep only
    the listed columns (= ds.select_columns, provided for chain symmetry)."""
    def fn(batch: pa.Table) -> pa.Table:
        return batch.select([f for f in fields if f in batch.column_names])
    return fn


# full strconv.Unquote decoder lives in functions/gostr.py (shared with
# the OTTL string-literal lexer); alias kept for existing callers/tests
_go_unquote = go_unquote


def unquote(field: str, where: Expr | None = None):
    """unquote transformer (transformer/unquote/transformer.go:39 ->
    strconv.Unquote): full Go unquoting — escape decoding in "...",
    raw backquoted strings, single-character '.' literals. ErrSyntax
    rows (not quoted, bad escape, multi-char single quotes) keep their
    value, the on_error=send behavior pinned by transformer_test.go.
    Plain `"..."` without escapes/newlines stays one vectorized regex;
    only rows with quote/escape syntax hit the per-DISTINCT fallback."""
    def fn(batch: pa.Table) -> pa.Table:
        col = _get(batch, field)
        filled = pc.fill_null(col, "")
        plain = pc.match_substring_regex(filled, r'^"[^"\\\n]*"$')
        other = pc.and_(pc.match_substring_regex(filled, r"^[\"'`]"),
                        pc.invert(plain))
        out = pc.replace_substring_regex(col, r'^"([^"\\\n]*)"$', r"\1")
        if pc.any(other).as_py():
            d = pc.dictionary_encode(pc.if_else(
                other, filled, pa.nulls(len(filled), pa.string())))
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            uniq = [None if v is None else _go_unquote(v)
                    for v in d.dictionary.to_pylist()]
            dec = pc.take(pa.array(uniq, pa.string()), d.indices)
            out = pc.if_else(pc.and_(other, pc.is_valid(dec)), dec, out)
        return _masked(batch, field, out, where)
    return fn


def regex_replace(field: str, pattern: str, replacement: str,
                  where: Expr | None = None):
    """regex_replace transformer (transformer/regexreplace/config.go:40-44).
    ``replacement`` uses RE2 rewrite syntax (\\1 group refs)."""
    def fn(batch: pa.Table) -> pa.Table:
        col = _get(batch, field)
        out = pc.replace_substring_regex(col, pattern, replacement)
        return _masked(batch, field, out, where)
    return fn


def filter_drop(expr: Expr, drop_ratio: float = 1.0, seed_col: str | None = None):
    """filter transformer (transformer/filter/config.go:44-45): DROP rows
    matching ``expr``; with drop_ratio<1 only that fraction of matches drops.
    The reference uses math/rand; we make it deterministic by hashing
    ``seed_col`` (required when drop_ratio<1) so reruns are reproducible."""
    def fn(batch: pa.Table) -> pa.Table:
        m = expr.mask(batch)
        if drop_ratio >= 1.0:
            return batch.filter(pc.invert(m))
        if seed_col is None:
            raise ValueError("drop_ratio<1 requires seed_col for determinism")
        frac = hash_unit_interval(_get(batch, seed_col))
        sampled = pc.and_(m, pa.array(frac < drop_ratio))
        return batch.filter(pc.invert(sampled))
    return fn


def noop():
    """noop transformer (transformer/noop/config.go:33)."""
    return lambda batch: batch


# --- attributesprocessor actions ------------------------------------------

def attr_insert(field: str, value, where: Expr | None = None):
    """attraction INSERT: set only if the column is missing/null
    (attraction.go:113-123)."""
    def fn(batch: pa.Table) -> pa.Table:
        if field not in batch.column_names:
            return _masked(batch, field, pa.array([value] * batch.num_rows), where)
        col = _get(batch, field)
        if col.null_count == 0:
            return batch  # every row already has the key: pure no-op
        try:
            out = pc.fill_null(col, value)
        except (pa.ArrowTypeError, pa.ArrowInvalid):
            # heterogeneous pcommon maps become typed columns here; a
            # fill value of another type lands as its string form
            out = pc.fill_null(pc.cast(col, pa.string()), str(value))
        return _masked(batch, field, out, where)
    return fn


def attr_update(field: str, value=None, from_attribute: str | None = None,
                where: Expr | None = None):
    """attraction UPDATE: per-row, set only where the target EXISTS
    (attraction.go); with ``from_attribute`` also only where the source
    exists (a missing source leaves the target row unchanged)."""
    def fn(batch: pa.Table) -> pa.Table:
        if field not in batch.column_names:
            return batch
        col = _get(batch, field)
        if from_attribute:
            if from_attribute not in batch.column_names:
                return batch
            src = _get(batch, from_attribute)
            gate = pc.and_(pc.is_valid(col), pc.is_valid(src))
            out = pc.if_else(gate, pc.cast(src, col.type), col)
        else:
            out = pc.if_else(pc.is_valid(col), pa.scalar(value), col)
        return _masked(batch, field, out, where)
    return fn


def attr_upsert(field: str, value=None, from_attribute: str | None = None,
                where: Expr | None = None):
    """attraction UPSERT: unconditional set, from literal or another column.
    A ``from_attribute`` column absent from the batch schema means no
    record carries it — the reference upsert is then a no-op, not an
    error (same guard as attr_update/attr_hash); per ROW, a null source
    leaves the target unchanged (attraction.go: FromAttribute upsert
    does nothing when the source attribute is missing)."""
    def fn(batch: pa.Table) -> pa.Table:
        if from_attribute:
            if from_attribute not in batch.column_names:
                return batch
            src = _get(batch, from_attribute)
            old = _get(batch, field) if field in batch.column_names \
                else pa.nulls(batch.num_rows, src.type)
            out = pc.if_else(pc.is_valid(src), src,
                             pc.cast(old, src.type))
        else:
            out = pa.array([value] * batch.num_rows)
        return _masked(batch, field, out, where)
    return fn


def attr_delete(key: str | None = None, pattern: str | None = None):
    """attraction DELETE (attraction.go): remove the named attribute
    and/or every attribute whose NAME matches the regex — both may be
    configured on one action (Key + RegexPattern)."""
    import re as _re
    rx = _re.compile(pattern) if pattern else None

    def fn(batch: pa.Table) -> pa.Table:
        drop = [c for c in batch.column_names
                if c == key or (rx is not None and rx.search(c))]
        return batch.drop_columns(drop)
    return fn


def attr_hash(fields: list[str], algorithm: str = "sha256",
              where: Expr | None = None):
    """attraction HASH (attraction.go:404-424, hasher.go) / redaction
    hash_function: replace values with their hex digest. The reference
    hashes TYPED byte encodings (string = utf-8 bytes, int = 8-byte
    little-endian, double = float64 bits little-endian, bool = one byte
    1/0), not string forms. Vectorized over the dictionary of distinct
    values (hashing cost = O(cardinality), not O(rows))."""
    import struct

    def enc(v) -> bytes:
        if isinstance(v, bool):
            return b"\x01" if v else b"\x00"
        if isinstance(v, int):
            return struct.pack("<q", v)
        if isinstance(v, float):
            return struct.pack("<d", v)
        if isinstance(v, bytes):
            return v
        return str(v).encode()

    def one(col: pa.Array) -> pa.Array:
        d = pc.dictionary_encode(col) \
            if not pa.types.is_dictionary(col.type) else col
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        uniq = d.dictionary.to_pylist()
        digests = pa.array(
            [None if v is None else
             hashlib.new(algorithm, enc(v)).hexdigest() for v in uniq],
            pa.string())
        return pc.take(digests, d.indices)

    def fn(batch: pa.Table) -> pa.Table:
        for f in fields:
            if f in batch.column_names:
                batch = _masked(batch, f, one(_get(batch, f)), where)
        return batch
    return fn


def attr_extract(field: str, pattern: str, where: Expr | None = None):
    """attraction EXTRACT (attraction.go:287-342): regex named groups ->
    new columns (the processor's regexp-with-named-submatches). A missing
    source column is a no-op, and rows the pattern does NOT match keep
    their existing capture-column values (the reference only touches
    attributes on a match)."""
    def fn(batch: pa.Table) -> pa.Table:
        if field not in batch.column_names:
            return batch
        col = _get(batch, field)
        st = pc.extract_regex(pc.cast(col, pa.string()), pattern)
        for i in range(st.type.num_fields):
            name = st.type.field(i).name
            new = pc.struct_field(st, name)
            if name in batch.column_names:
                old = pc.cast(_get(batch, name), pa.string())
                new = pc.if_else(st.is_valid(), new, old)
            batch = _masked(batch, name, new, where)
        return batch
    return fn


def attr_convert(field: str, to: str, where: Expr | None = None):
    """attraction CONVERT (attraction.go:425-441): int/double/string cast.
    Unconvertible values -> null (the reference leaves them unchanged for
    string-to-int failures; we document null as the columnar divergence)."""
    typ = {"int": pa.int64(), "double": pa.float64(), "string": pa.string()}[to]

    def fn(batch: pa.Table) -> pa.Table:
        col = _get(batch, field)
        try:
            out = pc.cast(col, typ)
        except pa.ArrowInvalid:
            # per-value safe cast: strings that fail parse become null
            out = pa.array(
                _safe_cast_pylist(col.to_pylist(), to), typ)
        return _masked(batch, field, out, where)
    return fn


def _safe_cast_pylist(vals, to):
    out = []
    for v in vals:
        try:
            out.append(None if v is None else
                       int(v) if to == "int" else
                       float(v) if to == "double" else str(v))
        except (ValueError, TypeError):
            out.append(None)
    return out


# --- probabilistic sampler -------------------------------------------------

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv1a_64(col: pa.Array) -> np.ndarray:
    """Vectorized FNV-1a 64 over a string column: loop over byte POSITIONS
    (bounded by max string length), never over rows — the hash family the
    probabilistic sampler uses (sampler_mode.go)."""
    s = pc.cast(col, pa.large_binary())
    flat = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    buf = np.frombuffer(flat.buffers()[2], np.uint8) if flat.buffers()[2] else \
        np.empty(0, np.uint8)
    offs = np.frombuffer(flat.buffers()[1], np.int64)[flat.offset:
                                                      flat.offset + len(flat) + 1]
    starts, ends = offs[:-1].copy(), offs[1:].copy()
    h = np.full(len(flat), _FNV_OFFSET, np.uint64)
    pos = starts.copy()
    active = pos < ends
    with np.errstate(over="ignore"):
        while active.any():
            idx = np.nonzero(active)[0]
            h[idx] = (h[idx] ^ buf[pos[idx]]) * _FNV_PRIME
            pos[idx] += 1
            active[idx] = pos[idx] < ends[idx]
    null_mask = pc.is_null(flat).to_numpy(zero_copy_only=False)
    h[null_mask] = 0
    return h


def hash_unit_interval(col: pa.Array) -> np.ndarray:
    """Map values to [0,1) deterministically via FNV-1a (null -> 0.0)."""
    return (fnv1a_64(col) >> np.uint64(11)) / float(1 << 53)


def probabilistic_sampler(percent: float, key_col: str):
    """probabilisticsamplerprocessor for logs (logsprocessor.go:122-141):
    keep a row iff hash(key) falls under the threshold — deterministic,
    embarrassingly parallel, consistent across reruns and nodes."""
    threshold = percent / 100.0

    def fn(batch: pa.Table) -> pa.Table:
        frac = hash_unit_interval(_get(batch, key_col))
        return batch.filter(pa.array(frac < threshold))
    return fn


def md5_mod_sampler(percent: float, key_col: str):
    """Sampler variant whose identity is reproducible in ANSI SQL
    (md5(key) hex -> first 8 hex digits -> int % 10000 < percent*100):
    used by the oracle-checked sampler query. Hash cost is O(distinct keys)
    via dictionary encoding."""
    cut = int(percent * 100)

    def fn(batch: pa.Table) -> pa.Table:
        d = pc.dictionary_encode(pc.cast(_get(batch, key_col), pa.string()))
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        uniq = d.dictionary.to_pylist()
        keep_uniq = pa.array(
            [False if v is None else
             int(hashlib.md5(v.encode()).hexdigest()[:8], 16) % 10000 < cut
             for v in uniq], pa.bool_())
        keep = pc.take(keep_uniq, d.indices)
        return batch.filter(pc.fill_null(keep, False))
    return fn


# --- OTEP-235 consistent sampling (equalizing / proportional) --------------

#: pkg/sampling constants: 56-bit threshold/randomness space
_MAX_ADJUSTED_COUNT = 1 << 56
_NUM_HEX_DIGITS = 14


def tvalue_to_threshold(s: str) -> int:
    """sampling.TValueToThreshold (threshold.go:60-75): tvalues omit
    trailing zeros; '' means never-sample."""
    if len(s) > _NUM_HEX_DIGITS:
        raise ValueError("t-value too long")
    if not s:
        return _MAX_ADJUSTED_COUNT  # NeverSampleThreshold
    return int(s, 16) << (4 * (_NUM_HEX_DIGITS - len(s)))


def threshold_tvalue(t: int) -> str:
    """sampling.Threshold.TValue (threshold.go:99-115)."""
    if t == 0:
        return "0"
    if t >= _MAX_ADJUSTED_COUNT:
        return ""
    return format(t, "014x").rstrip("0")


def probability_to_threshold(fraction: float, precision: int = 4) -> int:
    """sampling.ProbabilityToThresholdWithPrecision (probability.go:33-76):
    rejection threshold T in [0, 2^56], rounded to ``precision`` hex
    digits with extra digits near the extremes (frexp rule). Returns
    2^56 (never sample) on probability-range error — the proportional
    sampler's documented underflow behavior."""
    import math

    if precision == 0:
        precision = _NUM_HEX_DIGITS
    if not (2.0 ** -56 <= fraction <= 1.0):
        return _MAX_ADJUSTED_COUNT
    if fraction == 1:
        return 0
    _, exp_f = math.frexp(fraction)
    _, exp_r = math.frexp(1 - fraction)
    precision = min(_NUM_HEX_DIGITS,
                    max(precision + exp_f // -4, precision + exp_r // -4))
    # Go math.Round = half away from zero (fraction*2^56 is positive)
    scaled = int(math.floor(fraction * float(_MAX_ADJUSTED_COUNT) + 0.5))
    threshold = _MAX_ADJUSTED_COUNT - scaled
    shift = 4 * (_NUM_HEX_DIGITS - precision)
    if shift:
        threshold += 1 << (shift - 1)
        threshold >>= shift
        threshold <<= shift
    return threshold


_HEX_LUT = np.full(256, 255, np.uint8)
for _i, _c in enumerate("0123456789abcdef"):
    _HEX_LUT[ord(_c)] = _i
    _HEX_LUT[ord(_c.upper())] = _i


def _hex_slice_u64(col: pa.Array, start: int, length: int) -> np.ndarray:
    """Parse a fixed-width hex slice of every string to uint64 — byte-LUT
    over the flat buffer, no per-row Python."""
    s = pc.utf8_slice_codeunits(pc.cast(col, pa.string()), start,
                                start + length)
    flat = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    flat = pc.cast(flat, pa.large_binary())
    if len(flat) == 0:
        return np.zeros(0, np.uint64)
    offs = np.frombuffer(flat.buffers()[1], np.int64)[
        flat.offset:flat.offset + len(flat) + 1]
    if not (np.diff(offs) == length).all():
        raise ValueError(f"expected fixed {length}-hex-digit slices")
    buf = np.frombuffer(flat.buffers()[2], np.uint8)
    nib = _HEX_LUT[buf[offs[0]:offs[-1]].reshape(len(flat), length)]
    if (nib == 255).any():
        raise ValueError("non-hex digit in randomness source")
    out = np.zeros(len(flat), np.uint64)
    for j in range(length):
        out = (out << np.uint64(4)) | nib[:, j].astype(np.uint64)
    return out


def consistent_sampler(percent: float, mode: str, key_col: str, *,
                       threshold_col: str | None = None,
                       precision: int = 4,
                       out_col: str = "sampling_threshold"):
    """probabilisticsampler equalizing/proportional modes as a batch
    stage (sampler_mode.go:267-303, makeSampler:412-425): OTEP-235
    consistent sampling. Randomness R = the W3C-spec low 56 bits of the
    record's trace-id hex in ``key_col`` (last 14 hex digits); incoming
    per-record thresholds are tvalues in ``threshold_col`` (null/'' =
    no threshold). Sampled iff T_decided <= R; sampled rows carry the
    updated tvalue in ``out_col`` (recordCarrier.updateThreshold).

    - equalizing: T = max(T_in, T_cfg) — raises thresholds UP TO the
      configured rate, records already sampled more aggressively pass
      through unchanged.
    - proportional: T = P2T(Probability(T_in) * percent/100) — scales
      every record's effective rate; underflow below 2^-56 drops the
      record (NeverSampleThreshold).
    One pass, no shuffle; threshold math runs per DISTINCT tvalue."""
    if mode not in ("equalizing", "proportional"):
        raise ValueError("mode must be equalizing|proportional")
    pct = min(float(percent), 100.0)
    ratio = pct / 100.0
    t_cfg = probability_to_threshold(ratio, precision)

    def decide(tv: str | None) -> int:
        t_in = tvalue_to_threshold(tv or "") if tv else 0
        has = bool(tv)
        if mode == "equalizing":
            return t_in if has and t_cfg < t_in else t_cfg
        incoming = (_MAX_ADJUSTED_COUNT - t_in) / _MAX_ADJUSTED_COUNT \
            if has else 1.0
        return probability_to_threshold(incoming * ratio, precision)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(out_col, pa.array([], pa.string()))
        rnd = _hex_slice_u64(_get(batch, key_col),
                             32 - _NUM_HEX_DIGITS, _NUM_HEX_DIGITS)
        if threshold_col is not None:
            d = pc.dictionary_encode(pc.cast(_get(batch, threshold_col),
                                             pa.string()))
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            t_uniq = [decide(v) for v in d.dictionary.to_pylist()]
            tv_uniq = pa.array([threshold_tvalue(t) for t in t_uniq],
                               pa.string())
            # null threshold -> the sentinel last slot (no-threshold path)
            idx = pc.fill_null(pc.cast(d.indices, pa.int64()),
                               len(t_uniq)).to_numpy(zero_copy_only=False)
            t_out = np.array(t_uniq + [decide(None)], np.uint64)[idx]
            tvals = pc.take(pa.concat_arrays([
                tv_uniq, pa.array([threshold_tvalue(decide(None))])]),
                pa.array(idx))
        else:
            t = decide(None)
            t_out = np.full(n, t, np.uint64)
            tvals = pa.nulls(n, pa.string()).fill_null(threshold_tvalue(t))
        keep = t_out <= rnd
        out = batch.append_column(out_col, tvals)
        return out.filter(pa.array(keep))

    return fn


# --- redaction processor ---------------------------------------------------

def redact(fields: list[str], blocked_values: list[str],
           mask_text: str = "****", summary_col: str | None = "redacted_count"):
    """redactionprocessor (processor.go:193-295): mask substrings matching any
    blocked_values regex in the given columns; optionally add a per-row count
    of redacted fields (the reference's redaction summary attributes)."""
    combined = "|".join(f"(?:{p})" for p in blocked_values)

    def fn(batch: pa.Table) -> pa.Table:
        hits_total = np.zeros(batch.num_rows, np.int64)
        if not blocked_values:
            # empty pattern list masks NOTHING (an empty regex would match
            # at every position and garble all values)
            if summary_col:
                batch = _set(batch, summary_col,
                             pa.array(hits_total, pa.int64()))
            return batch
        for f in fields:
            if f not in batch.column_names:
                continue
            col = pc.cast(_get(batch, f), pa.string())
            hit = pc.match_substring_regex(col, combined)
            out = pc.replace_substring_regex(col, combined, mask_text)
            batch = _set(batch, f, out)
            hits_total += pc.fill_null(hit, False).to_numpy(
                zero_copy_only=False).astype(np.int64)
        if summary_col:
            batch = _set(batch, summary_col, pa.array(hits_total, pa.int64()))
        return batch
    return fn


def chain(*fns):
    """Compose transformers into one map_batches callable (an operator
    sequence, like the stanza pipeline DAG's linear chains)."""
    def fn(batch: pa.Table) -> pa.Table:
        for f in fns:
            batch = f(batch)
        return batch
    return fn


def assign_keys(src: str, keys: list[str], dest_prefix: str = "",
                where: Expr | None = None):
    """assign_keys transformer (transformer/assignkeys/config.go:45-47):
    zip a list column's values with the configured key list -> named
    columns (positional list -> struct-with-names, flattened)."""
    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.maps import list_parts
        col = _get(batch, src)
        # pc.list_element raises on ragged lists; positional access with
        # null for missing positions via offset arithmetic instead
        # (list_parts rebases sliced arrays)
        offsets, values, _valid = list_parts(col)
        if len(values) == 0:
            # all rows empty/null: pc.take(values, 0) would raise
            for k in keys:
                batch = _masked(batch, dest_prefix + k,
                                pa.nulls(batch.num_rows, values.type),
                                where)
            return batch
        lengths = offsets[1:] - offsets[:-1]
        for i, k in enumerate(keys):
            has = lengths > i
            take = pa.array(np.where(has, offsets[:-1] + i, 0), pa.int64())
            val = pc.if_else(pa.array(has), pc.take(values, take),
                             pa.nulls(batch.num_rows, values.type))
            batch = _masked(batch, dest_prefix + k, val, where)
        return batch
    return fn
