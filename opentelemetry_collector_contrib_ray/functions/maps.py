"""OTTL map/list editors over Arrow map<string,string> columns.

Reference: the editor family operating on pcommon.Map attributes —
func_keep_keys.go, func_delete_key.go, func_delete_matching_keys.go,
func_keep_matching_keys.go, func_merge_maps.go, func_limit.go,
func_flatten.go, func_sort.go, func_to_key_value_string.go,
func_slice_to_map.go (SURVEY.md §2.5 map/list row).

The flat-table engine promotes hot attributes to first-class columns, but
open maps remain first-class for the long tail: these kernels rebuild the
map child arrays vectorized (numpy over flattened keys/items + offset
arithmetic) — no Python per row.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _map_parts(arr: pa.Array):
    """-> (offsets int64[n+1], keys, items, validity bool[n]).

    SLICED arrays are normalized: a slice's ``offsets`` are absolute into
    the FULL child arrays while ``keys``/``items`` return the full
    children — without rebasing, every kernel here would silently read and
    write neighboring rows' entries (verified). Children are sliced to the
    window and offsets rebased to 0."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = np.asarray(arr.offsets).astype(np.int64)
    keys = arr.keys
    items = arr.items
    start, end = (int(offsets[0]), int(offsets[-1])) if len(offsets) else (0, 0)
    if start != 0 or end != len(keys):
        keys = keys.slice(start, end - start)
        items = items.slice(start, end - start)
        offsets = offsets - start
    valid = ~np.asarray(pc.is_null(arr))
    return arr, offsets, keys, items, valid


def list_parts(arr: pa.Array):
    """Same slice normalization for plain list arrays: -> (rebased offsets
    int64[n+1], values window, validity bool[n]). Shared by list_append /
    assign_keys / every offsets+values consumer."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = np.asarray(arr.offsets).astype(np.int64)
    values = arr.values
    start, end = (int(offsets[0]), int(offsets[-1])) if len(offsets) else (0, 0)
    if start != 0 or end != len(values):
        values = values.slice(start, end - start)
        offsets = offsets - start
    valid = ~np.asarray(pc.is_null(arr))
    return offsets, values, valid


def _offsets_arr(new_offsets: np.ndarray, valid: np.ndarray) -> pa.Array:
    """Offsets with None at invalid rows (Arrow: a null offset nulls the
    row)."""
    if valid.all():
        return pa.array(new_offsets, pa.int32())
    vals = [int(v) for v in new_offsets]
    out = [vals[i] if (i >= len(valid) or valid[i]) else None
           for i in range(len(vals))]
    return pa.array(out, pa.int32())


def _rebuild(offsets, keys, items, keep_mask: np.ndarray,
             valid: np.ndarray) -> pa.MapArray:
    """Filter entries by keep_mask (over the flattened children), recompute
    offsets vectorized, preserve row validity."""
    if len(keep_mask) == 0:  # no entries at all (all maps empty/null)
        kept_per_row = np.zeros(max(0, len(offsets) - 1), np.int64)
    elif len(offsets) > 1:
        # clamp: a trailing empty row's offset == len(children), which
        # reduceat rejects; those rows are zeroed below anyway
        idx = np.minimum(offsets[:-1], len(keep_mask) - 1)
        kept_per_row = np.add.reduceat(keep_mask.astype(np.int64), idx)
    else:
        kept_per_row = np.array([], np.int64)
    # reduceat quirk: empty row slices copy the next value — zero them
    row_len = offsets[1:] - offsets[:-1]
    kept_per_row = np.where(row_len == 0, 0, kept_per_row)
    new_offsets = np.concatenate([[0], np.cumsum(kept_per_row)])
    new_keys = keys.filter(pa.array(keep_mask))
    new_items = items.filter(pa.array(keep_mask))
    return pa.MapArray.from_arrays(
        _offsets_arr(new_offsets, valid), new_keys, new_items)


def keep_keys(col, keys_to_keep: list[str]) -> pa.MapArray:
    """func_keep_keys.go: retain only the listed keys."""
    _, offsets, keys, items, valid = _map_parts(col)
    # typed value set: pa.array([]) infers null and is_in rejects it
    # (keep_keys(attrs, []) means "clear all", aggregateutil FilterAttrs)
    keep = np.asarray(pc.is_in(
        keys, value_set=pa.array(keys_to_keep, pa.string())))
    return _rebuild(offsets, keys, items, keep, valid)


def delete_key(col, key: str) -> pa.MapArray:
    """func_delete_key.go."""
    _, offsets, keys, items, valid = _map_parts(col)
    keep = ~np.asarray(pc.equal(keys, key)).astype(bool)
    return _rebuild(offsets, keys, items, keep, valid)


def delete_matching_keys(col, pattern: str) -> pa.MapArray:
    """func_delete_matching_keys.go: drop keys matching the RE2 pattern."""
    _, offsets, keys, items, valid = _map_parts(col)
    keep = ~np.asarray(pc.match_substring_regex(keys, pattern)).astype(bool)
    return _rebuild(offsets, keys, items, keep, valid)


def keep_matching_keys(col, pattern: str) -> pa.MapArray:
    """func_keep_matching_keys.go."""
    _, offsets, keys, items, valid = _map_parts(col)
    keep = np.asarray(pc.match_substring_regex(keys, pattern)).astype(bool)
    return _rebuild(offsets, keys, items, keep, valid)


def limit_map(col, n: int, priority_keys: list[str] | None = None
              ) -> pa.MapArray:
    """func_limit.go: cap entries per map at n. ``priority_keys`` are kept
    first (reference's priority_keys arg); remaining slots fill in map
    order."""
    _, offsets, keys, items, valid = _map_parts(col)
    idx = np.arange(len(keys))
    row_of = np.searchsorted(offsets[1:], idx, side="right")
    if priority_keys:
        prio = np.asarray(pc.is_in(
            keys, value_set=pa.array(priority_keys))).astype(bool)
        # rank within row: priority entries first (stable), then the rest
        order = np.lexsort((idx, ~prio, row_of))
        rank = np.empty(len(keys), np.int64)
        row_sorted = row_of[order]
        starts = np.concatenate(
            [[0], np.nonzero(row_sorted[1:] != row_sorted[:-1])[0] + 1])
        pos_in_row = np.arange(len(keys)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(keys)]])))
        rank[order] = pos_in_row
        keep = rank < n
    else:
        keep = (idx - offsets[row_of]) < n
    return _rebuild(offsets, keys, items, keep, valid)


def map_get(col, key: str) -> pa.Array:
    """attributes["key"] accessor: first value for the key per row."""
    _, offsets, keys, items, valid = _map_parts(col)
    n_rows = len(offsets) - 1
    if len(keys) == 0:  # all maps empty/null: pc.take(items, 0) would raise
        return pa.nulls(n_rows, items.type)
    hit = np.asarray(pc.equal(keys, key)).astype(bool)
    idx = np.arange(len(keys))
    row_of = np.searchsorted(offsets[1:], idx, side="right")
    first = np.full(n_rows, -1, np.int64)
    # earliest hit per row, vectorized: hits are in ascending entry order,
    # so np.unique's first-occurrence index per row is the winner
    hit_idx = idx[hit]
    if len(hit_idx):
        urows, first_pos = np.unique(row_of[hit_idx], return_index=True)
        first[urows] = hit_idx[first_pos]
    take = pa.array(np.where(first >= 0, first, 0), pa.int64())
    vals = pc.take(items, take)
    return pc.if_else(pa.array(first >= 0), vals,
                      pa.nulls(n_rows, items.type))


def map_has(col, key: str) -> np.ndarray:
    """bool per row: does the map contain ``key`` (even with a null
    value)? Presence is a KEY question — is_valid(map_get(...)) conflates
    'key absent' with 'key present, value null'."""
    _, offsets, keys, items, valid = _map_parts(col)
    n_rows = len(offsets) - 1
    if len(keys) == 0:
        return np.zeros(n_rows, bool)
    hit = np.asarray(pc.equal(keys, key)).astype(bool)
    idx = np.arange(len(keys))
    row_of = np.searchsorted(offsets[1:], idx, side="right")
    out = np.zeros(n_rows, bool)
    out[row_of[hit]] = True
    return out


def map_set(col, key: str, values) -> pa.MapArray:
    """set(attributes["key"], v): upsert one key per row — an EXISTING
    key's value is replaced IN PLACE (pcommon.Map.Put* semantics: entry
    order is insertion order and an update never moves the entry); rows
    without the key append it at the end. Null rows become single-entry
    maps — pdata maps are never nil, so `set` always creates the entry.
    Repeated keys (never produced by this module) all get the value."""
    arr, offsets, keys, items, valid = _map_parts(col)
    n_rows = len(offsets) - 1
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array([values] * n_rows, items.type)
    elif isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if len(keys) == 0:  # all maps empty/null: one new entry per row
        new_offsets = np.arange(n_rows + 1, dtype=np.int64)
        return pa.MapArray.from_arrays(
            pa.array(new_offsets, pa.int32()),
            pa.array([key] * n_rows, pa.string()), values)
    hit = np.asarray(pc.equal(keys, key)).astype(bool)
    idx = np.arange(len(keys))
    entry_row = np.searchsorted(offsets[1:], idx, side="right")
    has = np.zeros(n_rows, bool)
    has[entry_row[hit]] = True
    # in-place replacement lane: existing entries, hit items swapped
    repl_items = pc.if_else(pa.array(hit),
                            pc.take(values, pa.array(entry_row, pa.int64())),
                            items)
    # append lane: rows lacking the key grow one trailing entry
    old_counts = (offsets[1:] - offsets[:-1]).astype(np.int64)
    new_counts = old_counts + (~has).astype(np.int64)
    new_offsets = np.concatenate([[0], np.cumsum(new_counts)])
    total = int(new_offsets[-1])
    within = np.arange(total, dtype=np.int64) - np.repeat(
        new_offsets[:-1], new_counts)
    is_new = within == np.repeat(old_counts, new_counts)
    old_pos = np.repeat(offsets[:-1].astype(np.int64), new_counts) + within
    row_take = pa.array(np.repeat(np.arange(n_rows, dtype=np.int64),
                                  new_counts), pa.int64())
    old_take = pa.array(np.where(is_new, 0, old_pos), pa.int64())
    out_keys = pc.if_else(pa.array(is_new), pa.scalar(key),
                          pc.take(keys, old_take))
    out_items = pc.if_else(pa.array(is_new), pc.take(values, row_take),
                           pc.take(repl_items, old_take))
    return pa.MapArray.from_arrays(
        pa.array(new_offsets, pa.int32()), out_keys, out_items)


def merge_maps(target, source, strategy: str = "upsert") -> pa.MapArray:
    """func_merge_maps.go: insert (only keys absent from target), update
    (only keys already in target), upsert (source overrides)."""
    if strategy not in ("insert", "update", "upsert"):
        raise ValueError(f"merge_maps: bad strategy {strategy!r}")
    t, t_off, t_keys, t_items, t_valid = _map_parts(target)
    s, s_off, s_keys, s_items, s_valid = _map_parts(source)
    out = t
    # per distinct source key: set into target (source maps are small)
    for k in pc.unique(s_keys).to_pylist():
        vals = map_get(s, k)
        has = pa.array(map_has(s, k))
        cur = map_get(out, k)
        # presence is a KEY question: a target entry holding a null value
        # still exists, so insert must NOT overwrite it and update MUST
        had = pa.array(map_has(out, k))
        if strategy == "insert":
            take_src = pc.and_(has, pc.invert(had))
        elif strategy == "update":
            take_src = pc.and_(has, had)
        else:
            take_src = has
        merged = pc.if_else(take_src, vals, cur)
        out = map_set(out, k, merged)
        # map_set created the entry on EVERY row; rows that neither had
        # the key nor took it from source must not keep the artifact —
        # but a pre-existing null-valued entry is PRESENT and stays
        want = np.asarray(had) | np.asarray(take_src)
        _, offs, ks, its, vld = _map_parts(out)
        entry_row = np.searchsorted(offs[1:], np.arange(len(ks)),
                                    side="right")
        keep = ~(np.asarray(pc.equal(ks, k)).astype(bool) &
                 ~want[entry_row])
        out = _rebuild(offs, ks, its, keep, vld)
    return out


def to_key_value_string(col, delimiter: str = "=",
                        pair_delimiter: str = " ",
                        sort_keys: bool = False) -> pa.Array:
    """func_to_key_value_string.go: map -> 'k=v k2=v2' string per row.
    Values (or keys) containing either delimiter are double-quoted, per
    the reference's writer; sort_keys orders pairs by key."""
    _, offsets, keys, items, valid = _map_parts(col)
    items_s = pc.cast(items, pa.string())
    if sort_keys:
        # sort pairs within each row by (key, value) without leaving
        # Arrow: one table sort on (row_id, k, v), then permute the
        # flattened arrays — offsets are unchanged by a within-row sort
        row_ids = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                            np.diff(offsets))
        perm = pc.sort_indices(
            pa.table({"r": pa.array(row_ids), "k": keys, "v": items_s}),
            sort_keys=[("r", "ascending"), ("k", "ascending"),
                       ("v", "ascending")])
        keys = keys.take(perm)
        items_s = items_s.take(perm)

    def _quoted(a):
        # escapeAndQuoteKV: existing double quotes are backslash-escaped
        # FIRST, then the string is quoted iff it contains a delimiter —
        # without the escape the quoted field is unparseable
        a = pc.replace_substring(a, '"', '\\"')
        needs_q = pc.or_(pc.match_substring(a, delimiter),
                         pc.match_substring(a, pair_delimiter))
        return pc.if_else(
            needs_q, pc.binary_join_element_wise('"', a, '"', ""), a)

    pairs = pc.binary_join_element_wise(_quoted(keys), _quoted(items_s),
                                        delimiter)
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pairs)
    out = pc.binary_join(lists, pair_delimiter)
    return pc.if_else(pa.array(valid), out, pa.nulls(len(valid), pa.string()))


def slice_to_map(col, keys_for_positions: list[str]) -> pa.MapArray:
    """func_slice_to_map.go: list column -> map with positional keys."""
    offsets, values, _v = list_parts(col)
    n = len(keys_for_positions)
    idx = np.arange(len(values))
    pos_in_row = idx - offsets[np.searchsorted(offsets[1:], idx, side="right")]
    keep = pos_in_row < n
    key_arr = pa.array([keys_for_positions[p] for p in pos_in_row[keep]],
                       pa.string())
    row_len = np.minimum(offsets[1:] - offsets[:-1], n)
    new_offsets = np.concatenate([[0], np.cumsum(row_len)])
    valid = ~np.asarray(pc.is_null(col))
    return pa.MapArray.from_arrays(
        _offsets_arr(new_offsets, valid), key_arr,
        values.filter(pa.array(keep)))


def flatten_struct(batch: pa.Table, col: str, prefix: str = "",
                   resolve_conflicts: bool = False, drop: bool = True
                   ) -> pa.Table:
    """func_flatten.go applied to a struct column: promote fields to
    top-level columns ``prefix + name`` (suffix numbering on conflicts when
    resolve_conflicts, reference's resolveConflicts knob)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    for i in range(arr.type.num_fields):
        name = prefix + arr.type.field(i).name
        if name in batch.column_names:
            if not resolve_conflicts:
                raise ValueError(f"flatten conflict on {name!r}")
            k = 0
            while f"{name}.{k}" in batch.column_names:
                k += 1
            name = f"{name}.{k}"
        batch = batch.append_column(name, pc.struct_field(arr, i))
    if drop:
        batch = batch.drop_columns([col])
    return batch


def map_get_dyn(col, key_per_row) -> pa.Array:
    """attributes[<per-row key>] accessor: like map_get but the key varies
    by row (OTTL dynamic indexing, e.g. attributes[attributes["flags"]]).
    Vectorized: expand each row's wanted key across its entries, compare
    once."""
    if isinstance(key_per_row, pa.ChunkedArray):
        key_per_row = key_per_row.combine_chunks()
    _, offsets, keys, items, valid = _map_parts(col)
    n_rows = len(offsets) - 1
    if len(keys) == 0:
        return pa.nulls(n_rows, items.type)
    idx = np.arange(len(keys))
    row_of = np.searchsorted(offsets[1:], idx, side="right")
    want = pc.take(key_per_row, pa.array(row_of, pa.int64()))
    hit = np.asarray(pc.fill_null(pc.equal(keys, want), False)).astype(bool)
    first = np.full(n_rows, -1, np.int64)
    hit_idx = idx[hit]
    if len(hit_idx):
        urows, first_pos = np.unique(row_of[hit_idx], return_index=True)
        first[urows] = hit_idx[first_pos]
    take = pa.array(np.where(first >= 0, first, 0), pa.int64())
    vals = pc.take(items, take)
    return pc.if_else(pa.array(first >= 0), vals,
                      pa.nulls(n_rows, items.type))


def map_set_dyn(col, key_per_row, values) -> pa.MapArray:
    """set(attributes[<per-row key>], v): upsert with a per-row key.
    Rows whose key is null are left unchanged (the reference errors per
    record; columnar form skips). Same delete-then-append shape as
    map_set, vectorized."""
    if isinstance(key_per_row, pa.ChunkedArray):
        key_per_row = key_per_row.combine_chunks()
    arr, offsets, keys, items, valid = _map_parts(col)
    n_rows = len(offsets) - 1
    # delete each row's wanted key first
    if len(keys):
        idx = np.arange(len(keys))
        row_of = np.searchsorted(offsets[1:], idx, side="right")
        want = pc.take(key_per_row, pa.array(row_of, pa.int64()))
        keep = ~np.asarray(pc.fill_null(pc.equal(keys, want),
                                        False)).astype(bool)
        without = _rebuild(offsets, keys, items, keep, valid)
    else:
        without = arr
    _, offs2, keys2, items2, valid2 = _map_parts(without)
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array([values] * n_rows, items2.type)
    elif isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    key_valid = np.asarray(pc.is_valid(key_per_row))
    old_counts = (offs2[1:] - offs2[:-1]).astype(np.int64)
    new_counts = old_counts + key_valid.astype(np.int64)
    new_offsets = np.concatenate([[0], np.cumsum(new_counts)])
    total = int(new_offsets[-1])
    within = np.arange(total, dtype=np.int64) - np.repeat(
        new_offsets[:-1], new_counts)
    is_new = within == np.repeat(old_counts, new_counts)
    # rows without a valid key never get an is_new slot (count unchanged)
    pos = np.where(is_new, 0,
                   np.repeat(offs2[:-1].astype(np.int64), new_counts)
                   + within)
    row_take = pa.array(np.searchsorted(new_offsets[1:],
                                        np.arange(total), side="right"),
                        pa.int64())
    if len(keys2) == 0:
        out_keys = pc.take(key_per_row, row_take)
        out_items = pc.take(values, row_take)
    else:
        old_take = pa.array(pos, pa.int64())
        out_keys = pc.if_else(pa.array(is_new),
                              pc.take(key_per_row, row_take),
                              pc.take(keys2, old_take))
        out_items = pc.if_else(pa.array(is_new), pc.take(values, row_take),
                               pc.take(items2, old_take))
    return pa.MapArray.from_arrays(
        pa.array(new_offsets, pa.int32()), out_keys, out_items)
