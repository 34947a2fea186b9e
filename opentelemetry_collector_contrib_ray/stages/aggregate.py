"""Grouped counts/sums (countconnector / sumconnector re-expressed).

Reference semantics (studied, not ported):
  - countconnector: optional OTTL conditions (OR-ed), group by configured
    attributes with a default value when the attribute is missing (or skip the
    record entirely when configured), emit counts keyed by the attribute set
    (connector/countconnector/counter.go:38-106, config.go:35-51).
  - sumconnector: same, summing a numeric source_attribute
    (connector/sumconnector/README.md:67-74).
  - logdedupprocessor: count duplicates per (body, attrs, severity) identity
    with first/last observed timestamps (processor/logdedupprocessor/counter.go:27-99).

Scale design: a bare groupby shuffles EVERY row. All aggregations here
pre-aggregate inside ``map_batches`` first — one output row per key per
input block — so the all-to-all exchange moves only partial aggregates
(cardinality(keys) × blocks rows, not N rows). The reference does the same
thing implicitly: countconnector's in-memory ``counts`` map is a per-batch
partial that downstream metric pipelines merge.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..expr import Expr


def _merge_partials(partials: Dataset, keys: list[str],
                    aggs: list[tuple[str, str]],
                    out_names: list[str],
                    part_col: str | None = None) -> Dataset:
    """Final combine of per-block partial aggregates — cardinality-aware.

    Telemetry-count shapes (``part_col=None``): partial tables are tiny
    (blocks × key-cardinality rows), so a full Ray sort-shuffle groupby is
    pure overhead (~10s fixed cost at any size); repartition to one block
    and merge with a single vectorized pyarrow group_by task.

    High-cardinality keys (exact-dedup digests, near-dup pair sets — key
    cardinality O(N)): the caller's partial stage emits an int64 hash
    partition column (``part_col``, = hash(key) % adaptive_n_parts) and the
    merge runs per partition via groupby(part_col).map_groups. Keys are
    disjoint across partitions, so there is NO single-block fan-in — each
    merge task sees 1/n_parts of the distinct keys, bounded regardless of
    input scale.
    """
    if part_col is None:
        def merge(batch: pa.Table) -> pa.Table:
            out = batch.group_by(keys).aggregate(aggs)
            return out.rename_columns(keys + out_names)

        return partials.repartition(1).map_batches(
            merge, batch_format="pyarrow", batch_size=None)

    def merge_group(group: pa.Table) -> pa.Table:
        out = group.drop_columns([part_col]).group_by(keys).aggregate(aggs)
        return out.rename_columns(keys + out_names)

    return partials.groupby(part_col).map_groups(
        merge_group, batch_format="pyarrow")


def _fill_defaults(batch: pa.Table, keys: list[str], default: str) -> pa.Table:
    """countconnector's default_value for missing attributes (counter.go:42-73).

    The cast decision is made from the column TYPE, never from this block's
    null presence: a non-string key column that cannot represent the string
    default is cast to string in EVERY block (attributes are stringly in the
    reference), so partial schemas agree across blocks even when only some
    blocks contain nulls."""
    for k in keys:
        c = batch[k]
        i = batch.column_names.index(k)
        t = c.type
        fill: object = default
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            try:  # typed default (e.g. default="0" into an int column)?
                fill = pa.scalar(default).cast(t)
            except (pa.ArrowInvalid, pa.ArrowTypeError,
                    pa.ArrowNotImplementedError):
                c = pc.cast(c, pa.string())
                batch = batch.set_column(i, k, c)
        if c.null_count:
            batch = batch.set_column(i, k, pc.fill_null(c, fill))
    return batch


def count_by(ds: Dataset, keys: list[str], condition: Expr | None = None,
             count_col: str = "count", default_value: str = "",
             missing: str = "default") -> Dataset:
    """countconnector: filter by condition, group by ``keys``, count.

    ``missing``: what to do with records lacking a group attribute —
    'default' substitutes ``default_value`` (the reference's DefaultValue),
    'skip' drops the record entirely (counter.go:42-73 skips when the
    attribute is absent and no default is configured).

    Two-phase: vectorized within-block partial counts (pyarrow group_by),
    then a small shuffle summing partials.
    """
    if missing not in ("default", "skip"):
        raise ValueError("missing must be default|skip")

    def partial(batch: pa.Table) -> pa.Table:
        if condition is not None:
            batch = batch.filter(condition.mask(batch))
        if missing == "skip":
            for k in keys:
                c = batch[k]
                if isinstance(c, pa.ChunkedArray):
                    c = c.combine_chunks()
                if c.null_count:
                    batch = batch.filter(pc.is_valid(c))
        else:
            batch = _fill_defaults(batch, keys, default_value)
        out = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return out.rename_columns(keys + ["_partial"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _merge_partials(partials, keys, [("_partial", "sum")], [count_col])


def sum_by(ds: Dataset, keys: list[str], value_col: str,
           condition: Expr | None = None, sum_col: str = "total",
           default_value: str = "") -> Dataset:
    """sumconnector: group by ``keys``, sum ``value_col`` (nulls contribute 0)."""
    def partial(batch: pa.Table) -> pa.Table:
        if condition is not None:
            batch = batch.filter(condition.mask(batch))
        batch = _fill_defaults(batch, keys, default_value)
        out = (batch.select(keys + [value_col]).group_by(keys)
               .aggregate([(value_col, "sum")]))
        return out.rename_columns(keys + ["_partial"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _merge_partials(partials, keys, [("_partial", "sum")], [sum_col])


def canonical_identity(batch: pa.Table, cols: list[str]) -> pa.Array:
    """Canonical serialization of a column tuple — the columnar analogue of
    the reference's sorted-key, type-prefixed identity hash
    (pkg/pdatautil/hash.go:16-32). Each value is LENGTH-PREFIXED
    ("<len>:<value>", a prefix code) so no value content can collide with
    the encoding — a plain separator join would merge ("a\x1fb","c") with
    ("a","b\x1fc"); nulls get the marker "N" (distinct from every
    length-prefixed piece and from ""). Never null itself, so it is safe
    as a shuffle/groupby key."""
    parts = []
    for c in cols:
        arr = batch[c]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_null(arr.type):
            arr = pc.cast(arr, pa.string())
        s = pc.cast(arr, pa.string())
        piece = pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(s), pa.string()), s, ":")
        parts.append(pc.coalesce(piece, pa.scalar("N")))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "")


def dedup_counts(ds: Dataset, identity_cols: list[str], ts_col: str = "ts",
                 count_col: str = "log_count", wide: bool = True) -> Dataset:
    """logdedupprocessor: one row per identity with count + first/last observed.

    Groups on a canonical identity string (never null — Ray's sort-based
    shuffle cannot key on nullable columns), carrying the identity columns
    through as per-group constants. Pre-aggregated per block like count_by so
    the shuffle moves only partials.

    ``wide`` (default True): hash-partition the final merge — identity
    cardinality can be O(N) when body text is in the identity. Callers that
    KNOW the identity is low-cardinality (template/severity/code tuples)
    may pass wide=False for the single-task merge, which skips ~2s of
    fixed sort-shuffle cost.
    """
    from .shuffle import adaptive_n_parts
    n_parts = adaptive_n_parts() if wide else 1

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        sel = batch.select(identity_cols + [ts_col])
        # pin all-null blocks to string so cross-block schemas unify
        for i, f in enumerate(sel.schema):
            if pa.types.is_null(f.type):
                sel = sel.set_column(i, f.name, pc.cast(sel.column(i), pa.string()))
        ident = canonical_identity(sel, identity_cols)
        sel = sel.append_column("_id", ident)
        if wide:
            # identity cardinality can be O(N) (body text in the
            # identity): hash-partition the merge like exact_dedup,
            # never a 1-block fan-in
            ih = pl.from_arrow(ident).hash(seed=31).to_numpy()
            mp = (ih % n_parts).astype("int64")
            sel = sel.append_column(
                "_mp", pa.array(mp, pa.int64()))
        else:
            # single-task merge: constant partition, no hash pass
            sel = sel.append_column(
                "_mp", pc.fill_null(pa.nulls(sel.num_rows, pa.int64()), 0))
        aggs = [("_mp", "min"), ([], "count_all"),
                (ts_col, "min"), (ts_col, "max")]
        aggs += [(c, "min") for c in identity_cols]  # constant per group
        out = sel.group_by(["_id"]).aggregate(aggs)
        return out.rename_columns(
            ["_id", "_mp", "_n", "_first", "_last"] + identity_cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    agg = _merge_partials(
        partials, ["_id"],
        [("_n", "sum"), ("_first", "min"), ("_last", "max")] +
        [(c, "min") for c in identity_cols],
        [count_col, "first_observed_ts", "last_observed_ts"] + identity_cols,
        part_col="_mp" if wide else None)
    return agg.select_columns(
        identity_cols + [count_col, "first_observed_ts", "last_observed_ts"])
