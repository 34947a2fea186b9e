"""Recombine: multiline/sessionized merge of log entries per source.

Reference semantics (studied, not ported): stanza recombine operator
(pkg/stanza/operator/transformer/recombine/config.go:39-54, transformer.go):
entries buffer per source until an ``is_first_entry`` match starts a new
logical entry; buffered lines merge via ``combine_with`` (default "\\n");
``overwrite_with: oldest`` keeps the first entry's envelope. In batch mode
the force-flush timeout / max_sources caps vanish — complete groups are
available (SURVEY.md §2.11).

Two physical plans:

- ``recombine_blocks``: fully vectorized ``map_batches``. PARTITIONING
  ASSUMPTION (documented per SURVEY.md §2 custom-operator rule): each block
  holds whole conversations with rows sorted by ``turn_idx``. File layout
  alone does NOT give this: ``read_parquet`` re-splits output blocks at
  arbitrary row boundaries to hit its parallelism target — read
  conversation-contained part files with
  ``sources.grouped.read_file_blocks`` (one file -> one block) instead.
  Segments never span blocks because a conversation's first row always
  starts a segment.

- ``recombine_grouped``: general plan for arbitrary layouts —
  ``groupby(conv_id).map_groups`` (hash shuffle co-locates each
  conversation, sort inside the group). Use when input locality is unknown.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .metrics import key_change_mask
from .shuffle import adaptive_n_parts, key_partitioner

FIRST_ENTRY_RE = r"^\S"  # classic multiline rule: non-indented line starts an entry


def merge_segments(batch: pa.Table, *, source_col: str = "conv_id",
                   order_col: str = "turn_idx", body_col: str = "text",
                   is_first_re: str = FIRST_ENTRY_RE,
                   is_last_re: str | None = None,
                   combine_with: str = "\n",
                   overwrite_with: str = "oldest",
                   match_col: str | None = None,
                   keep_cols: list[str] | None = None) -> pa.Table:
    """Vectorized segment merge over one block (rows sorted per source).

    Boundary rule mirrors the recombine config's one-of is_first_entry /
    is_last_entry (config.go:39-54): with ``is_first_re`` a matching row
    STARTS a segment; with ``is_last_re`` a matching row ENDS one (the
    next row starts fresh). ``overwrite_with``: which row's (source,
    order, ts) envelope survives — 'oldest' (first row, the default) or
    'newest' (last row).

    ``match_col`` lets the boundary regex test a DIFFERENT column than the
    one being combined (transformer_test.go "CombineOtherThanCondition":
    is_last on body.logtag, combine body.message). ``keep_cols`` are
    carried through with the surviving envelope row's values — the
    reference keeps the whole entry of the overwrite_with row, not just
    its timestamp.

    Output: one row per logical entry — envelope per overwrite_with,
    bodies joined with ``combine_with``, plus ``n_lines`` and keep_cols.
    """
    if overwrite_with not in ("oldest", "newest"):
        raise ValueError("overwrite_with must be oldest|newest")
    if batch.num_rows == 0:
        # empty result derives its schema from the INPUT (hardcoded types
        # would conflict with non-empty blocks at concat time)
        sch = batch.schema
        def _t(name, fallback):
            return sch.field(name).type if name in sch.names else fallback
        cols = {
            source_col: pa.array([], _t(source_col, pa.string())),
            order_col: pa.array([], _t(order_col, pa.int32())),
            "ts": pa.array([], _t("ts", pa.timestamp("us"))),
            body_col: pa.array([], _t(body_col, pa.string())),
            "n_lines": pa.array([], pa.int64()),
        }
        for c in (keep_cols or []):
            if c not in cols:
                cols[c] = pa.array([], _t(c, pa.string()))
        return pa.table(cols)
    body = batch[body_col]
    if isinstance(body, pa.ChunkedArray):
        body = body.combine_chunks()
    n = batch.num_rows
    # source boundaries always start a segment (first turn is never a
    # continuation by construction; belt-and-braces: OR with source change)
    src = batch[source_col]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    # nulls-equal change detection (key_change_mask): consecutive
    # null-source rows are ONE source, not a segment break per row
    changed = pa.array(key_change_mask(src, n)) if n > 1 \
        else pa.array([True] * n, pa.bool_())
    mcol = batch[match_col] if match_col else body
    if isinstance(mcol, pa.ChunkedArray):
        mcol = mcol.combine_chunks()
    mcol = pc.cast(mcol, pa.string())
    if is_last_re is not None:
        # a match ENDS the segment: row i starts one iff row i-1 matched
        is_last = pc.fill_null(pc.match_substring_regex(mcol, is_last_re),
                               False)
        prev_last = pa.concat_arrays(
            [pa.array([True]), is_last.slice(0, n - 1)])
        starts = pc.or_(prev_last, changed)
    else:
        # a null line does not match the boundary regex in the reference
        # (nil/empty body fails ^\S) -> it CONTINUES the open entry; the
        # SQL oracle agrees (regexp_matches(NULL) -> NULL -> not-first)
        is_first = pc.fill_null(pc.match_substring_regex(mcol, is_first_re),
                                False)
        starts = pc.or_(is_first, changed)
    seg = pc.cumulative_sum(pc.cast(starts, pa.int64()))
    extras = [c for c in (keep_cols or [])
              if c not in (source_col, order_col, "ts", body_col)]
    work = batch.select([source_col, order_col, "ts", body_col] + extras) \
        .append_column("_seg", seg)
    env = "first" if overwrite_with == "oldest" else "last"
    # row-faithful envelope: first/last must take the actual first/last
    # row's value even when null (Arrow aggregations skip nulls by
    # default); count mode 'all' so null bodies still count as lines
    keep_nulls = pc.ScalarAggregateOptions(skip_nulls=False)
    count_all = pc.CountOptions(mode="all")
    # a null body line must not null the whole joined entry
    i_body = work.column_names.index(body_col)
    work = work.set_column(i_body, body_col,
                           pc.fill_null(work[body_col], ""))
    agg = work.group_by(["_seg"], use_threads=False).aggregate(
        [(source_col, env, keep_nulls), (order_col, env, keep_nulls),
         ("ts", env, keep_nulls),
         (body_col, "list"), (body_col, "count", count_all)]
        + [(c, env, keep_nulls) for c in extras])
    joined = pc.binary_join(agg[f"{body_col}_list"].combine_chunks(),
                            combine_with)
    out = {
        source_col: agg[f"{source_col}_{env}"],
        order_col: agg[f"{order_col}_{env}"],
        "ts": agg[f"ts_{env}"],
        body_col: joined,
        "n_lines": pc.cast(agg[f"{body_col}_count"], pa.int64()),
    }
    for c in extras:
        out[c] = agg[f"{c}_{env}"]
    return pa.table(out)


def recombine_blocks(ds: Dataset, **kw) -> Dataset:
    """Fast path: block-local vectorized merge (see module docstring for the
    partitioning assumption)."""
    return ds.map_batches(lambda b: merge_segments(b, **kw),
                          batch_format="pyarrow", batch_size=None)


def recombine_grouped(ds: Dataset, *, source_col: str = "conv_id",
                      order_col: str = "turn_idx",
                      n_parts: int | None = None,
                      size_bytes: int | None = None, **kw) -> Dataset:
    """General path: hash-co-locate sources, sort, merge.

    Shuffles on a COARSE partition key (hash(source) % n_parts) rather than
    the source itself: one map_groups call processes a whole partition of
    sources vectorized (merge_segments handles multiple sources per table),
    so per-group scheduling cost is per partition — thousands of small
    conversations don't pay per-conversation task overhead. ``n_parts`` is
    adaptive (cluster CPUs, plus ``size_bytes`` when the caller knows the
    input size) so one partition never materializes an unbounded slice of
    the input in a single task.
    """
    n_parts = n_parts or adaptive_n_parts(size_bytes)
    add_part = key_partitioner(source_col, n_parts)

    def per_partition(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["_part"]).sort_by(
            [(source_col, "ascending"), (order_col, "ascending")])
        return merge_segments(group, source_col=source_col,
                              order_col=order_col, **kw)

    tagged = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return tagged.groupby("_part").map_groups(per_partition,
                                              batch_format="pyarrow")
