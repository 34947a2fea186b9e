"""Gap-based sessionization — the batch analogue of the trace-grouping
family (groupbytraceprocessor's wait_duration gather, tailsampling's
decision_wait buffering — SURVEY.md §2.6, §2.11): in batch mode complete
groups are available, so "wait for the trace to finish" becomes "group by
key, order by time, split where the gap exceeds the timeout".

Plan shape mirrors recombine: coarse hash partition on the key, per
partition one vectorized sort + boundary scan. Output: one row per session
with start/end, duration, and event count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .shuffle import adaptive_n_parts, key_partitioner


def sessionize(ds: Dataset, *, key_col: str, ts_col: str = "ts",
               gap: str = "30m", n_parts: int | None = None,
               size_bytes: int | None = None,
               pre_grouped: bool = False) -> Dataset:
    """Sessions = maximal runs of a key's events where consecutive gaps are
    <= ``gap`` ('30m', '90s', '1h'). Returns per-session rows:
    (key, session_idx, session_start, session_end, n_events). Partition
    count is adaptive (cluster CPUs / input bytes) so per-task group size
    stays bounded at scale.

    ``pre_grouped=True``: every key's rows are contained in one input
    block (produce such blocks with ``sources.grouped.read_file_blocks``)
    — sessions are then computed block-locally with zero shuffle."""
    unit = gap[-1]
    mult = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000}[unit]
    gap_us = int(float(gap[:-1]) * mult)
    n_parts = n_parts or adaptive_n_parts(size_bytes)
    add_part = key_partitioner(key_col, n_parts)

    def per_partition(group: pa.Table,
                      drop: tuple = ("_part",)) -> pa.Table:
        group = group.drop_columns(list(drop))
        tcol = group[ts_col]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        if tcol.null_count:
            # a null timestamp has no position in any gap sequence — drop
            # (matches SQL, where a null ts sorts outside every session
            # window); keeping them crashed the int64 round-trip via NaN
            group = group.filter(pc.is_valid(tcol))
        group = group.sort_by(
            [(key_col, "ascending"), (ts_col, "ascending")])
        n = group.num_rows
        key_t = group[key_col].type
        empty = pa.table({
            key_col: pa.array([], key_t),
            "session_idx": pa.array([], pa.int64()),
            "session_start": pa.array([], pa.timestamp("us")),
            "session_end": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
        })
        if n == 0:
            return empty
        keys = group[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        tsc = group[ts_col]
        if isinstance(tsc, pa.ChunkedArray):
            tsc = tsc.combine_chunks()
        # normalize any timestamp unit to us before the int64 view (gap_us
        # and the emitted timestamp[us] session bounds assume it); a bare
        # integer epoch column is taken as already-us
        if pa.types.is_timestamp(tsc.type):
            tsc = pc.cast(tsc, pa.timestamp("us"), safe=False)
        ts = pc.cast(tsc, pa.int64()).to_numpy(zero_copy_only=False)
        from .metrics import key_change_mask
        key_change = key_change_mask(keys, n)
        gap_break = np.concatenate([[True], (ts[1:] - ts[:-1]) > gap_us])
        new_session = key_change | gap_break
        sess_id = np.cumsum(new_session) - 1
        starts = np.nonzero(new_session)[0]
        ends = np.concatenate([starts[1:], [n]]) - 1
        # session_idx: running index within each key
        key_start_flag = key_change[starts]
        sidx = np.arange(len(starts)) - np.maximum.accumulate(
            np.where(key_start_flag, np.arange(len(starts)), 0))
        out_keys = keys.take(pa.array(starts.astype(np.int64)))
        return pa.table({
            key_col: out_keys,
            "session_idx": pa.array(sidx, pa.int64()),
            "session_start": pa.array(ts[starts], pa.timestamp("us")),
            "session_end": pa.array(ts[ends], pa.timestamp("us")),
            "n_events": pa.array((ends - starts + 1), pa.int64()),
        })

    if pre_grouped:
        return ds.map_batches(lambda b: per_partition(b, drop=()),
                              batch_format="pyarrow", batch_size=None)

    tagged = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return tagged.groupby("_part").map_groups(per_partition,
                                              batch_format="pyarrow")
