"""Recombine (multiline merge) tests — stanza recombine semantics
(SURVEY.md §2.4, §2.11)."""

import datetime

import pytest

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.recombine import (
    merge_segments,
    recombine_blocks,
    recombine_grouped,
)


def _batch():
    rows = [
        ("c1", 0, "line one"),
        ("c1", 1, "Traceback (most recent call last):"),
        ("c1", 2, '  File "a.py", line 1'),
        ("c1", 3, "  ValueError: boom"),
        ("c1", 4, "after"),
        ("c2", 0, "  oddly indented first turn"),  # conv boundary still splits
        ("c2", 1, "normal"),
    ]
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows]),
        "ts": pa.array([datetime.datetime(2026, 1, 1, 0, 0, i)
                        for i in range(len(rows))], pa.timestamp("us")),
    })


def test_merge_segments_joins_continuations():
    out = merge_segments(_batch())
    assert out.num_rows == 5
    texts = out["text"].to_pylist()
    assert texts[1] == ("Traceback (most recent call last):\n"
                        '  File "a.py", line 1\n  ValueError: boom')
    assert out["n_lines"].to_pylist() == [1, 3, 1, 1, 1]
    # overwrite_with oldest: envelope from first line of the segment
    assert out["turn_idx"].to_pylist() == [0, 1, 4, 0, 1]
    assert out["conv_id"].to_pylist() == ["c1", "c1", "c1", "c2", "c2"]


def test_merge_segments_empty():
    out = merge_segments(_batch().slice(0, 0))
    assert out.num_rows == 0


def test_recombine_grouped_equals_blocks_on_aligned_input():
    ds = ray.data.from_arrow(_batch())
    a = recombine_blocks(ds).to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    b = recombine_grouped(ray.data.from_arrow(_batch())).to_pandas() \
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert a[["conv_id", "turn_idx", "text", "n_lines"]].equals(
        b[["conv_id", "turn_idx", "text", "n_lines"]])


def test_is_last_entry_mode():
    """is_last_entry: a matching row ENDS the segment (recombine
    config.go one-of is_first_entry/is_last_entry; e.g. stack traces
    terminated by 'END')."""
    t = pa.table({
        "conv_id": ["c"] * 5,
        "turn_idx": pa.array(range(5), pa.int32()),
        "ts": pa.array([None] * 5, pa.timestamp("us")),
        "text": ["part a", "part b END", "next 1", "next 2", "tail END"],
    })
    out = merge_segments(t, is_last_re=r"END$").sort_by("turn_idx")
    assert out["text"].to_pylist() == [
        "part a\npart b END", "next 1\nnext 2\ntail END"]
    assert out["n_lines"].to_pylist() == [2, 3]


def test_overwrite_with_newest():
    t = pa.table({
        "conv_id": ["c"] * 3,
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "ts": pa.array([None] * 3, pa.timestamp("us")),
        "text": ["head", " cont1", " cont2"],
    })
    oldest = merge_segments(t)
    newest = merge_segments(t, overwrite_with="newest")
    assert oldest["turn_idx"].to_pylist() == [0]
    assert newest["turn_idx"].to_pylist() == [2]
    assert newest["text"].to_pylist() == oldest["text"].to_pylist()
    with pytest.raises(ValueError, match="overwrite_with"):
        merge_segments(t, overwrite_with="latest")


def test_merge_segments_empty_batch_keeps_input_schema():
    t = pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int64()),   # int64, not default int32
        "ts": pa.array([], pa.timestamp("us")),
        "text": pa.array([], pa.string()),
    })
    out = merge_segments(t)
    assert out["turn_idx"].type == pa.int64()


def test_merge_segments_null_body_and_envelope():
    t = pa.table({
        "conv_id": ["c"] * 3,
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "ts": pa.array([None, datetime.datetime(2024, 1, 1), None],
                       pa.timestamp("us")),
        "text": ["start", None, " end"],
    })
    out = merge_segments(t).sort_by("turn_idx")
    # a null body can't prove it's a continuation -> starts a segment
    # (is_first fill_null=True); within a segment a null body joins as ''
    # and still counts as a line; a null first-row ts survives as the
    # envelope (skip_nulls=False first)
    assert out["n_lines"].to_pylist() == [1, 2]
    assert out["text"].to_pylist() == ["start", "\n end"]
    assert out["ts"].to_pylist() == [None,
                                     datetime.datetime(2024, 1, 1)]
