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
    # a null body does not match ^\S -> it CONTINUES the open entry (the
    # reference regex can't match nil; the SQL oracle's regexp_matches
    # yields NULL -> not-first); it joins as '' and still counts as a
    # line; a null first-row ts survives as the envelope
    # (skip_nulls=False first)
    assert out["n_lines"].to_pylist() == [3]
    assert out["text"].to_pylist() == ["start\n\n end"]
    assert out["ts"].to_pylist() == [None]


# ---------------------------------------------------------------------------
# Reference case replay — pkg/stanza/operator/transformer/recombine/
# transformer_test.go TestTransformer, transcribed to the batch model.
# Streaming-only cases (force-flush timeout, max_batch_size, max_sources,
# max_log_size) are out of batch scope — DIVERGENCES.md item 7.
# ---------------------------------------------------------------------------

T1 = 1586640841_000_000  # 2020-04-11T21:34:01Z in us
T2 = 1586640842_000_000


def _ref_tbl(rows, cols=("src", "idx", "ts", "body")):
    data = {c: [r[i] for r in rows] for i, c in enumerate(cols)}
    t = {c: pa.array(v) for c, v in data.items()}
    t["ts"] = pa.array(data["ts"], pa.timestamp("us"))
    return pa.table(t)


def _merge(t, **kw):
    kw.setdefault("source_col", "src")
    kw.setdefault("order_col", "idx")
    kw.setdefault("body_col", "body")
    return merge_segments(t, **kw)


def test_ref_two_entries_last():
    # transformer_test.go "TwoEntriesLast": IsLastEntry body == 'test2'
    t = _ref_tbl([("s", 0, T1, "test1"), ("s", 1, T2, "test2")])
    out = _merge(t, is_last_re="^test2$")
    assert out["body"].to_pylist() == ["test1\ntest2"]
    assert out["ts"].to_pylist()[0].timestamp() == T1 / 1e6  # oldest


def test_ref_three_entries_first_newest_keeps_envelope_attrs():
    # "ThreeEntriesFirstNewest": IsFirstEntry body == 'test1',
    # overwrite_with newest — the newest row's whole entry survives,
    # including its attributes
    t = _ref_tbl([("s", 0, T1, "test1", "false"),
                  ("s", 1, T2, "test2", "true"),
                  ("s", 2, T2, "test1", "false")],
                 cols=("src", "idx", "ts", "body", "base"))
    out = _merge(t, is_first_re="^test1$", overwrite_with="newest",
                 keep_cols=["base"])
    assert out["body"].to_pylist() == ["test1\ntest2", "test1"]
    assert out["base"].to_pylist() == ["true", "false"]
    assert out["ts"].to_pylist()[0].timestamp() == T2 / 1e6


def test_ref_three_entries_first_oldest_keeps_envelope_attrs():
    # "ThreeEntriesFirstOldest"
    t = _ref_tbl([("s", 0, T1, "test1", "true"),
                  ("s", 1, T2, "test2", "false"),
                  ("s", 2, T2, "test1", "true")],
                 cols=("src", "idx", "ts", "body", "base"))
    out = _merge(t, is_first_re="^test1$", overwrite_with="oldest",
                 keep_cols=["base"])
    assert out["body"].to_pylist() == ["test1\ntest2", "test1"]
    assert out["base"].to_pylist() == ["true", "true"]
    assert out["ts"].to_pylist()[0].timestamp() == T1 / 1e6


def test_ref_entries_non_matching_for_first_entry():
    # "EntriesNonMatchingForFirstEntry": nothing matches -> one combined
    # entry (batch = complete input; the reference needs force-flush)
    t = _ref_tbl([("s", 0, T1, "test2"), ("s", 1, T2, "test3"),
                  ("s", 2, T2, "test4")])
    out = _merge(t, is_first_re="^test1$")
    assert out["body"].to_pylist() == ["test2\ntest3\ntest4"]


def test_ref_first_entry_one_file_only():
    # "EntriesMatchingForFirstEntryOneFileOnly": source = log.file.path
    t = _ref_tbl([("file1", 0, T1, "start"), ("file1", 1, T1, "more1a"),
                  ("file1", 2, T1, "start"), ("file1", 3, T2, "more1b"),
                  ("file1", 4, T2, "start"), ("file2", 5, T2, "more2a"),
                  ("file2", 6, T2, "more2b")])
    out = _merge(t, is_first_re="^start$", overwrite_with="newest")
    assert out["body"].to_pylist() == [
        "start\nmore1a", "start\nmore1b", "start", "more2a\nmore2b"]
    assert out["src"].to_pylist() == ["file1", "file1", "file1", "file2"]


def test_ref_combine_with_empty_string():
    # "CombineWithEmptyString"
    t = _ref_tbl([("s", 0, T1, "test1"), ("s", 1, T1, "test2")])
    out = _merge(t, is_last_re="^test2$", combine_with="")
    assert out["body"].to_pylist() == ["test1test2"]


STACK = ["Log message 1",
         "Error: java.lang.Exception: Stack trace",
         "        at java.lang.Thread.dumpStack(Thread.java:1336)",
         "        at Main.demo3(Main.java:15)",
         "        at Main.demo2(Main.java:12)",
         "        at Main.demo1(Main.java:9)",
         "        at Main.demo(Main.java:6)",
         "        at Main.main(Main.java:3)",
         "Another log message"]


def test_ref_stacktrace():
    # "Stacktrace": IsFirstEntry body matches "^[^\s]"
    t = _ref_tbl([("s", i, T1, b) for i, b in enumerate(STACK)])
    out = _merge(t, is_first_re=r"^[^\s]")
    assert out["body"].to_pylist() == [
        STACK[0], "\n".join(STACK[1:8]), STACK[8]]


def test_ref_combine_other_than_condition():
    # "CombineOtherThanCondition": is_last tests body.logtag == 'F',
    # combine body.message, overwrite newest
    rows = [("s", 0, T1, "Single entry log 1", "F"),
            ("s", 1, T1, "This is a very very long line th", "P"),
            ("s", 2, T1, "at is really really long and spa", "P"),
            ("s", 3, T1, "ns across multiple log entries", "F")]
    t = _ref_tbl(rows, cols=("src", "idx", "ts", "message", "logtag"))
    out = _merge(t, body_col="message", match_col="logtag",
                 is_last_re="^F$", combine_with="",
                 overwrite_with="newest", keep_cols=["logtag"])
    assert out["message"].to_pylist() == [
        "Single entry log 1",
        "This is a very very long line that is really really long and "
        "spans across multiple log entries"]
    assert out["logtag"].to_pylist() == ["F", "F"]
