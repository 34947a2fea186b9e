"""Gap-based sessionization tests (groupbytrace/tailsampling batch
analogue, SURVEY.md §2.11)."""

import datetime

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.sessionize import sessionize


def _t(rows):
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([datetime.datetime(2026, 1, 1) +
                        datetime.timedelta(minutes=r[1]) for r in rows],
                       pa.timestamp("us")),
    })


def test_sessions_split_on_gap():
    t = _t([(1, 0), (1, 10), (1, 20), (1, 120), (1, 125), (2, 5), (2, 200)])
    out = sessionize(ray.data.from_arrow(t), key_col="user_id",
                     gap="30m").to_pandas().sort_values(
        ["user_id", "session_idx"], ignore_index=True)
    assert out["n_events"].tolist() == [3, 2, 1, 1]
    assert out["session_idx"].tolist() == [0, 1, 0, 1]
    assert out.loc[0, "session_end"].minute == 20


def test_exact_gap_boundary_included():
    # gap == threshold stays in the session (strict > splits)
    t = _t([(1, 0), (1, 30), (1, 61)])
    out = sessionize(ray.data.from_arrow(t), key_col="user_id",
                     gap="30m").to_pandas()
    assert sorted(out["n_events"].tolist()) == [1, 2]


def test_single_event_sessions_and_unordered_input():
    t = _t([(1, 100), (1, 0)])  # out of order
    out = sessionize(ray.data.from_arrow(t), key_col="user_id",
                     gap="10m").to_pandas()
    assert len(out) == 2 and (out["n_events"] == 1).all()


def test_sessionize_drops_null_timestamps(ray_session):
    import datetime

    import ray.data

    from opentelemetry_collector_contrib_ray.stages.sessionize import (
        sessionize,
    )

    base = datetime.datetime(2024, 1, 1)
    t = pa.table({
        "user_id": ["u"] * 3,
        "ts": pa.array([base, None, base + datetime.timedelta(minutes=5)],
                       pa.timestamp("us")),
    })
    out = sessionize(ray.data.from_arrow(t), key_col="user_id",
                     gap="30m", n_parts=2).to_pandas()
    assert len(out) == 1 and int(out.n_events.iloc[0]) == 2


def test_sessionize_pre_grouped_matches_shuffle(ray_session, tmp_path):
    """pre_grouped (key-contained blocks) returns the same sessions as
    the shuffle plan, across MULTIPLE blocks (read_file_blocks entry)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.sources.grouped import (
        read_file_blocks)
    US = 1_000_000
    pq.write_table(pa.table({
        "k": ["a", "a", "a"],
        "ts": pa.array([0, 10 * US, 4000 * US], pa.timestamp("us")),
    }), str(tmp_path / "f0.parquet"))
    pq.write_table(pa.table({
        "k": ["b", "c"],
        "ts": pa.array([0, 5000 * US], pa.timestamp("us")),
    }), str(tmp_path / "f1.parquet"))
    ds = read_file_blocks(str(tmp_path))
    a = sessionize(ds, key_col="k", gap="30m",
                   n_parts=4).to_pandas().sort_values(
        ["k", "session_idx"]).reset_index(drop=True)
    b = sessionize(ds, key_col="k", gap="30m",
                   pre_grouped=True).to_pandas().sort_values(
        ["k", "session_idx"]).reset_index(drop=True)
    assert a.equals(b) and len(a) == 4


def test_sessionize_normalizes_timestamp_unit(ray_session):
    """A ms-unit ts column: 40-minute-apart events split at gap=30m and
    the emitted session bounds are true instants, not 1000x-compressed."""
    import pyarrow as pa
    t = pa.table({
        "k": ["a", "a"],
        "ts": pa.array([0, 2_400_000], pa.timestamp("ms")),
    })
    out = sessionize(ray.data.from_arrow(t), key_col="k", gap="30m",
                     n_parts=2).to_pandas().sort_values(
        "session_idx").reset_index(drop=True)
    assert len(out) == 2
    assert out["session_start"][1].timestamp() == 2400.0
