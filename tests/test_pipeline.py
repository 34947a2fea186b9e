"""End-to-end flagship pipeline tests: routing fan-out writes, per-sink
counts, resumable manifests (SURVEY.md §3.1, §4)."""

import os

import pyarrow.dataset as pads

from opentelemetry_collector_contrib_ray.pipelines.flagship import (
    build_parsed,
    run_flagship,
)
from opentelemetry_collector_contrib_ray.sources.transcripts import (
    ensure_transcripts,
    generate_transcripts,
)
from opentelemetry_collector_contrib_ray.state.manifest import ManifestStore

SF_DIR = "/root/testdata/sf0.001"


def test_generator_deterministic():
    a = generate_transcripts(0.001)
    b = generate_transcripts(0.001)
    assert a.equals(b)
    # contiguous turn_idx per conv, monotone ts
    assert a["turn_idx"].to_pylist()[:3] == [0, 1, 2]


def test_build_parsed_schema_and_rows():
    ds = build_parsed(SF_DIR)
    t = ds.limit(100).to_pandas()
    for c in ["conv_id", "turn_idx", "template", "severity_number",
              "severity_text", "service", "resource", "sink",
              "severity_bucket"]:
        assert c in t.columns
    assert set(t["sink"]) <= {"errors", "tool-calls", "user-turns", "default"}


def test_run_flagship_and_resume(tmp_path):
    out = str(tmp_path / "out")
    s1 = run_flagship(SF_DIR, out)
    assert s1["rows_in"] > 0 and not s1["skipped"]
    assert set(s1["sink_counts"]) == {"errors", "tool-calls", "user-turns",
                                      "default"}

    # written rows across sinks == rows_in, and every sink dir exists
    dset = pads.dataset(os.path.join(out, "parts"), partitioning="hive")
    assert dset.count_rows() == s1["rows_in"]

    # resume: everything skipped, same totals
    s2 = run_flagship(SF_DIR, out)
    assert len(s2["skipped"]) == s2["partitions"]
    assert s2["sink_counts"] == s1["sink_counts"]
    assert s2["wall_time_sec"] < s1["wall_time_sec"]

    # lineage manifests carry per-partition metrics
    store = ManifestStore(out)
    ms = store.all()
    assert sum(m.rows_in for m in ms) == s1["rows_in"]
    assert all(m.wall_time_sec >= 0 for m in ms)


def test_partial_resume_recovers_missing_partition(tmp_path):
    out = str(tmp_path / "out")
    s1 = run_flagship(SF_DIR, out)
    store = ManifestStore(out)
    victim = store.all()[0].partition_id
    os.remove(os.path.join(out, "_lineage", f"part-{victim}.json"))
    s2 = run_flagship(SF_DIR, out)
    assert len(s2["skipped"]) == s2["partitions"] - 1
    assert s2["sink_counts"] == s1["sink_counts"]


def test_transcript_cache_reused():
    p1 = ensure_transcripts(SF_DIR)
    p2 = ensure_transcripts(SF_DIR)
    assert p1 == p2 and os.path.isdir(p1)
