"""K-means (iterative algorithm / IVF quantizer) + sink compaction tests."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from opentelemetry_collector_contrib_ray.stages.cluster import (
    kmeans_assign,
    kmeans_fit,
)
from opentelemetry_collector_contrib_ray.state.compact import (
    compact_sink_dirs,
)

SF = "/root/testdata/sf0.001"


def _blobs():
    """Three well-separated direction clusters."""
    rng = np.random.default_rng(7)
    base = np.eye(3)
    rows = []
    for c in range(3):
        for _ in range(40):
            v = base[c] + rng.normal(0, 0.05, 3)
            rows.append(list(v))
    return pa.table({
        "vec_id": pa.array(range(120), pa.int64()),
        "embedding": pa.array(rows, pa.list_(pa.float64())),
    })


def test_kmeans_recovers_separated_clusters():
    ds = ray.data.from_arrow(_blobs())
    fit = kmeans_fit(ds, 3, max_iters=10)
    assert fit["iters"] <= 10 and fit["inertia"] < 1.0
    out = kmeans_assign(ray.data.from_arrow(_blobs()), fit["centroids"]) \
        .to_pandas()
    # each true cluster maps to exactly one label
    for c in range(3):
        labels = set(out["cluster"][c * 40:(c + 1) * 40])
        assert len(labels) == 1
    assert out["cluster"].nunique() == 3


def test_kmeans_deterministic():
    a = kmeans_fit(ray.data.from_arrow(_blobs()), 3)
    b = kmeans_fit(ray.data.from_arrow(_blobs()), 3)
    assert np.allclose(a["centroids"], b["centroids"])
    assert a["inertia"] == b["inertia"]


def test_kmeans_on_real_embeddings():
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    fit = kmeans_fit(ds, 8, max_iters=5)
    assigned = kmeans_assign(
        ray.data.read_parquet(f"{SF}/embeddings.parquet",
                              columns=["vec_id", "embedding"]),
        fit["centroids"]).to_pandas()
    assert assigned["cluster"].between(0, 7).all()
    assert assigned["cluster"].nunique() >= 2


def test_compact_sink_dirs(tmp_path):
    d = tmp_path / "sink=errors"
    d.mkdir(parents=True)
    t = pa.table({"x": list(range(100))})
    for i in range(6):
        pq.write_table(t.slice(i * 10, 10), str(d / f"f{i}.parquet"))
    before = sorted(os.listdir(d))
    assert len(before) == 6
    res = compact_sink_dirs(str(tmp_path), target_mb=256)
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) == 1 and res[str(d)] == 6
    merged = pq.read_table(str(d / files[0]))
    assert sorted(merged["x"].to_pylist()) == list(range(60))
    # idempotent: second run is a no-op
    assert compact_sink_dirs(str(tmp_path)) == {}


def test_compact_respects_target_size(tmp_path):
    d = tmp_path / "sink=x"
    d.mkdir(parents=True)
    big = pa.table({"x": pa.array(np.random.default_rng(1)
                                  .standard_normal(200_000))})
    for i in range(4):
        pq.write_table(big, str(d / f"f{i}.parquet"))
    one = os.path.getsize(str(d / "f0.parquet"))
    # target fits two inputs per group (2 x one <= target < 3 x one)
    compact_sink_dirs(str(tmp_path),
                      target_mb=int(2.5 * one / (1 << 20)) + 1)
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) == 2


def test_image_resizer_and_video_frame_sampler(ray_session):
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        ImageResizer,
        VideoFrameSampler,
        media_batch_size,
        synth_media_table,
    )

    t = synth_media_table(16)
    bs = media_batch_size(1024)
    ds = ray.data.from_arrow(t)
    resized = ds.map_batches(ImageResizer, fn_constructor_args=(64, 64, True),
                             batch_format="pyarrow", batch_size=bs,
                             concurrency=(1, 2)).to_pandas()
    assert len(resized) == 16
    assert set(resized.width) == {64} and set(resized.height) == {64}
    # deterministic fake resize
    r2 = ImageResizer(64, 64, True)(t.slice(0, 4))
    assert r2["payload"].to_pylist() == list(resized.payload[:4])

    frames = ray.data.from_arrow(t).map_batches(
        VideoFrameSampler, fn_constructor_args=(4, True),
        batch_format="pyarrow", batch_size=bs,
        concurrency=(1, 2)).to_pandas()
    assert len(frames) == 16 * 4           # 1:N explode
    g = frames[frames.media_id == frames.media_id.iloc[0]]
    assert list(g.frame_idx) == [0, 1, 2, 3]
    assert g.frame_ts_ms.is_monotonic_increasing


def test_video_frame_sampler_validates_and_handles_many_frames():
    import pytest as _pytest

    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        VideoFrameSampler,
        synth_media_table,
    )

    with _pytest.raises(ValueError, match="n_frames"):
        VideoFrameSampler(n_frames=0)
    out = VideoFrameSampler(n_frames=300, fake=True)(synth_media_table(2))
    assert out.num_rows == 600  # frame indexes past 255 no longer crash


def test_kmeans_inertia_matches_returned_centroids(ray_session):
    """result['inertia'] must describe the RETURNED centroids (review
    finding: it was the pre-update reading, so max_iters=1 reported the
    init-centroid inertia for the once-updated model)."""
    import numpy as np
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.cluster import (
        _one_pass, kmeans_fit)
    rng = np.random.default_rng(3)
    base = np.eye(3)
    vecs = np.vstack([base[i] + rng.normal(0, 0.05, (30, 3))
                      for i in range(3)])
    t = pa.table({"embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float64()))})
    ds = rd.from_arrow(t)
    fit = kmeans_fit(ds, 3, max_iters=1)
    _, _, expect = _one_pass(ds, fit["centroids"], "embedding")
    assert abs(fit["inertia"] - expect) < 1e-9
