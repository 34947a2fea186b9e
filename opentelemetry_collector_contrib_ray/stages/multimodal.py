"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool map_batches stages.

The image/audio decode libraries are NOT in this container, so the decode
kernels are STUBS behind ``fake=True`` (deterministic feature extraction from
the raw bytes) or ``NotImplementedError`` (real decode). Everything Ray-side
— schema, batch sizing, actor signature, output layout — is real and tested,
so swapping a real decoder in changes one function body.

Memory design: binary payloads can be MBs each, so these stages run with an
explicit small ``batch_size`` (payload_bytes x batch_size x concurrency must
fit worker heap) — callers size it via ``media_batch_size()``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.large_binary()),  # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),           # typed metadata (nullable per kind)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def media_batch_size(avg_payload_bytes: int, worker_heap_bytes: int = 2 << 30,
                     concurrency: int = 8, safety: int = 4) -> int:
    """Batch rows so payload x batch x concurrency stays well under heap."""
    per_worker = worker_heap_bytes // (concurrency * safety)
    return max(1, per_worker // max(1, avg_payload_bytes))


class ImageDecoder:
    """Actor-pool stage: decode image payloads -> (height, width, feature
    vector). ``fake=True`` derives a deterministic 8-dim feature from the
    payload digest; real mode requires an image lib (not in this container).
    """

    FEATURE_DIM = 8

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real image decode needs PIL/cv2 — not available here; "
                "run with fake=True for plumbing tests")
        digest = hashlib.sha256(payload).digest()
        return np.frombuffer(digest[:self.FEATURE_DIM * 4], np.uint32) \
            .astype(np.float64) / np.iinfo(np.uint32).max

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._decode_one(p or b"") for p in payloads]) \
            if payloads else np.empty((0, self.FEATURE_DIM))
        flat = pa.array(feats.ravel(), pa.float64())
        return pa.table({
            "media_id": batch["media_id"],
            "feature": pa.FixedSizeListArray.from_arrays(flat, self.FEATURE_DIM),
            "payload_bytes": pa.array(
                [len(p or b"") for p in payloads], pa.int64()),
        })


class AudioFrameSampler:
    """Actor-pool stage: sample N evenly spaced 'frames' (byte windows) from
    each audio payload — the frame-sampling layout for real audio featurizers.
    Deterministic in fake mode (byte-window means)."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real audio decode not available here")
        out_vals = []
        for p in batch["payload"].to_pylist():
            p = p or b"\x00"
            arr = np.frombuffer(p, np.uint8)
            chunks = np.array_split(arr, self.n_frames)
            out_vals.append([float(c.mean()) if len(c) else 0.0
                             for c in chunks])
        flat = pa.array(np.array(out_vals, np.float64).ravel(), pa.float64())
        return pa.table({
            "media_id": batch["media_id"],
            "frames": pa.FixedSizeListArray.from_arrays(flat, self.n_frames),
        })


class ImageResizer:
    """Actor-pool stage: resize image payloads to (target_w, target_h).
    Real mode needs an image lib; fake mode emits a deterministic
    resized-payload digest + the target dims so downstream schema/layout
    are exercised end-to-end. Rows fan out unchanged (1:1)."""

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 fake: bool = True):
        self.target_w, self.target_h = target_w, target_h
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real image resize needs PIL/cv2 — not available here")
        resized = [hashlib.sha256(
            (p or b"") + bytes([self.target_w % 256, self.target_h % 256])
        ).digest() for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "payload": pa.array(resized, pa.large_binary()),
            "width": pa.array([self.target_w] * batch.num_rows, pa.int32()),
            "height": pa.array([self.target_h] * batch.num_rows, pa.int32()),
        })


class VideoFrameSampler:
    """Actor-pool stage: sample n_frames at uniform timestamps from each
    video payload and EXPLODE to one row per frame (media_id, frame_idx,
    frame_ts_ms, frame feature) — the 1:N layout real video pipelines need
    (frame rows then flow through the image stages). Decode is stubbed;
    timestamps come from the duration_ms metadata column."""

    FEATURE_DIM = 8

    def __init__(self, n_frames: int = 4, fake: bool = True):
        if not 1 <= n_frames <= 65535:
            raise ValueError("n_frames must be in [1, 65535]")
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real video decode needs ffmpeg/cv2 — not available here")
        ids, idxs, ts_out, feats = [], [], [], []
        if "duration_ms" in batch.column_names:
            dur = batch["duration_ms"].to_pylist()
        else:
            dur = [None] * batch.num_rows
        for mid, p, d in zip(batch["media_id"].to_pylist(),
                             batch["payload"].to_pylist(), dur):
            p = p or b"\x00"
            d = d or 0
            for f in range(self.n_frames):
                ids.append(mid)
                idxs.append(f)
                ts_out.append(int(d * f / max(1, self.n_frames - 1))
                              if self.n_frames > 1 else 0)
                digest = hashlib.sha256(p + f.to_bytes(2, "big")).digest()
                feats.append(np.frombuffer(
                    digest[:self.FEATURE_DIM * 4], np.uint32)
                    .astype(np.float64) / np.iinfo(np.uint32).max)
        flat = pa.array(np.concatenate(feats) if feats else
                        np.empty(0, np.float64), pa.float64())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_ts_ms": pa.array(ts_out, pa.int64()),
            "feature": pa.FixedSizeListArray.from_arrays(
                flat, self.FEATURE_DIM),
        })


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA (payload bytes
    derived from the row id, so tests and fake decodes are reproducible)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
        "payload": pa.array(
            [hashlib.sha256(f"media-{i}".encode()).digest() *
             (1 + int(rng.integers(1, 8))) for i in range(n)],
            pa.large_binary()),
        "mime": pa.array(["image/png" if i % 3 == 0 else "audio/wav"
                          if i % 3 == 1 else "video/mp4" for i in range(n)]),
        "width": pa.array([64 if i % 3 == 0 else None for i in range(n)],
                          pa.int32()),
        "height": pa.array([48 if i % 3 == 0 else None for i in range(n)],
                           pa.int32()),
        "duration_ms": pa.array([None if i % 3 == 0 else 1000 + i
                                 for i in range(n)], pa.int32()),
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)
