"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool map_batches stages.

Decode strategy (probe order, once per actor):
1. PIL / cv2 when importable (not in this container, probed at init);
2. built-in pure-stdlib codecs — PNG (zlib inflate + scanline unfilter)
   and WAV (RIFF 16-bit PCM) — REAL decodes with zero dependencies;
3. ``fake=True`` (deterministic digest-derived features) for formats
   neither path covers (JPEG/MP4 etc. without libs), keeping the
   Ray-side plumbing testable.
Video frame EXTRACTION stays stubbed (no ffmpeg in any fallback).

Memory design: binary payloads can be MBs each, so these stages run with an
explicit small ``batch_size`` (payload_bytes x batch_size x concurrency must
fit worker heap) — callers size it via ``media_batch_size()``.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa


def _try_pil():
    try:
        from PIL import Image  # noqa: F401 — optional dep probe
        return Image
    except ImportError:
        return None


# ---------------------------------------------------------------------------
# built-in codecs (pure stdlib): PNG 8-bit non-interlaced, WAV 16-bit PCM
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Real PNG decode (8-bit, non-interlaced, color types 0/2/4/6): chunk
    walk -> zlib inflate -> per-scanline unfilter (all 5 filter types) ->
    (h, w, channels) uint8 array. Small-image oriented (the unfilter is a
    per-row loop); library decoders take over when present."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = hdr
    ch = _PNG_CHANNELS.get(color)
    if depth != 8 or interlace or ch is None:
        raise ValueError("builtin decoder supports 8-bit non-interlaced "
                         "gray/rgb/alpha PNGs only")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint16)
    for y in range(h):
        f, cur = rows[y, 0], rows[y, 1:].astype(np.uint16)
        up = out[y - 1] if y else np.zeros(stride, np.uint16)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + up) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left recursion
            rec = np.zeros(stride, np.uint16)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = up[x]
                if f == 1:
                    v = cur[x] + a
                elif f == 3:
                    v = cur[x] + ((a + b) >> 1)
                else:
                    c = out[y - 1][x - ch] if (x >= ch and y) else 0
                    p = int(a) + int(b) - int(c)
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) \
                        else (b if pb_ <= pc_ else c)
                    v = cur[x] + pred
                rec[x] = v & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
    return out.astype(np.uint8).reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """Real PNG encode (filter 0 scanlines, one IDAT) for (h, w, ch)
    uint8 arrays — the resize stage's output codec."""
    a = np.ascontiguousarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + typ + body + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scan = np.concatenate([np.zeros((h, 1), np.uint8),
                           a.reshape(h, w * ch)], axis=1)
    return PNG_SIG + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(scan.tobytes(), 6)) + \
        chunk(b"IEND", b"")


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Real WAV decode (RIFF, 16-bit PCM): -> ((n, channels) int16
    samples, sample rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, ln = data[pos:pos + 4], struct.unpack(
            "<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, nch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError("builtin decoder supports 16-bit PCM only")
    n = len(raw) // (2 * nch)
    return np.frombuffer(raw[:n * 2 * nch], "<i2").reshape(n, nch), rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Real WAV encode (16-bit PCM) for test fixtures."""
    s = np.ascontiguousarray(samples, "<i2")
    if s.ndim == 1:
        s = s[:, None]
    nch = s.shape[1]
    body = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * 2 * nch, 2 * nch, 16)
    return b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE" + \
        b"fmt " + struct.pack("<I", 16) + fmt + \
        b"data" + struct.pack("<I", len(body)) + body

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
    payload digest; real mode decodes via PIL when importable (probed
    ONCE in __init__ — actor-pool state rule), else the built-in PNG
    codec; non-PNG payloads without a library raise NotImplementedError.
    """

    FEATURE_DIM = 8

    def __init__(self, fake: bool = True):
        self.fake = fake
        self.pil = None if fake else _try_pil()

    def _decode_pixels(self, payload: bytes) -> np.ndarray:
        if self.pil is not None:
            import io
            img = np.asarray(self.pil.open(io.BytesIO(payload)))
            return img[:, :, None] if img.ndim == 2 else img
        if payload.startswith(PNG_SIG):
            return decode_png(payload)
        raise NotImplementedError(
            "real decode for non-PNG payloads needs PIL/cv2 — not "
            "available here; run with fake=True for plumbing tests")

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            px = self._decode_pixels(payload).astype(np.float64) / 255.0
            h, w, ch = px.shape
            chan = [px[:, :, i].mean() for i in range(min(ch, 3))]
            chan += [0.0] * (3 - len(chan))
            return np.array([h / 65535.0, w / 65535.0, ch / 4.0,
                             px.mean(), px.std(), *chan])
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
        out_vals = []
        for p in batch["payload"].to_pylist():
            p = p or b"\x00"
            if not self.fake:
                # real path: 16-bit PCM WAV -> mono -> per-window
                # mean absolute amplitude in [0, 1]
                samples, _rate = decode_wav(p)
                mono = np.abs(samples.astype(np.float64)).mean(axis=1)
                chunks = np.array_split(mono, self.n_frames)
                out_vals.append([float(c.mean()) / 32768.0 if len(c)
                                 else 0.0 for c in chunks])
                continue
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
        self.pil = None if fake else _try_pil()

    def _resize_one(self, payload: bytes) -> bytes:
        if self.pil is not None:
            import io
            img = self.pil.open(io.BytesIO(payload)) \
                .resize((self.target_w, self.target_h))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()
        px = decode_png(payload)  # raises for non-PNG without a lib
        h, w, _ = px.shape
        ys = np.minimum((np.arange(self.target_h) * h) // self.target_h,
                        h - 1)
        xs = np.minimum((np.arange(self.target_w) * w) // self.target_w,
                        w - 1)
        return encode_png(px[ys][:, xs])

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            resized = [self._resize_one(p or b"")
                       for p in batch["payload"].to_pylist()]
            return pa.table({
                "media_id": batch["media_id"],
                "payload": pa.array(resized, pa.large_binary()),
                "width": pa.array([self.target_w] * batch.num_rows,
                                  pa.int32()),
                "height": pa.array([self.target_h] * batch.num_rows,
                                   pa.int32()),
            })
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


def synth_real_media_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic media table whose payloads are REAL encoded files
    (PNG via encode_png, WAV via encode_wav) so the real decode paths are
    exercised without any image/audio library."""
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
            "width": [], "height": [], "duration_ms": []}
    for i in range(n):
        if i % 2 == 0:
            w, h = 4 + int(rng.integers(0, 12)), 3 + int(rng.integers(0, 9))
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rows["payload"].append(encode_png(px))
            rows["kind"].append("image")
            rows["mime"].append("image/png")
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(None)
        else:
            ns = 400 + int(rng.integers(0, 400))
            samples = rng.integers(-2000, 2000, ns, dtype=np.int16)
            rows["payload"].append(encode_wav(samples, 8000))
            rows["kind"].append("audio")
            rows["mime"].append("audio/wav")
            rows["width"].append(None)
            rows["height"].append(None)
            rows["duration_ms"].append(ns * 1000 // 8000)
        rows["media_id"].append(i)
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "kind": pa.array(rows["kind"], pa.string()),
        "payload": pa.array(rows["payload"], pa.large_binary()),
        "mime": pa.array(rows["mime"], pa.string()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
    }, schema=MEDIA_SCHEMA)


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
