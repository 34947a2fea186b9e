"""Deterministic synthetic transcript table (FIXTURES.md F1, seed=42).

Input shape per BASELINE.json input_hint:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

The ``text`` payloads round-robin the template families that exercise every
parser the reference ships (FIXTURES.md F1a): apache/grok common-log,
key=value, JSON body, syslog RFC5424, multiline traceback pairs, and plain
text (the on_error=send passthrough path). This mirrors the reference's
``generate`` stanza input operator (pkg/stanza/operator/input/generate) used
as a deterministic synthetic source in its tests.

Conversation lengths are Zipf-skewed and a few conv_ids are made hot on
purpose so skew handling (salted repartition) is testable.

Scale: ~6M turns at sf=1 (matches lineitem's 6M rows/sf). Generation is
vectorized numpy + bounded per-template Python joins; the table is cached as
Parquet under /tmp and reused (atomic rename, safe under concurrency).
"""

from __future__ import annotations

import os
import re
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..model import ROLES, TRANSCRIPT_SCHEMA

CACHE_ROOT = "/tmp/otelray_transcripts"
TURNS_PER_SF = 6_000_000
MEAN_TURNS_PER_CONV = 30

_LEVELS = ["debug", "info", "warn", "error", "err", "fatal", "warning", "trace"]
_JSON_SEVS = ["DEBUG", "INFO", "WARN", "ERROR", "FATAL"]
_METHODS = ["GET", "POST", "PUT", "DELETE"]
_STATUSES = [200, 200, 201, 204, 301, 302, 400, 404, 429, 500, 503]
_USERS = ["alice", "bob", "carol", "dave", "-"]
_MSGS = ["tool call failed", "ok", "retrying request", "cache miss",
         "rate limited", "completed"]
_PLAIN = ["tool finished ok in 12ms", "user asked a question",
          "assistant responded with a plan", "no structured content here",
          "model produced final answer", "session resumed"]
_TOOLS4 = ["bash", "search", "browser", "editor"]


def sf_from_dir(sf_dir: str) -> float:
    """Parse scale factor from a testdata dir name like '/root/testdata/sf0.01'."""
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.01


def transcripts_path(sf_dir: str) -> str:
    """Directory of part files — one file per resumable input partition."""
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    return os.path.join(CACHE_ROOT, base, "transcripts")


def conv_lengths(sf: float, rng: np.random.Generator) -> np.ndarray:
    """Zipf-ish turn counts per conversation, plus 3 forced-hot conversations."""
    target = max(64, int(TURNS_PER_SF * sf))
    n_convs = max(4, target // MEAN_TURNS_PER_CONV)
    lengths = 4 + rng.geometric(1.0 / (MEAN_TURNS_PER_CONV - 4), n_convs)
    lengths = np.clip(lengths, 4, 600)
    hot = max(32, int(0.02 * target))  # ~2% of all turns each -> skewed keys
    lengths[: min(3, n_convs)] = hot
    return lengths.astype(np.int64)


def generate_transcripts(sf: float, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    lengths = conv_lengths(sf, rng)
    n_convs, total = len(lengths), int(lengths.sum())

    starts = np.cumsum(lengths) - lengths
    conv_ord = np.repeat(np.arange(n_convs, dtype=np.int64), lengths)
    turn_idx = (np.arange(total, dtype=np.int64) - np.repeat(starts, lengths))

    conv_names = np.array([f"conv-{i:08d}" for i in range(n_convs)], dtype=object)
    conv_id = conv_names[conv_ord]
    role = np.array(ROLES, dtype=object)[turn_idx % 4]

    tool = np.full(total, "", dtype=object)
    tool_mask = (role == "assistant") | (role == "tool")
    tool[tool_mask] = np.array(_TOOLS4, dtype=object)[
        ((conv_ord + turn_idx) % 4)[tool_mask]]

    # monotone per conversation; us precision, base 2026-01-01T00:00:00Z
    base_us = np.int64(1_767_225_600_000_000)
    ts = base_us + conv_ord * np.int64(3_600_000_000) + turn_idx * np.int64(7_000_000)

    tmpl = (turn_idx % 7).astype(np.int64)
    r1 = rng.integers(0, 1_000_000, total)
    r2 = rng.integers(0, 1_000_000, total)

    text = np.empty(total, dtype=object)

    m = tmpl == 0  # apache common log
    if m.any():
        a, b = r1[m], r2[m]
        ips = a % 250
        users = np.array(_USERS, dtype=object)[a % len(_USERS)]
        days, hh = (b % 28) + 1, b % 24
        meth = np.array(_METHODS, dtype=object)[b % 4]
        stat = np.array(_STATUSES)[a % len(_STATUSES)]
        nbytes = (b % 9000) + 100
        text[m] = [
            f'203.0.113.{i} - {u} [{d:02d}/Feb/2026:{h:02d}:26:12 +0000] '
            f'"{me} /api/v1/items?q={q % 97} HTTP/1.1" {s} {nb}'
            for i, u, d, h, me, q, s, nb in zip(ips, users, days, hh, meth, a, stat, nbytes)
        ]

    m = tmpl == 1  # key=value
    if m.any():
        a, b = r1[m], r2[m]
        lev = np.array(_LEVELS, dtype=object)[a % len(_LEVELS)]
        msg = np.array(_MSGS, dtype=object)[b % len(_MSGS)]
        tl = np.array(_TOOLS4, dtype=object)[a % 4]
        text[m] = [
            f'level={L} code=E{c % 100:02d} latency_ms={ms % 5000} msg="{mg}" tool={t}'
            for L, c, ms, mg, t in zip(lev, a, b, msg, tl)
        ]

    m = tmpl == 2  # JSON body
    if m.any():
        a, b = r1[m], r2[m]
        sev = np.array(_JSON_SEVS, dtype=object)[a % len(_JSON_SEVS)]
        retry = np.array(["true", "false"], dtype=object)[b % 2]
        text[m] = [
            f'{{"severity":"{s}","error":{{"code":"E{c % 10}","retryable":{r}}},'
            f'"dur":"{d % 10}.{d % 7}s","spans":[1,2]}}'
            for s, c, r, d in zip(sev, a, retry, b)
        ]

    m = tmpl == 3  # syslog RFC5424
    if m.any():
        a, b = r1[m], r2[m]
        pri = a % 192
        tl = np.array(_TOOLS4, dtype=object)[b % 4]
        text[m] = [
            f'<{p}>1 2026-01-{(d % 27) + 1:02d}T22:14:15.003Z host{h % 20} '
            f'app{ap % 8} {1000 + (p2 % 9000)} ID{mi % 100} - tool={t} rc={rc % 3}'
            for p, d, h, ap, p2, mi, t, rc in zip(pri, b, a, b, a, b, tl, a)
        ]

    m = tmpl == 4  # traceback head (multiline pair with tmpl==5)
    text[m] = "Traceback (most recent call last):"

    m = tmpl == 5  # traceback continuation (leading whitespace = not-first-entry)
    if m.any():
        a = r1[m]
        text[m] = [f'  File "app.py", line {n % 500}, in run_step' for n in a]

    m = tmpl == 6  # plain passthrough
    if m.any():
        text[m] = np.array(_PLAIN, dtype=object)[r1[m] % len(_PLAIN)]

    return pa.Table.from_arrays(
        [pa.array(conv_id, pa.string()),
         pa.array(turn_idx.astype(np.int32)),
         pa.array(role, pa.string()),
         pa.array(text, pa.string()),
         pa.array(tool, pa.string()),
         pa.array(ts, pa.timestamp("us"))],
        schema=TRANSCRIPT_SCHEMA)


def ensure_transcripts(sf_dir: str) -> str:
    """Generate-and-cache the transcript Parquet dir for a testdata dir.

    Writes N part files split on conversation boundaries — the resumable
    input-partition unit (SURVEY.md §4). Written atomically (temp dir +
    rename) so concurrent callers and resumed runs are safe. Row groups
    (~64k rows, for read parallelism) are ALSO snapped to conversation
    boundaries — useful for row-group-granular readers, but NOT a block
    containment guarantee: `read_parquet` re-splits output blocks at
    arbitrary rows (measured in BASELINE.md), and a cache written by an
    older version may have unaligned row groups. Stages that need
    conversation-contained blocks (`recombine_blocks`,
    `tail_sample`/`sessionize` `pre_grouped=True`) must read through
    `sources.grouped.read_file_blocks` — the FILE split is the contract.
    """
    path = transcripts_path(sf_dir)
    if os.path.isdir(path) and os.listdir(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = generate_transcripts(sf_from_dir(sf_dir))
    n_files = int(min(16, max(4, table.num_rows // 200_000 + 4)))
    tmp = tempfile.mkdtemp(dir=os.path.dirname(path))
    try:
        # split on conversation boundaries so a partition holds whole convs;
        # rows are generated in conv order, so boundaries = first index of
        # each distinct conv_id (np.unique on the dictionary codes).
        conv = table["conv_id"].combine_chunks()
        codes = conv.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        _, conv_starts = np.unique(codes, return_index=True)
        cut_ids = np.linspace(0, len(conv_starts), n_files + 1).astype(int)
        offsets = [0] + [int(conv_starts[c]) for c in cut_ids[1:-1]] + [table.num_rows]
        for i in range(n_files):
            part = table.slice(offsets[i], offsets[i + 1] - offsets[i])
            local = conv_starts[(conv_starts > offsets[i])
                                & (conv_starts < offsets[i + 1])] \
                - offsets[i]
            fname = os.path.join(tmp, f"part-{i:04d}.parquet")
            with pq.ParquetWriter(fname, part.schema) as w:
                pos = 0
                while pos < part.num_rows:
                    j = np.searchsorted(local, pos + 65536, side="left")
                    nxt = int(local[j]) if j < len(local) \
                        else part.num_rows
                    w.write_table(part.slice(pos, nxt - pos))
                    pos = nxt
        if not os.path.exists(path):
            try:
                os.replace(tmp, path)
            except OSError:
                # lost the race: another generator already installed the
                # (identical, deterministic) output — adopt it
                if not os.path.isdir(path):
                    raise
    finally:
        if os.path.exists(tmp) and tmp != path:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    return path
