"""Deduplication operators for large-scale training-data pipelines.

These extend the reference's dedup surface (fileconsumer fingerprint dedup,
logdedupprocessor exact-class counting — SURVEY.md §2.10) with the standard
corpus-dedup family: exact, MinHash+LSH, SimHash, and n-gram Jaccard.

Scale design notes (per operator):
- exact_dedup: one hash-shuffle on the text digest; per-block partials first
  so only (digest, min_id, count) partials move, not documents.
- ngram-jaccard: shingle-join plan — explode distinct shingles, hash-shuffle
  on shingle, emit per-shingle pairs, re-shuffle on pair, compare against
  set sizes. Pair explosion is bounded by shingle document-frequency: df-cap
  drops shingles appearing in > max_df docs (stopword shingles), the
  standard guard.
- minhash_lsh: signatures via one vectorized permutation-hash matmul per
  block; candidate generation = groupby LSH band bucket (hash shuffle moves
  only (bucket, doc_id, signature) rows); verification by minhash Jaccard
  estimate, no second pass over text.
- simhash: 64-bit signature per doc; near-dup = signature pairs within
  hamming distance d, bucketed by (block_i, 16-bit chunk) per the
  Charikar/Manku-Jain-Sarma table-lookup scheme.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .aggregate import _merge_partials
from .shuffle import SINGLE_TASK_BYTES as _SINGLE_TASK_BYTES, \
    adaptive_n_parts, int_partition_ids, mix64_rows, \
    partitioned_attach, round_half_away

_log = logging.getLogger(__name__)

#: Default per-bucket member cap for LSH/simhash candidate generation and
#: default shingle document-frequency cap for the exact n-gram join. Web
#: corpora routinely contain million-member exact-dup clusters; every member
#: of such a cluster lands in the SAME bucket in EVERY band, so an uncapped
#: bucket emits O(m^2) pairs in one task (OOM/hang at 100 TB). Buckets over
#: the cap fall back to a representative STAR (each member paired with the
#: bucket's min id — O(m) pairs) which preserves dedup connectivity: the
#: oversized bucket is near-always an exact/near-exact dup cluster, so every
#: member verifies against the representative. The standard guard in
#: production MinHash dedup (cf. SlimPajama/Dolma df-capping).
DEFAULT_MAX_BUCKET = 512
DEFAULT_MAX_DF = 256


def _oversize_warn(kind: str, sizes: list[int]) -> None:
    if sizes:
        _log.warning(
            "%s: %d oversized candidate bucket(s) routed through "
            "representative-star (sizes: max=%d, total members=%d)",
            kind, len(sizes), max(sizes), sum(sizes))

# ---------------------------------------------------------------------------
# tokenize / shingle helpers (shared, vectorized via numpy over object arrays)
# ---------------------------------------------------------------------------


def _word_shingles(texts: list[str | None], k: int,
                   short_fallback: bool = True) -> list[set[str]]:
    """Distinct word-k-grams per doc. ``short_fallback`` controls docs with
    fewer than k words: True -> {whole text} (sketch ops: short dups still
    collide); False -> empty set (exact ngram-jaccard: matches the SQL
    oracle, which generates no shingles for short docs — see
    DIVERGENCES.md)."""
    out = []
    for t in texts:
        if not t:
            out.append(set())
            continue
        w = t.split(" ")
        if len(w) >= k:
            out.append({" ".join(w[i:i + k]) for i in range(len(w) - k + 1)})
        else:
            out.append({t} if short_fallback else set())
    return out


def md5_hex(texts: pa.Array) -> pa.Array:
    """md5 hex digest per string — hashing cost O(distinct) via dictionary."""
    d = pc.dictionary_encode(pc.cast(texts, pa.string()))
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    uniq = d.dictionary.to_pylist()
    dig = pa.array([None if v is None else hashlib.md5(v.encode()).hexdigest()
                    for v in uniq], pa.string())
    return pc.take(dig, d.indices)


def md5_hex_u64(texts: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(hex digest, int64 from the first 8 digest bytes) per string — the
    int64 doubles as a deterministic merge-partition hash of the digest, so
    the dedup merge can hash-partition without re-hashing strings."""
    d = pc.dictionary_encode(pc.cast(texts, pa.string()))
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    # dictionary_encode keeps nulls OUT of the dictionary (they become
    # null indices), so the None branches below never fire via the
    # dictionary — null rows surface as null takes and must be filled
    # AFTER the take: a null text keys the null group (hex stays null,
    # arrow group_by groups nulls together) and hashes to partition 0
    digs = [None if v is None else hashlib.md5(v.encode()).digest()
            for v in d.dictionary.to_pylist()]
    hexes = pa.array([None if b is None else b.hex() for b in digs],
                     pa.string())
    u64 = pa.array(
        [0 if b is None else
         int.from_bytes(b[:8], "little") & 0x7FFFFFFFFFFFFFFF
         for b in digs], pa.int64())
    return pc.take(hexes, d.indices), \
        pc.fill_null(pc.take(u64, d.indices), 0)


def _emit_group_pairs(ids: np.ndarray, starts: np.ndarray,
                      max_df: int | None, kind: str):
    """(a, b) cross-product pairs for every sorted run ids[starts[g]:
    starts[g+1]] with 2 <= size <= max_df. Vectorized per DISTINCT run
    size: one triu_indices + one broadcast add over all runs of that
    size, so cost is O(total pairs) numpy work regardless of how many
    runs there are. Returns (None, None) when no run qualifies."""
    sizes = starts[1:] - starts[:-1]
    gstarts = starts[:-1]
    if max_df is not None:
        over = sizes > max_df
        if over.any():
            _log.warning(
                "%s: dropped %d shingle(s) with df > %d (max df seen: %d)",
                kind, int(over.sum()), max_df, int(sizes[over].max()))
        sel = (sizes >= 2) & ~over
    else:
        sel = sizes >= 2
    if not sel.any():
        return None, None
    sizes, gstarts = sizes[sel], gstarts[sel]
    a_out, b_out = [], []
    for m in np.unique(sizes):
        gs = gstarts[sizes == m]
        iu0, iu1 = np.triu_indices(m, 1)
        a_out.append(ids[(gs[:, None] + iu0[None, :]).ravel()])
        b_out.append(ids[(gs[:, None] + iu1[None, :]).ravel()])
    return np.concatenate(a_out), np.concatenate(b_out)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: Dataset, text_col: str = "text",
                id_col: str = "doc_id",
                n_parts: int | None = None,
                digest: str = "md5") -> Dataset:
    """Exact dedup: one surviving row (min id) per distinct text, with copy
    count. Shuffle moves only (digest, min_id, n) partials, and the final
    merge is hash-partitioned on the digest (distinct-key cardinality is
    O(N) — a single-block fan-in would hold the whole distinct set in one
    task at 10^9 docs).

    ``digest``: 'md5' (hex string key — matches the SQL oracle; Python
    hashlib per DISTINCT value) or 'fast128' (two independent seeded
    polars 64-bit hashes packed as a binary(16) key — fully vectorized,
    no Python per value; collision odds ~n²/2^129, negligible at 10^9
    docs). Same plan either way; fast128 is the 100-TB path."""
    n_parts = n_parts or adaptive_n_parts()
    if digest not in ("md5", "fast128"):
        raise ValueError("digest must be md5|fast128")

    def partial(batch: pa.Table) -> pa.Table:
        if digest == "md5":
            key, kh = md5_hex_u64(batch[text_col])
            part = kh.to_numpy(zero_copy_only=False) % n_parts
        else:
            import polars as pl
            s = pl.from_arrow(pc.cast(
                batch[text_col].combine_chunks()
                if isinstance(batch[text_col], pa.ChunkedArray)
                else batch[text_col], pa.string()))
            if isinstance(s, pl.DataFrame):
                s = s.to_series()
            h1 = s.hash(seed=101).to_numpy().astype(np.uint64)
            h2 = s.hash(seed=202).to_numpy().astype(np.uint64)
            packed = np.empty((len(h1), 2), dtype=">u8")
            packed[:, 0], packed[:, 1] = h1, h2
            key = pa.Array.from_buffers(
                pa.binary(16), len(h1),
                [None, pa.py_buffer(packed.tobytes())])
            part = (h1 % np.uint64(n_parts)).astype(np.int64)
        t = pa.table({"dedup_key": key, "_mp": pa.array(part, pa.int64()),
                      id_col: batch[id_col]})
        out = t.group_by(["dedup_key"]).aggregate(
            [("_mp", "min"), (id_col, "min"), ([], "count_all")])
        return out.rename_columns(["dedup_key", "_mp", "_min_id", "_n"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    out = _merge_partials(partials, ["dedup_key"],
                          [("_min_id", "min"), ("_n", "sum")],
                          [id_col, "n_copies"], part_col="_mp")
    return out


# ---------------------------------------------------------------------------
# n-gram Jaccard (shingle-join plan)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds: Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.5,
                        max_df: int | None = DEFAULT_MAX_DF,
                        n_parts: int | None = None,
                        size_bytes: int | None = None) -> Dataset:
    """All pairs (a<b) whose distinct word-k-gram sets have Jaccard >=
    threshold. Exact (not sketched): |A∩B| via shingle join; per-doc set
    sizes ride as a small (id, n) Dataset attached to the pair set with two
    reduce-side hash joins — no driver-side materialization and no O(N)
    broadcast, so the plan survives 10^9-doc corpora.

    ``max_df`` (default ON): shingles appearing in more than max_df docs
    (stopword shingles — the O(d^2) pair bomb) contribute no intersection
    counts. Set sizes |A|/|B| still count every shingle, so capped results
    are a LOWER BOUND on true Jaccard — pairs held together only by
    ultra-common shingles are dropped, which is the standard guard.
    ``max_df=None`` disables (exact semantics, unsafe on skewed corpora).

    ``size_bytes`` (input on-disk size, when known): below ~32 MB the
    seven-stage shuffle plan is pure fixed cost — one task runs the
    identical shingle/pair/jaccard kernels over a single block (the
    tiny-input hybrid rule shared with connected_components and
    tail_sample). Unknown or large sizes keep the distributed plan.
    """
    n_parts = n_parts or adaptive_n_parts()

    def _distinct_doc_shingles(texts):
        """(shingle hashes, doc ordinal per hash, distinct count per doc):
        vectorized shingle hashing + within-doc dedup via one lexsort.
        The hash IS the join key — stable across workers (seeded polars
        word hashes + mix64; Python's hash() is per-process randomized),
        64-bit collision ~2^-64."""
        h, counts = doc_shingle_hashes(texts, k, short_fallback=False)
        doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        if len(h) == 0:
            return h, doc, np.zeros(len(counts), np.int64)
        order = np.lexsort((h, doc))
        hs, dcs = h[order], doc[order]
        keep = np.ones(len(hs), bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (dcs[1:] != dcs[:-1])
        hs, dcs = hs[keep], dcs[keep]
        sizes = np.bincount(dcs, minlength=len(counts)).astype(np.int64)
        return hs, dcs, sizes

    if size_bytes is not None and size_bytes <= _SINGLE_TASK_BYTES:
        def single(b: pa.Table) -> pa.Table:
            empty = pa.table({"a": pa.array([], pa.int64()),
                              "b": pa.array([], pa.int64()),
                              "jaccard": pa.array([], pa.float64())})
            if b.num_rows == 0:
                return empty
            hs, dcs, sizes = _distinct_doc_shingles(b[text_col])
            if len(hs) == 0:
                return empty
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            did = ids[dcs]
            order = np.lexsort((did, hs))
            sh, d = hs[order], did[order]
            starts = np.concatenate(
                [[0], np.nonzero(sh[1:] != sh[:-1])[0] + 1, [len(sh)]])
            a_arr, b_arr = _emit_group_pairs(d, starts, max_df,
                                             "ngram_jaccard")
            if a_arr is None:
                return empty
            pairs = np.stack([a_arr, b_arr], axis=1)
            uniq, i_cnt = np.unique(pairs, axis=0, return_counts=True)
            sidx = np.argsort(ids)
            ssizes = sizes[sidx]
            na = ssizes[np.searchsorted(ids[sidx], uniq[:, 0])]
            nb = ssizes[np.searchsorted(ids[sidx], uniq[:, 1])]
            i = i_cnt.astype(np.float64)
            j = i / (na.astype(np.float64) + nb.astype(np.float64) - i)
            keep = j >= threshold
            return pa.table({
                "a": pa.array(uniq[keep, 0], pa.int64()),
                "b": pa.array(uniq[keep, 1], pa.int64()),
                "jaccard": pa.array(round_half_away(j[keep], 6),
                                    pa.float64())})

        return ds.repartition(1).map_batches(
            single, batch_format="pyarrow", batch_size=None)

    def explode(batch: pa.Table) -> pa.Table:
        hs, dcs, _ = _distinct_doc_shingles(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = (hs & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        return pa.table({"sh": pa.array(h),
                         "sh_part": pa.array(h % n_parts),
                         id_col: pa.array(ids[dcs], pa.int64())})

    def sizes_partial(batch: pa.Table) -> pa.Table:
        _, _, sizes = _distinct_doc_shingles(batch[text_col])
        return pa.table({id_col: batch[id_col],
                         "_n": pa.array(sizes, pa.int64())})

    # (id, |set|) as a small distributed Dataset; materialized once because
    # it is consumed by two attach passes (16 B/doc in the object store —
    # never on the driver)
    sizes = ds.map_batches(sizes_partial, batch_format="pyarrow",
                           batch_size=None).materialize()

    exploded = ds.map_batches(explode, batch_format="pyarrow", batch_size=None)

    def partition_pairs(group: pa.Table) -> pa.Table:
        """All shingles of one coarse partition: sort by shingle, emit the
        per-shingle id-pair cross products. Vectorized by DISTINCT GROUP
        SIZE (<= max_df sizes, each a single broadcast over every group
        of that size) — a per-group Python loop is O(distinct shingles)
        and dominated the wall at 10^7 docs."""
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        n = group.num_rows
        if n < 2:
            return empty
        sh = group["sh"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sh))
        sh, ids = sh[order], ids[order]
        starts = np.concatenate(
            [[0], np.nonzero(sh[1:] != sh[:-1])[0] + 1, [n]])
        a_arr, b_arr = _emit_group_pairs(ids, starts, max_df,
                                         "ngram_jaccard")
        if a_arr is None:
            return empty
        return pa.table({"a": pa.array(a_arr, pa.int64()),
                         "b": pa.array(b_arr, pa.int64())})

    pair_counts = exploded.groupby("sh_part").map_groups(
        partition_pairs, batch_format="pyarrow")

    # count co-occurrences per (a,b): partial count per block, then a
    # hash-partitioned merge (pair cardinality is O(near-dup pairs) — can
    # be huge; never fan into one block)
    def pair_partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["a", "b"]).aggregate([([], "count_all")])
        out = out.rename_columns(["a", "b", "_i"])
        return out.append_column(
            "_mp", pa.array(int_partition_ids(out, ["a", "b"], n_parts)))

    partials = pair_counts.map_batches(pair_partial, batch_format="pyarrow",
                                       batch_size=None)
    inter = _merge_partials(partials, ["a", "b"], [("_i", "sum")], ["i"],
                            part_col="_mp")

    # attach |A| and |B| reduce-side (two hash-partitioned joins)
    i64 = pa.int64()
    with_na = partitioned_attach(
        inter, {"a": i64, "b": i64, "i": i64}, sizes,
        key_col="a", right_key=id_col, right_val="_n", out_name="_na",
        n_parts=n_parts)
    with_nb = partitioned_attach(
        with_na, {"a": i64, "b": i64, "i": i64, "_na": i64}, sizes,
        key_col="b", right_key=id_col, right_val="_n", out_name="_nb",
        n_parts=n_parts)

    def finalize(batch: pa.Table) -> pa.Table:
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["_na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["_nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = i / (na + nb - i)
        keep = j >= threshold
        kept = batch.filter(pa.array(keep))
        return pa.table({"a": kept["a"], "b": kept["b"],
                         "jaccard": pa.array(round_half_away(j[keep], 6))})

    return with_nb.map_batches(finalize, batch_format="pyarrow",
                               batch_size=None)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _check_bands(num_perm: int, bands: int) -> int:
    """bands must evenly divide num_perm: bands > num_perm makes every
    band a ZERO-width slice (mix64 of nothing = one constant bucket for
    all docs -> the whole corpus collapses into a single candidate
    bucket, silently); a remainder silently ignores trailing
    permutations. Both are config errors, not data conditions."""
    if bands <= 0 or bands > num_perm or num_perm % bands:
        raise ValueError(
            f"bands ({bands}) must evenly divide num_perm ({num_perm})")
    return num_perm // bands


def _perm_params(num_perm: int, seed: int = 42) -> np.ndarray:
    """ODD multipliers for the multiply family a*h mod 2^64 (odd a is a
    bijection on uint64; even a collapses low bits)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 63, num_perm, dtype=np.uint64) * 2 + 1


def minhash_signature(text: str | None, a: np.ndarray,
                      k: int = 3) -> np.ndarray:
    """Single-document reference form of MinHasher: SAME hash pipeline
    (doc_shingle_hashes word-hash + mix64) and SAME odd-multiplier multiply
    family (a_i*h mod 2^64, Dietzfelbinger — no modulo), so it reproduces
    MinHasher's signature for one text exactly (pinned by unit test)."""
    h, counts = doc_shingle_hashes(pa.array([text], pa.string()), k)
    if counts[0] == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, np.uint64)
    with np.errstate(over="ignore"):
        vals = h[None, :] * a[:, None]
    return vals.min(axis=1)


def _seg_arange(counts: np.ndarray) -> np.ndarray:
    """Concatenated 0..c-1 ranges: [0,1,2, 0,1, 0, ...] for counts [3,2,1]."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts)


_WORDHASH_SEED = 7771


def doc_shingle_hashes(texts, k: int, short_fallback: bool = True
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Fully vectorized word-k-gram shingle hashing.

    -> (hashes, counts): one uint64 hash per shingle INSTANCE (duplicates
    kept — the per-doc minimum over duplicates equals the minimum over the
    distinct set), doc-contiguous in input order, plus per-doc counts.
    Docs with < k words hash the whole text (sketch short-dup fallback);
    empty/null docs contribute 0 shingles.

    Pipeline: pc.split_pattern (C++) -> polars .hash over the flat word
    array (Rust, seeded, cross-process deterministic — verified) ->
    mix64 over k stacked word-hash columns. No Python per shingle: this
    replaced a per-distinct-shingle hashlib.md5 loop and is the multi-x
    speedup behind the minhash_sign bench.
    """
    import polars as pl

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = np.asarray(words.offsets).astype(np.int64)
    lengths = offsets[1:] - offsets[:-1]
    wh = pl.from_arrow(words.values).hash(seed=_WORDHASH_SEED) \
        .to_numpy().astype(np.uint64)
    nonempty = (~np.asarray(pc.is_null(texts))) & \
        (np.asarray(pc.fill_null(pc.utf8_length(texts), 0)) > 0)
    has_ngrams = nonempty & (lengths >= k)
    short = nonempty & (lengths < k) if short_fallback \
        else np.zeros(len(lengths), bool)
    counts = np.where(has_ngrams, lengths - k + 1,
                      np.where(short, 1, 0)).astype(np.int64)
    pos = np.cumsum(counts) - counts
    total = int(counts.sum())
    out = np.empty(total, np.uint64)
    ng_counts = counts[has_ngrams]
    if ng_counts.size:
        rel = _seg_arange(ng_counts)
        src = np.repeat(offsets[:-1][has_ngrams], ng_counts) + rel
        cols = np.stack([wh[src + j] for j in range(k)], axis=1)
        dest = np.repeat(pos[has_ngrams], ng_counts) + rel
        out[dest] = mix64_rows(cols, 99)
    if short.any():
        th = pl.from_arrow(texts).hash(seed=_WORDHASH_SEED) \
            .to_numpy().astype(np.uint64)
        out[pos[short]] = th[short]
    return out, counts


class MinHasher:
    """text -> minhash signature (fixed_size_list column).

    State (the permutation multipliers) is tiny, so prefer the plain-task
    closure form ``minhash_map_fn`` in pipelines: it fuses with the
    upstream read instead of paying actor-pool spin-up + a pool
    concurrency cap (ray-data-perf lesson: small state -> task closure).
    The class form remains for callers that want an actor pool."""

    def __init__(self, num_perm: int = 128, k: int = 3, seed: int = 42,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.a = _perm_params(num_perm, seed)
        self.num_perm, self.k = num_perm, k
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # fully vectorized: split -> seeded word hashes -> mix64 k-gram
        # shingle hashes (doc_shingle_hashes), one (num_perm x shingles)
        # permutation pass, per-doc minima via np.minimum.reduceat. No
        # Python per shingle; duplicates within a doc are harmless (min).
        h, counts = doc_shingle_hashes(batch[self.text_col], self.k)
        n_docs = len(counts)
        maxv = np.iinfo(np.uint64).max
        sigs = np.full((n_docs, self.num_perm), maxv, np.uint64)
        if len(h):
            nonempty = counts > 0
            starts = (np.cumsum(counts) - counts)[nonempty]
            # odd-multiplier multiply family (see minhash_signature), one
            # 1-D pass per permutation: measured 2x faster than chunked 2-D
            # reduceat and keeps the temp a single shingles-length vector
            tmp = np.empty((len(starts), self.num_perm), np.uint64)
            with np.errstate(over="ignore"):
                for j in range(self.num_perm):
                    tmp[:, j] = np.minimum.reduceat(self.a[j] * h, starts)
            sigs[nonempty] = tmp
        flat = pa.array(sigs.astype(np.int64).ravel(), pa.int64())
        return pa.table({
            self.id_col: batch[self.id_col],
            "sig": pa.FixedSizeListArray.from_arrays(flat, self.num_perm),
        })


def minhash_map_fn(num_perm: int = 128, k: int = 3, seed: int = 42,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Plain-task closure form of MinHasher: fuses with the upstream read
    (no actor pool, no concurrency cap) — the right shape for this stage's
    <1KB of state."""
    mh = MinHasher(num_perm, k, seed, text_col, id_col)

    def fn(batch: pa.Table) -> pa.Table:
        return mh(batch)

    return fn


# vectorized row hash for LSH band buckets (collision ~2^-64 per bucket) —
# shared with the shuffle helpers
_mix64 = mix64_rows


def minhash_lsh_pairs(ds: Dataset, *, num_perm: int = 128, bands: int = 32,
                      k: int = 3, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_bucket: int | None = DEFAULT_MAX_BUCKET,
                      n_parts: int | None = None) -> Dataset:
    """Near-dup pairs via MinHash signatures + LSH banding (small/medium
    corpora: the signature rides along the band explosion, so the estimate
    is computed where the candidates are found — simplest plan, but the
    shuffle carries bands x signature bytes per doc).

    For large corpora use :func:`minhash_lsh_pairs_scale`, which explodes
    only (bucket, id) 16-byte rows and joins signatures back onto the
    candidate pairs. Output: (a, b, jaccard_est).

    ``max_bucket`` (default ON): buckets with more than max_bucket members
    fall back to representative-star pairs (see DEFAULT_MAX_BUCKET) —
    bounded O(m) work per degenerate exact-dup cluster instead of O(m^2).
    """
    n_parts = n_parts or adaptive_n_parts()
    rows_per_band = _check_bands(num_perm, bands)
    signed = ds.map_batches(
        minhash_map_fn(num_perm, k, 42, text_col, id_col),
        batch_format="pyarrow", batch_size=None)

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        sig = np.asarray(batch["sig"].combine_chunks().flatten()).reshape(
            n, num_perm).astype(np.uint64)
        buckets = np.empty(bands * n, np.uint64)
        for bi in range(bands):
            band = sig[:, bi * rows_per_band:(bi + 1) * rows_per_band]
            buckets[bi * n:(bi + 1) * n] = _mix64(band, bi)
        out_ids = np.tile(ids, bands)
        sig_rep = np.tile(sig.astype(np.int64), (bands, 1))
        return pa.table({
            "bucket": pa.array(buckets.astype(np.int64)),
            "bucket_part": pa.array((buckets % n_parts).astype(np.int64)),
            id_col: pa.array(out_ids, pa.int64()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig_rep.ravel(), pa.int64()), num_perm),
        })

    exploded = signed.map_batches(explode_bands, batch_format="pyarrow",
                                  batch_size=None)

    def partition_pairs(group: pa.Table) -> pa.Table:
        """All buckets of one coarse partition, grouped vectorized."""
        n = group.num_rows
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "jaccard_est": pa.array([], pa.float64())})
        if n < 2:
            return empty
        bucket = group["bucket"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sig = np.asarray(group["sig"].combine_chunks().flatten()).reshape(
            n, num_perm)
        order = np.lexsort((ids, bucket))
        bucket, ids, sig = bucket[order], ids[order], sig[order]
        starts = np.concatenate(
            [[0], np.nonzero(bucket[1:] != bucket[:-1])[0] + 1, [n]])
        a_out, b_out, e_out, oversized = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            m = e - s
            if m < 2:
                continue
            bids, bsig = ids[s:e], sig[s:e]
            if max_bucket is not None and m > max_bucket:
                # representative star: each member vs the bucket min id
                oversized.append(m)
                rep = int(np.argmin(bids))
                agree = (bsig == bsig[rep][None, :]).mean(axis=1)
                neq = bids != bids[rep]
                lo = np.minimum(bids[neq], bids[rep])
                hi = np.maximum(bids[neq], bids[rep])
                a_out.append(lo)
                b_out.append(hi)
                e_out.append(agree[neq])
                continue
            for i in range(m - 1):
                agree = (bsig[i + 1:] == bsig[i][None, :]).mean(axis=1)
                neq = bids[i + 1:] != bids[i]
                a_out.append(np.full(neq.sum(), bids[i]))
                b_out.append(bids[i + 1:][neq])
                e_out.append(agree[neq])
        _oversize_warn("minhash_lsh", oversized)
        if not a_out:
            return empty
        return pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                         "b": pa.array(np.concatenate(b_out), pa.int64()),
                         "jaccard_est": pa.array(
                             np.concatenate(e_out), pa.float64())})

    pairs = exploded.groupby("bucket_part").map_groups(
        partition_pairs, batch_format="pyarrow")

    # same pair surfaces from multiple bands -> keep one, filter by estimate
    # (hash-partitioned merge: pair cardinality is O(N) at high dup rates)
    def pair_partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["a", "b"]).aggregate([("jaccard_est", "max")])
        out = out.rename_columns(["a", "b", "_e"])
        return out.append_column(
            "_mp", pa.array(int_partition_ids(out, ["a", "b"], n_parts)))

    partials = pairs.map_batches(pair_partial, batch_format="pyarrow",
                                 batch_size=None)
    merged = _merge_partials(partials, ["a", "b"], [("_e", "max")],
                             ["jaccard_est"], part_col="_mp")

    def threshold_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["jaccard_est"], threshold))

    return merged.map_batches(threshold_filter, batch_format="pyarrow",
                              batch_size=None)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(texts, k: int = 1) -> np.ndarray:
    """Charikar 64-bit simhash over word k-grams — vectorized: shingle
    hashes from doc_shingle_hashes, ±1 bit matrix, per-doc sums via
    np.add.reduceat, sign-pack. Frequency-WEIGHTED (duplicate shingles
    vote once per occurrence — the standard Charikar weighting; the
    earlier revision voted per distinct shingle and looped Python per doc
    AND per shingle)."""
    if isinstance(texts, list):
        texts = pa.array(texts, pa.string())
    h, counts = doc_shingle_hashes(texts, k)
    n = len(counts)
    out = np.zeros(n, np.uint64)
    if len(h) == 0:
        return out
    bit_idx = np.arange(64, dtype=np.uint64)
    bits = ((h[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int8)
    pm = bits.astype(np.int32) * 2 - 1          # ±1, (shingles x 64)
    nonempty = counts > 0
    starts = (np.cumsum(counts) - counts)[nonempty]
    acc = np.add.reduceat(pm, starts, axis=0)   # (nonempty docs x 64)
    packed = np.packbits((acc >= 0)[:, ::-1], axis=1)
    out[nonempty] = packed.copy().view(">u8").ravel()
    return out


def simhash_pairs(ds: Dataset, *, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  max_bucket: int | None = DEFAULT_MAX_BUCKET,
                  n_parts: int | None = None) -> Dataset:
    """Near-dup pairs with simhash hamming distance <= max_hamming.

    Buckets by each of the 4 16-bit signature chunks (pigeonhole: any pair
    within distance 3 agrees on >= one chunk), so candidate generation is a
    hash shuffle on (chunk_idx, chunk_value).

    ``max_bucket`` (default ON): chunk buckets with more than max_bucket
    members fall back to representative-star pairs (see DEFAULT_MAX_BUCKET)
    — bounded O(m) work per degenerate exact-dup cluster."""
    if max_hamming > 3:
        raise ValueError(
            f"simhash_pairs max_hamming={max_hamming} > 3: the 4x16-bit "
            "chunk scheme guarantees recall only for distance <= 3 "
            "(pigeonhole); use more/narrower chunks for larger radii")
    def sign(batch: pa.Table) -> pa.Table:
        sig = simhash64(batch[text_col])  # arrow in, no pylist round-trip
        return pa.table({id_col: batch[id_col],
                         "sig": pa.array(sig.astype(np.int64))})

    signed = ds.map_batches(sign, batch_format="pyarrow", batch_size=None)

    n_parts = n_parts or adaptive_n_parts()

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        sig = batch["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        buckets = np.empty(4 * n, np.uint64)
        for c in range(4):
            chunk = (sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            buckets[c * n:(c + 1) * n] = chunk | (np.uint64(c) << np.uint64(17))
        return pa.table({
            "bucket": pa.array(buckets.astype(np.int64)),
            "bucket_part": pa.array((buckets % n_parts).astype(np.int64)),
            id_col: pa.array(np.tile(ids, 4), pa.int64()),
            "sig": pa.array(np.tile(sig, 4).astype(np.int64)),
        })

    exploded = signed.map_batches(explode, batch_format="pyarrow",
                                  batch_size=None)

    _POP = np.array([bin(i).count("1") for i in range(256)], np.uint8)

    def partition_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        n = group.num_rows
        if n < 2:
            return empty
        bucket = group["bucket"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sig = group["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, bucket))
        bucket, ids, sig = bucket[order], ids[order], sig[order]
        starts = np.concatenate(
            [[0], np.nonzero(bucket[1:] != bucket[:-1])[0] + 1, [n]])
        a, b, d, oversized = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            m = e - s
            if m < 2:
                continue
            bids, bsig = ids[s:e], sig[s:e]
            if max_bucket is not None and m > max_bucket:
                oversized.append(m)
                rep = int(np.argmin(bids))
                x = (bsig ^ bsig[rep]).view(np.uint8).reshape(-1, 8)
                ham = _POP[x].sum(axis=1).astype(np.int64)
                keep = (ham <= max_hamming) & (bids != bids[rep])
                lo = np.minimum(bids[keep], bids[rep])
                hi = np.maximum(bids[keep], bids[rep])
                a.append(lo)
                b.append(hi)
                d.append(ham[keep])
                continue
            for i in range(m - 1):
                x = (bsig[i] ^ bsig[i + 1:]).view(np.uint8) \
                    .reshape(-1, 8)
                ham = _POP[x].sum(axis=1).astype(np.int64)
                keep = (ham <= max_hamming) & (bids[i + 1:] != bids[i])
                a.append(np.full(keep.sum(), bids[i]))
                b.append(bids[i + 1:][keep])
                d.append(ham[keep])
        _oversize_warn("simhash", oversized)
        if not a:
            return empty
        return pa.table({"a": pa.array(np.concatenate(a), pa.int64()),
                         "b": pa.array(np.concatenate(b), pa.int64()),
                         "hamming": pa.array(np.concatenate(d), pa.int64())})

    pairs = exploded.groupby("bucket_part").map_groups(
        partition_pairs, batch_format="pyarrow")

    def dedup_pairs(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["a", "b"]).aggregate([("hamming", "min")])
        out = out.rename_columns(["a", "b", "_h"])
        return out.append_column(
            "_mp", pa.array(int_partition_ids(out, ["a", "b"], n_parts)))

    partials = pairs.map_batches(dedup_pairs, batch_format="pyarrow",
                                 batch_size=None)
    return _merge_partials(partials, ["a", "b"], [("_h", "min")], ["hamming"],
                           part_col="_mp")


def minhash_lsh_pairs_scale(ds: Dataset, *, num_perm: int = 128,
                            bands: int = 32, k: int = 3,
                            threshold: float = 0.5, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_bucket: int | None = DEFAULT_MAX_BUCKET,
                            n_parts: int | None = None) -> Dataset:
    """Scale plan for MinHash+LSH: the band explosion carries ONLY
    (bucket:int64, id:int64) — 16 bytes/row instead of bands x 1KB
    signatures — and the Jaccard estimate is computed by attaching the
    signature table onto the (deduplicated, small) candidate pair set with
    two reduce-side hash joins (shuffle.partitioned_attach — works at any
    cluster size, unlike Ray 2.49's experimental Dataset.join which
    deadlocks under 8 CPUs).

    Shuffle volumes at N docs: explode = N x bands x 16B; candidate pairs =
    O(near-dup pairs); signature attach = 2 hash-partitioned joins against
    the N x (num_perm x 8B) signature table. Signatures are materialized
    once (object store, never the driver) instead of recomputing MinHash
    per consumer. ``max_bucket`` (default ON) routes degenerate buckets
    (giant exact-dup clusters) through representative-star pairs — O(m)
    instead of O(m^2) per bucket. This is the plan that survives 10^9-doc
    corpora."""
    n_parts = n_parts or adaptive_n_parts()
    rows_per_band = num_perm // bands
    signed = ds.map_batches(
        minhash_map_fn(num_perm, k, 42, text_col, id_col),
        batch_format="pyarrow", batch_size=None).materialize()

    def explode_min(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        sig = np.asarray(batch["sig"].combine_chunks().flatten()).reshape(
            n, num_perm).astype(np.uint64)
        buckets = np.empty(bands * n, np.uint64)
        for bi in range(bands):
            band = sig[:, bi * rows_per_band:(bi + 1) * rows_per_band]
            buckets[bi * n:(bi + 1) * n] = _mix64(band, bi)
        return pa.table({
            "bucket": pa.array(buckets.astype(np.int64)),
            "bucket_part": pa.array((buckets % n_parts).astype(np.int64)),
            id_col: pa.array(np.tile(ids, bands), pa.int64()),
        })

    exploded = signed.map_batches(explode_min, batch_format="pyarrow",
                                  batch_size=None)

    def partition_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        n = group.num_rows
        if n < 2:
            return empty
        bucket = group["bucket"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bucket))
        bucket, ids = bucket[order], ids[order]
        starts = np.concatenate(
            [[0], np.nonzero(bucket[1:] != bucket[:-1])[0] + 1, [n]])
        a_out, b_out, oversized = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            m = e - s
            if m < 2:
                continue
            bids = np.unique(ids[s:e])
            if len(bids) < 2:
                continue
            if max_bucket is not None and len(bids) > max_bucket:
                # representative star: bids is sorted, bids[0] is the min
                oversized.append(len(bids))
                a_out.append(np.full(len(bids) - 1, bids[0]))
                b_out.append(bids[1:])
                continue
            iu = np.triu_indices(len(bids), 1)
            a_out.append(bids[iu[0]])
            b_out.append(bids[iu[1]])
        _oversize_warn("minhash_lsh_scale", oversized)
        if not a_out:
            return empty
        t = pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                      "b": pa.array(np.concatenate(b_out), pa.int64())})
        # in-stage dedupe before the global one
        return t.group_by(["a", "b"]).aggregate([]).rename_columns(["a", "b"])

    cand = exploded.groupby("bucket_part").map_groups(
        partition_pairs, batch_format="pyarrow")

    def pair_partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["a", "b"]).aggregate([([], "count_all")])
        out = out.rename_columns(["a", "b", "_c"])
        return out.append_column(
            "_mp", pa.array(int_partition_ids(out, ["a", "b"], n_parts)))

    partials = cand.map_batches(pair_partial, batch_format="pyarrow",
                                batch_size=None)
    pairs = _merge_partials(partials, ["a", "b"], [("_c", "max")], ["_c"],
                            part_col="_mp").drop_columns(["_c"])

    # attach the signatures back, reduce-side. The attach payload must be a
    # flat value column -> pack each signature as fixed-size binary,
    # zero-copy from the int64 buffer.
    sig_bytes = pa.binary(num_perm * 8)

    def pack(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat = batch["sig"].combine_chunks().flatten()
        packed = pa.Array.from_buffers(sig_bytes, n, [None, pa.py_buffer(
            np.asarray(flat).astype(np.int64).tobytes())])
        return pa.table({id_col: batch[id_col], "_sv": packed})

    sig_tbl = signed.map_batches(pack, batch_format="pyarrow",
                                 batch_size=None)
    i64 = pa.int64()
    j1 = partitioned_attach(
        pairs, {"a": i64, "b": i64}, sig_tbl, key_col="a",
        right_key=id_col, right_val="_sv", out_name="sig_a",
        val_type=sig_bytes, n_parts=n_parts)
    joined = partitioned_attach(
        j1, {"a": i64, "b": i64, "sig_a": sig_bytes}, sig_tbl, key_col="b",
        right_key=id_col, right_val="_sv", out_name="sig_b",
        val_type=sig_bytes, n_parts=n_parts)

    def estimate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard_est": pa.array([], pa.float64())})

        def unpack(col):
            c = batch[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            # fixed-size-binary data buffer is contiguous: zero-copy view
            # (to_pylist + join would copy per row on the scale path)
            buf = c.buffers()[1]
            off = c.offset * num_perm * 8
            return np.frombuffer(buf, np.int64,
                                 count=n * num_perm,
                                 offset=off).reshape(n, num_perm)

        sa, sb = unpack("sig_a"), unpack("sig_b")
        est = (sa == sb).mean(axis=1)
        out = pa.table({"a": batch["a"], "b": batch["b"],
                        "jaccard_est": pa.array(est, pa.float64())})
        return out.filter(pc.greater_equal(out["jaccard_est"], threshold))

    return joined.map_batches(estimate, batch_format="pyarrow",
                              batch_size=None)


# ---------------------------------------------------------------------------
# connected components over near-dup pairs -> dedup clusters
# ---------------------------------------------------------------------------

def _cc_local(b: pa.Table) -> pa.Table:
    """Single-task connected components: numpy min-label propagation with
    pointer doubling over the (already symmetrized) edge block."""
    u = b["u"].to_numpy(zero_copy_only=False)
    v = b["v"].to_numpy(zero_copy_only=False)
    if len(u) == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})
    nodes = np.unique(np.concatenate([u, v]))
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    label = np.arange(len(nodes))
    prev = -1
    while True:
        np.minimum.at(label, vi, label[ui])
        np.minimum.at(label, ui, label[vi])
        label = np.minimum(label, label[label])
        s = int(label.sum())
        if s == prev:
            break
        prev = s
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "component": pa.array(nodes[label], pa.int64())})


def connected_components(pairs: Dataset, *, a_col: str = "a",
                         b_col: str = "b", max_iter: int = 12,
                         n_parts: int | None = None) -> Dataset:
    """Distributed connected components over a pair/edge Dataset ->
    (node, component) with component = min node id of the cluster.

    This is the step that turns near-dup PAIRS (minhash_lsh / simhash /
    ngram_jaccard output) into dedup CLUSTERS: keep the row whose
    node == component, drop the rest. Min-label propagation, one round =
    one reduce-side label join (partitioned_attach — hash-partitioned,
    no driver state) + a groupby-min; labels only ever decrease, so the
    global label sum is a monotone convergence witness (equal sums ==
    fixed point, one cheap scalar per round). Near-dup graphs are
    star/clique shaped (the candidate stages emit representative stars
    for oversized buckets), so rounds ~ cluster diameter, typically 2-3;
    ``max_iter`` caps pathological chains and logs a warning.

    Per round the edge set is re-joined (E rows) and the label table
    (V rows, 16 B each) is re-materialized — the standard MapReduce CC
    cost model; both stay distributed at any scale.
    """
    from .shuffle import partitioned_attach

    def sym(b: pa.Table) -> pa.Table:
        a = pc.cast(b[a_col], pa.int64())
        bb = pc.cast(b[b_col], pa.int64())
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        bb = bb.combine_chunks() if isinstance(bb, pa.ChunkedArray) else bb
        return pa.table({"u": pa.concat_arrays([a, bb]),
                         "v": pa.concat_arrays([bb, a])})

    edges = pairs.map_batches(sym, batch_format="pyarrow",
                              batch_size=None).materialize()
    n_edges = edges.count()
    if n_parts is None and n_edges <= 5_000_000:
        # every distributed round is several fixed-cost Ray jobs; an edge
        # set this size solves in ONE vectorized task (the hybrid every
        # stage in this family uses — distributed plan only when the data
        # needs it). Rounds here are numpy passes, not shuffles.
        return edges.repartition(1).map_batches(
            _cc_local, batch_format="pyarrow", batch_size=None)
    if n_parts is None:
        from .shuffle import adaptive_n_parts
        n_parts = min(adaptive_n_parts(edges.size_bytes()),
                      max(1, n_edges // 100_000))

    def init_label(b: pa.Table) -> pa.Table:
        lab = pc.min_element_wise(b["u"], b["min(v)"])
        return pa.table({"node": b["u"], "label": lab})

    labels = edges.groupby("u").min("v").map_batches(
        init_label, batch_format="pyarrow", batch_size=None).materialize()
    prev_sum = labels.sum("label")

    import time as _time
    for _round in range(max_iter):
        _t0 = _time.time()
        msgs = partitioned_attach(
            edges, {"u": pa.int64(), "v": pa.int64()}, labels,
            key_col="u", right_key="node", right_val="label",
            out_name="lab", n_parts=n_parts)

        def as_cand(b: pa.Table) -> pa.Table:
            return pa.table({"node": b["v"], "label": b["lab"]})

        cand = msgs.map_batches(as_cand, batch_format="pyarrow",
                                batch_size=None).union(labels)
        # materialize BEFORE the self-join below: the jump consumes this
        # table as BOTH sides, and unmaterialized lineage would run the
        # expensive message groupby twice per round
        labels = cand.groupby("node").min("label").rename_columns(
            ["node", "label"]).materialize()
        # pointer doubling: label(v) <- min(label(v), label(label(v))).
        # Every label IS a node id, so the self-join always resolves;
        # this turns O(diameter) rounds into O(log diameter) on chains
        jumped = partitioned_attach(
            labels, {"node": pa.int64(), "label": pa.int64()}, labels,
            key_col="label", right_key="node", right_val="label",
            out_name="ll", n_parts=n_parts)

        def jump(b: pa.Table) -> pa.Table:
            # min_element_wise skips nulls, so an (impossible) unresolved
            # lookup degrades to the unjumped label
            lab = pc.min_element_wise(b["label"], b["ll"])
            return pa.table({"node": b["node"], "label": lab})

        labels = jumped.map_batches(jump, batch_format="pyarrow",
                                    batch_size=None).materialize()
        cur = labels.sum("label")
        _log.debug("connected_components round %d: %.1fs (label sum %d)",
                   _round, _time.time() - _t0, cur)
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        _log.warning("connected_components: label propagation hit "
                     "max_iter=%d before converging (very long chain?)",
                     max_iter)

    return labels.rename_columns(["node", "component"])
