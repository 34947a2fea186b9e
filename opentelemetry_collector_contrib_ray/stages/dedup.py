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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .aggregate import _merge_partials

# ---------------------------------------------------------------------------
# tokenize / shingle helpers (shared, vectorized via numpy over object arrays)
# ---------------------------------------------------------------------------


def _word_shingles(texts: list[str | None], k: int) -> list[set[str]]:
    out = []
    for t in texts:
        if not t:
            out.append(set())
            continue
        w = t.split(" ")
        out.append({" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}
                   if len(w) >= k else {t})
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


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> Dataset:
    """Exact dedup: one surviving row (min id) per distinct text, with copy
    count. Shuffle moves only (digest, min_id, n) partials."""
    def partial(batch: pa.Table) -> pa.Table:
        key = md5_hex(batch[text_col])
        t = pa.table({"dedup_key": key, id_col: batch[id_col]})
        out = t.group_by(["dedup_key"]).aggregate(
            [(id_col, "min"), ([], "count_all")])
        return out.rename_columns(["dedup_key", "_min_id", "_n"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    out = _merge_partials(partials, ["dedup_key"],
                          [("_min_id", "min"), ("_n", "sum")],
                          [id_col, "n_copies"])
    return out


# ---------------------------------------------------------------------------
# n-gram Jaccard (shingle-join plan)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds: Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.5,
                        max_df: int | None = None) -> Dataset:
    """All pairs (a<b) whose distinct word-k-gram sets have Jaccard >=
    threshold. Exact (not sketched): |A∩B| via shingle join, sizes via a
    broadcast {id: |set|} map (fits memory up to ~10^8 docs; beyond that
    replace with a Dataset join on id).
    """
    import ray

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        shs = _word_shingles(batch[text_col].to_pylist(), k)
        out_id, out_sh = [], []
        for i, s in zip(ids, shs):
            out_id.extend([i] * len(s))
            out_sh.extend(s)
        return pa.table({"sh": pa.array(out_sh, pa.string()),
                         id_col: pa.array(out_id, pa.int64())})

    def sizes_partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        shs = _word_shingles(batch[text_col].to_pylist(), k)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "_n": pa.array([len(s) for s in shs], pa.int64())})

    sizes_tbl = ds.map_batches(sizes_partial, batch_format="pyarrow",
                               batch_size=None).to_arrow_refs()
    sizes: dict[int, int] = {}
    for ref in sizes_tbl:
        t = ray.get(ref)
        sizes.update(zip(t[id_col].to_pylist(), t["_n"].to_pylist()))
    sizes_ref = ray.put(sizes) if ray.is_initialized() else sizes

    exploded = ds.map_batches(explode, batch_format="pyarrow", batch_size=None)

    def pairs_per_shingle(group: pa.Table) -> pa.Table:
        ids = sorted(group[id_col].to_pylist())
        if max_df is not None and len(ids) > max_df:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    pair_counts = exploded.groupby("sh").map_groups(
        pairs_per_shingle, batch_format="pyarrow")

    # count co-occurrences per (a,b): partial count per block, merge
    def pair_partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["a", "b"]).aggregate([([], "count_all")])
        return out.rename_columns(["a", "b", "_i"])

    partials = pair_counts.map_batches(pair_partial, batch_format="pyarrow",
                                       batch_size=None)
    inter = _merge_partials(partials, ["a", "b"], [("_i", "sum")], ["i"])

    class Finalize:
        def __init__(self, sizes_ref):
            self.sizes = ray.get(sizes_ref) if isinstance(
                sizes_ref, ray.ObjectRef) else sizes_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            i = batch["i"].to_numpy(zero_copy_only=False).astype(np.float64)
            na = np.array([self.sizes[x] for x in a], np.float64)
            nb = np.array([self.sizes[x] for x in b], np.float64)
            j = i / (na + nb - i)
            keep = j >= threshold
            return pa.table({
                "a": pa.array(a[keep]), "b": pa.array(b[keep]),
                "jaccard": pa.array(np.round(j[keep], 6)),
            })

    return inter.map_batches(Finalize, fn_constructor_args=(sizes_ref,),
                             batch_format="pyarrow", batch_size=None,
                             concurrency=(1, 4))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(shingles: set[str]) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
         for s in shingles), np.uint64, len(shingles))


def minhash_signature(shingles: set[str], a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*h+b) mod p — the standard permutation family."""
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, np.uint64)
    h = _shingle_hashes(shingles)
    with np.errstate(over="ignore"):
        vals = (h[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


class MinHasher:
    """Actor-pool stage: text -> minhash signature (fixed_size_list column).
    Permutation params are built once per actor (__init__), batches are
    signed with one vectorized pass per doc set."""

    def __init__(self, num_perm: int = 128, k: int = 3, seed: int = 42,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b = _perm_params(num_perm, seed)
        self.num_perm, self.k = num_perm, k
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        shs = _word_shingles(batch[self.text_col].to_pylist(), self.k)
        sigs = np.stack([minhash_signature(s, self.a, self.b) for s in shs])
        flat = pa.array(sigs.astype(np.int64).ravel(), pa.int64())
        return pa.table({
            self.id_col: batch[self.id_col],
            "sig": pa.FixedSizeListArray.from_arrays(flat, self.num_perm),
        })


def minhash_lsh_pairs(ds: Dataset, *, num_perm: int = 128, bands: int = 32,
                      k: int = 3, threshold: float = 0.5,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> Dataset:
    """Near-dup pairs via MinHash signatures + LSH banding.

    Plan: sign (actor pool) -> explode (band_id, bucket_hash) rows ->
    groupby bucket (hash shuffle; only id+signature move) -> pairs within
    bucket -> dedup pairs -> estimate Jaccard from signature agreement ->
    filter >= threshold. Output: (a, b, jaccard_est).
    """
    rows_per_band = num_perm // bands
    signed = ds.map_batches(
        MinHasher, fn_constructor_args=(num_perm, k, 42, text_col, id_col),
        batch_format="pyarrow", batch_size=None, concurrency=(1, 8))

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = np.asarray(batch["sig"].combine_chunks().flatten()).reshape(
            len(ids), num_perm)
        out_bucket, out_id, out_sig = [], [], []
        for bi in range(bands):
            band = sig[:, bi * rows_per_band:(bi + 1) * rows_per_band]
            # bucket key: band index + md5 of band bytes
            for r in range(len(ids)):
                key = f"{bi}:" + hashlib.md5(band[r].tobytes()).hexdigest()[:16]
                out_bucket.append(key)
                out_id.append(ids[r])
                out_sig.append(sig[r])
        flat = pa.array(np.concatenate(out_sig).astype(np.int64)
                        if out_sig else np.array([], np.int64))
        return pa.table({
            "bucket": pa.array(out_bucket, pa.string()),
            id_col: pa.array(out_id, pa.int64()),
            "sig": pa.FixedSizeListArray.from_arrays(flat, num_perm),
        })

    exploded = signed.map_batches(explode_bands, batch_format="pyarrow",
                                  batch_size=None)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard_est": pa.array([], pa.float64())})
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sig = np.asarray(group["sig"].combine_chunks().flatten()).reshape(
            n, num_perm)
        order = np.argsort(ids)
        ids, sig = ids[order], sig[order]
        a, b, est = [], [], []
        for i in range(n):
            agree = (sig[i + 1:] == sig[i][None, :]).mean(axis=1)
            for off, e in enumerate(agree):
                if ids[i] != ids[i + 1 + off]:
                    a.append(ids[i])
                    b.append(ids[i + 1 + off])
                    est.append(float(e))
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "jaccard_est": pa.array(est, pa.float64())})

    pairs = exploded.groupby("bucket").map_groups(bucket_pairs,
                                                  batch_format="pyarrow")

    # same pair surfaces from multiple bands -> keep one, filter by estimate
    def pair_partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["a", "b"]).aggregate([("jaccard_est", "max")])
        return out.rename_columns(["a", "b", "_e"])

    partials = pairs.map_batches(pair_partial, batch_format="pyarrow",
                                 batch_size=None)
    merged = _merge_partials(partials, ["a", "b"], [("_e", "max")],
                             ["jaccard_est"])

    def threshold_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["jaccard_est"], threshold))

    return merged.map_batches(threshold_filter, batch_format="pyarrow",
                              batch_size=None)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(texts: list[str | None], k: int = 1) -> np.ndarray:
    """Charikar 64-bit simhash over word k-grams (md5-derived feature bits)."""
    out = np.zeros(len(texts), np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, shingles in enumerate(_word_shingles(texts, k)):
        if not shingles:
            continue
        acc = np.zeros(64, np.int64)
        for h in _shingle_hashes(shingles):
            bits = (h >> bit_idx) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        out[i] = np.packbits((acc >= 0)[::-1]).view(">u8")[0]
    return out


def simhash_pairs(ds: Dataset, *, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Near-dup pairs with simhash hamming distance <= max_hamming.

    Buckets by each of the 4 16-bit signature chunks (pigeonhole: any pair
    within distance 3 agrees on >= one chunk), so candidate generation is a
    hash shuffle on (chunk_idx, chunk_value)."""
    def sign(batch: pa.Table) -> pa.Table:
        sig = simhash64(batch[text_col].to_pylist())
        return pa.table({id_col: batch[id_col],
                         "sig": pa.array(sig.astype(np.int64))})

    signed = ds.map_batches(sign, batch_format="pyarrow", batch_size=None)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = batch["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        buckets, oid, osig = [], [], []
        for c in range(4):
            chunk = (sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            for r in range(len(ids)):
                buckets.append(f"{c}:{chunk[r]}")
                oid.append(ids[r])
                osig.append(sig[r])
        return pa.table({"bucket": pa.array(buckets, pa.string()),
                         id_col: pa.array(oid, pa.int64()),
                         "sig": pa.array(np.array(osig, np.uint64)
                                         .astype(np.int64))})

    exploded = signed.map_batches(explode, batch_format="pyarrow",
                                  batch_size=None)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sig = group["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        ids, sig = ids[order], sig[order]
        a, b, d = [], [], []
        for i in range(len(ids)):
            x = sig[i] ^ sig[i + 1:]
            ham = np.array([bin(v).count("1") for v in x])
            for off in np.nonzero(ham <= max_hamming)[0]:
                if ids[i] != ids[i + 1 + off]:
                    a.append(ids[i])
                    b.append(ids[i + 1 + off])
                    d.append(int(ham[off]))
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "hamming": pa.array(d, pa.int64())})

    pairs = exploded.groupby("bucket").map_groups(bucket_pairs,
                                                  batch_format="pyarrow")

    def dedup_pairs(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["a", "b"]).aggregate([("hamming", "min")])
        return out.rename_columns(["a", "b", "_h"])

    partials = pairs.map_batches(dedup_pairs, batch_format="pyarrow",
                                 batch_size=None)
    return _merge_partials(partials, ["a", "b"], [("_h", "min")], ["hamming"])
