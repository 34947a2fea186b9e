"""Similarity search over embedding columns (list<float>).

Brute-force cosine top-k is the baseline (numpy matmul per batch against a
broadcast query matrix); the scale path is bucketed LSH (random hyperplanes)
so candidate generation becomes a hash shuffle, mirroring how enrich/dedup
stages shuffle only small intermediate rows.

Scale design: the query matrix is broadcast ONCE via ray.put and fetched per
actor in __init__ (zero-copy from each node's object store). Per-batch work
is a single float64 GEMM. Global top-k = per-block partial top-k (k rows per
query per block) -> single-block merge, so the shuffle moves
O(blocks * nq * k) rows, never the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .shuffle import actor_pool_size, round_half_away


def _mat(batch: pa.Table, col: str, dim: int | None = None) -> np.ndarray:
    """Embedding column as an (n, d) float64 matrix. ``dim`` is the width
    to use for a 0-row batch (reshape(0, -1) cannot infer one, and empty
    blocks routinely arrive after selective upstream filters, e.g.
    ann_lsh_topk's candidate prune) — callers holding a query/centroid
    matrix pass its width so downstream matmuls stay shape-valid."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        if dim is None and pa.types.is_fixed_size_list(arr.type):
            dim = arr.type.list_size
        return np.zeros((0, dim or 0), dtype=np.float64)
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """Actor-pool stage: per-batch cosine top-k against the broadcast query
    matrix. Emits (query_id, vec_id, sim) partial candidates."""

    def __init__(self, queries_ref, query_ids, k: int,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) \
            else queries_ref
        self.q = _normalize(np.asarray(q, np.float64))
        self.query_ids = np.asarray(query_ids, np.int64)
        self.k = k
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_mat(batch, self.vec_col, self.q.shape[1]))
        sims = self.q @ m.T  # (nq, nb)
        # exclude self-matches
        qid_out, vid_out, sim_out = [], [], []
        k = min(self.k, m.shape[0])
        for qi in range(sims.shape[0]):
            s = sims[qi].copy()
            s[ids == self.query_ids[qi]] = -np.inf
            # partial top-k within the block (order: sim desc, id asc)
            idx = np.lexsort((ids, -s))[:k]
            idx = idx[np.isfinite(s[idx])]
            qid_out.extend([self.query_ids[qi]] * len(idx))
            vid_out.extend(ids[idx])
            sim_out.extend(s[idx])
        return pa.table({
            "query_id": pa.array(qid_out, pa.int64()),
            self.id_col: pa.array(np.array(vid_out, np.int64)),
            "sim": pa.array(np.array(sim_out, np.float64)),
        })


def ann_topk(ds: Dataset, query_vectors: np.ndarray, query_ids,
             k: int = 5, *, vec_col: str = "embedding",
             id_col: str = "vec_id", round_digits: int = 6) -> Dataset:
    """Exact cosine top-k per query over the corpus (baseline ANN oracle)."""
    ref = ray.put(np.asarray(query_vectors, np.float64)) \
        if ray.is_initialized() else np.asarray(query_vectors, np.float64)
    partials = ds.map_batches(
        BruteForceTopK, fn_constructor_args=(ref, list(query_ids), k,
                                             vec_col, id_col),
        batch_format="pyarrow", batch_size=None,
        concurrency=actor_pool_size(), max_restarts=0)

    return _merge_topk(partials, k, id_col, round_digits)


def cosine_pairs_within(ds: Dataset, *, partition_col: str = "label",
                        threshold: float = 0.3, vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        max_bucket: int | None = None,
                        round_digits: int = 6) -> Dataset:
    """Embedding-cosine near-dup pairs, scoped within a partition key (the
    IVF-bucket pattern: candidates only inside a coarse cluster — here the
    given column; at scale the column is a kmeans/LSH bucket id).

    Buckets over ``max_bucket`` members fall back to a representative STAR
    (every member scored against the bucket's min-id vector — one GEMV,
    O(m) pairs) instead of the dense m x m GEMM, the same oversized-bucket
    guard as the LSH/simhash candidate stages (``dedup.DEFAULT_MAX_BUCKET``):
    a skewed bucket at web scale is near-always a near-exact dup cluster,
    and an uncapped one is O(m^2) memory in a single task.
    """
    from .dedup import DEFAULT_MAX_BUCKET, _oversize_warn
    cap = DEFAULT_MAX_BUCKET if max_bucket is None else max_bucket

    def per_group(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        lab = group[partition_col][0].as_py()
        m = _normalize(_mat(group, vec_col))
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        if len(ids) > cap:
            _oversize_warn("cosine_pairs_within", [len(ids)])
            sims = m @ m[0]  # vs representative (min id)
            keep = sims[1:] >= threshold
            a = np.full(int(keep.sum()), ids[0], np.int64)
            b = ids[1:][keep]
            s = sims[1:][keep]
        else:
            sims = m @ m.T
            iu = np.triu_indices(len(ids), 1)
            keep = sims[iu] >= threshold
            a, b, s = ids[iu[0][keep]], ids[iu[1][keep]], sims[iu][keep]
        return pa.table({
            partition_col: pa.array([lab] * len(a),
                                    type=group[partition_col].type),
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "sim": pa.array(round_half_away(s, round_digits)),
        })

    return ds.groupby(partition_col).map_groups(per_group,
                                                batch_format="pyarrow")


class HyperplaneLSH:
    """Scale-path ANN candidate generator: sign-random-projection bucket id
    per vector (Charikar SRP). Vectors sharing a bucket are candidate
    neighbors; probing multiple tables raises recall."""

    def __init__(self, dim: int, n_bits: int = 12, n_tables: int = 4,
                 seed: int = 42, vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = [rng.standard_normal((n_bits, dim)) for _ in range(n_tables)]
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _mat(batch, self.vec_col, self.planes[0].shape[1])
        cols = {n: batch[n] for n in batch.column_names}
        for t, planes in enumerate(self.planes):
            bits = (m @ planes.T) >= 0
            powers = (1 << np.arange(bits.shape[1], dtype=np.int64))
            vals = bits.astype(np.int64) @ powers
            cols[f"bucket_{t}"] = pa.array(vals, pa.int64())
        return pa.table(cols)


def ann_lsh_topk(ds: Dataset, query_vectors, query_ids, k: int = 5, *,
                 n_bits: int = 10, n_tables: int = 8, seed: int = 42,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 round_digits: int = 6):
    """Scale-path ANN: hyperplane-LSH candidate pruning + exact re-rank.

    The corpus is bucketed per table (vectorized sign projections); a row is
    a candidate iff it shares >= 1 bucket with >= 1 query in any table. Only
    candidates reach the exact top-k stage, so per-batch work drops from
    O(corpus x queries) to O(candidates x queries) — the recall/cost dial is
    (n_bits, n_tables). Returns the top-k Dataset."""
    q = np.asarray(query_vectors, np.float64)
    dim = q.shape[1]
    lsh = HyperplaneLSH(dim, n_bits=n_bits, n_tables=n_tables, seed=seed,
                        vec_col=vec_col)
    # query buckets with the SAME planes
    q_tagged = lsh(pa.table({vec_col: pa.array(list(map(list, q)),
                                               pa.list_(pa.float64()))}))
    q_buckets = [set(q_tagged[f"bucket_{t}"].to_pylist())
                 for t in range(n_tables)]
    bucket_sets = [pa.array(sorted(b), pa.int64()) for b in q_buckets]

    def candidates(batch: pa.Table) -> pa.Table:
        tagged = lsh(batch)
        import pyarrow.compute as pc
        keep = None
        for t in range(n_tables):
            m = pc.is_in(tagged[f"bucket_{t}"], value_set=bucket_sets[t])
            keep = m if keep is None else pc.or_(keep, m)
        return batch.filter(pc.fill_null(keep, False))

    cand = ds.map_batches(candidates, batch_format="pyarrow", batch_size=None)
    return ann_topk(cand, q, query_ids, k=k, vec_col=vec_col, id_col=id_col,
                    round_digits=round_digits)


def _merge_topk(partials: Dataset, k: int, id_col: str,
                round_digits: int) -> Dataset:
    """Global top-k per query from per-block partial candidates (tiny:
    blocks x nq x k rows)."""
    def merge(batch: pa.Table) -> pa.Table:
        qid = batch["query_id"].to_numpy(zero_copy_only=False)
        vid = batch[id_col].to_numpy(zero_copy_only=False)
        sim = batch["sim"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        for q in np.unique(qid):
            m = qid == q
            idx = np.lexsort((vid[m], -sim[m]))[:k]
            out_q.extend([q] * len(idx))
            out_v.extend(vid[m][idx])
            out_s.extend(round_half_away(sim[m][idx], round_digits))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(np.array(out_v, np.int64)),
            "sim": pa.array(np.array(out_s, np.float64)),
        })

    return partials.repartition(1).map_batches(merge, batch_format="pyarrow",
                                               batch_size=None)


class IVFSearcher:
    """Per-block IVF-Flat search: assign block vectors to the trained
    coarse cells, then compare each query ONLY against rows in its nprobe
    nearest cells (the FAISS IVF pruning, shuffle-free — centroids + query
    matrix broadcast once per actor)."""

    def __init__(self, centroids_ref, queries_ref, query_ids, probes_ref,
                 k: int, vec_col: str, id_col: str):
        def get(r):
            return ray.get(r) if isinstance(r, ray.ObjectRef) else r
        self.cents = _normalize(np.asarray(get(centroids_ref), np.float64))
        self.q = _normalize(np.asarray(get(queries_ref), np.float64))
        self.query_ids = np.asarray(query_ids, np.int64)
        self.probes = np.asarray(get(probes_ref), np.int64)  # (nq, nprobe)
        self.k = k
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_mat(batch, self.vec_col, self.cents.shape[1]))
        cells = np.argmax(m @ self.cents.T, axis=1)
        qid_out, vid_out, sim_out = [], [], []
        for c in np.unique(cells):
            rows = np.nonzero(cells == c)[0]
            qs = np.nonzero((self.probes == c).any(axis=1))[0]
            if not len(qs) or not len(rows):
                continue
            sims = self.q[qs] @ m[rows].T            # (|qs|, |rows|)
            rid = ids[rows]
            kk = min(self.k, len(rows))
            for j, qi in enumerate(qs):
                s = sims[j].copy()
                s[rid == self.query_ids[qi]] = -np.inf
                idx = np.lexsort((rid, -s))[:kk]
                idx = idx[np.isfinite(s[idx])]
                qid_out.extend([self.query_ids[qi]] * len(idx))
                vid_out.extend(rid[idx])
                sim_out.extend(s[idx])
        return pa.table({
            "query_id": pa.array(qid_out, pa.int64()),
            self.id_col: pa.array(np.array(vid_out, np.int64)),
            "sim": pa.array(np.array(sim_out, np.float64)),
        })


def ann_ivf_topk(ds: Dataset, query_vectors, query_ids, k: int = 5, *,
                 nlist: int = 8, nprobe: int = 3, max_iters: int = 5,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 round_digits: int = 6, fit: dict | None = None) -> Dataset:
    """IVF-Flat ANN: train the spherical k-means coarse quantizer (nlist
    cells, stages/cluster.py), pick each query's nprobe nearest cells, and
    exact-search only those cells — the scale path where brute force is
    O(N·nq) and LSH recall is pattern-dependent. Approximate by design
    (recall vs ann_topk pinned in tests). Pass ``fit`` (a kmeans_fit
    result) to reuse an already-trained quantizer."""
    from .cluster import kmeans_fit

    if fit is None:
        fit = kmeans_fit(ds, nlist, vec_col=vec_col, max_iters=max_iters)
    cents = _normalize(np.asarray(fit["centroids"], np.float64))
    q = _normalize(np.asarray(query_vectors, np.float64))
    probes = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    if ray.is_initialized():
        cents_ref, q_ref, probes_ref = (ray.put(cents), ray.put(q),
                                        ray.put(probes))
    else:
        cents_ref, q_ref, probes_ref = cents, q, probes
    partials = ds.map_batches(
        IVFSearcher,
        fn_constructor_args=(cents_ref, q_ref, list(query_ids), probes_ref,
                             k, vec_col, id_col),
        batch_format="pyarrow", batch_size=None,
        concurrency=actor_pool_size(), max_restarts=0)
    return _merge_topk(partials, k, id_col, round_digits)
