"""K-means over embedding columns — the iterative-algorithm pattern and the
real IVF coarse quantizer for similarity search.

Ray-Data-first iteration shape: each round is ONE pass of
``map_batches`` producing per-block partial sums (sum vector + count per
centroid) followed by a tiny driver-side centroid update — the classic
combiner pattern, so the shuffle-free per-round cost is O(blocks x k x dim)
partials. Deterministic: centroids init from the first k vectors (seeded
alternative available), ties break to the lowest centroid index.

The per-round stage is a TASK CLOSURE over a broadcast centroid ref, not an
actor pool: the state is k x dim floats fetched zero-copy from the local
object store, so a closure fuses with the upstream read instead of paying a
fresh actor-pool spin-up every iteration (the same small-state rule as
dedup.MinHasher).

``assign`` then stamps a ``cluster`` column usable as the IVF bucket for
:func:`..similarity.cosine_pairs_within` / ANN candidate scoping.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .shuffle import SINGLE_TASK_BYTES as _SINGLE_TASK_BYTES
from .similarity import _mat, _normalize


def _init_centroids(ds: Dataset, k: int, vec_col: str) -> np.ndarray:
    first = ds.limit(k).to_pandas()
    m = np.asarray(list(first[vec_col]), np.float64)
    if len(m) < k:
        raise ValueError(f"need >= {k} rows to init {k} centroids")
    return _normalize(m)


def _get(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _assign_partial_fn(centroids_ref, vec_col: str):
    """One pass: nearest centroid per row -> per-block (sum, count, inertia)
    partials. Centroids broadcast once via ray.put; the per-batch fetch is
    a zero-copy local object-store read."""

    def partial(batch: pa.Table) -> pa.Table:
        c = np.asarray(_get(centroids_ref), np.float64)
        m = _normalize(_mat(batch, vec_col, c.shape[1]))
        sims = m @ c.T
        assign = sims.argmax(axis=1)
        k, dim = c.shape
        sums = np.zeros((k, dim))
        counts = np.zeros(k, np.int64)
        np.add.at(sums, assign, m)
        np.add.at(counts, assign, 1)
        inertia = float((1.0 - sims.max(axis=1)).sum()) if len(m) else 0.0
        return pa.table({
            "cid": pa.array(np.arange(k, dtype=np.int64)),
            "vsum": pa.FixedSizeListArray.from_arrays(
                pa.array(sums.ravel(), pa.float64()), dim),
            "n": pa.array(counts),
            "inertia": pa.array([inertia] + [0.0] * (k - 1), pa.float64()),
        })

    return partial


def _one_pass(ds: Dataset, centroids: np.ndarray, vec_col: str):
    """(sums, counts, inertia) of one assignment pass vs ``centroids``."""
    ref = ray.put(centroids) if ray.is_initialized() else centroids
    partials = ds.map_batches(
        _assign_partial_fn(ref, vec_col),
        batch_format="pyarrow", batch_size=None).to_pandas()
    k, dim = centroids.shape
    sums = np.zeros((k, dim))
    counts = np.zeros(k, np.int64)
    for cid, vsum, n in zip(partials["cid"], partials["vsum"],
                            partials["n"]):
        sums[cid] += np.asarray(vsum)
        counts[cid] += n
    return sums, counts, float(partials["inertia"].sum())


def kmeans_fit(ds: Dataset, k: int, *, vec_col: str = "embedding",
               max_iters: int = 10, tol: float = 1e-4,
               size_bytes: int | None = None) -> dict:
    """Spherical k-means (cosine). Returns {centroids, inertia, iters},
    where ``inertia`` is measured AGAINST the returned centroids (one
    final assignment pass) — an in-loop reading would describe the
    pre-update centroids, not the model handed back.

    Each iteration re-reads the (lazy) dataset; for many iterations over
    remote storage, materialize the projected column first.

    ``size_bytes`` (input on-disk size, when the caller knows it): below
    ~32 MB the per-iteration Ray job is pure fixed cost — the matrix is
    pulled to the driver ONCE and the identical update loop runs locally
    (same hybrid rule as dedup's connected-components; the driver holds
    n x dim floats, bounded by the gate's tiny inputs). Unknown or large
    sizes keep the distributed per-block-partials plan.
    """
    if size_bytes is not None and size_bytes <= _SINGLE_TASK_BYTES:
        return _kmeans_fit_local(ds, k, vec_col, max_iters, tol)
    centroids = _init_centroids(ds, k, vec_col)
    inertia = np.inf
    iters = 0
    for it in range(max_iters):
        sums, counts, new_inertia = _one_pass(ds, centroids, vec_col)
        nonzero = counts > 0
        new_c = centroids.copy()
        new_c[nonzero] = _normalize(sums[nonzero] /
                                    counts[nonzero, None])
        shift = float(np.abs(new_c - centroids).max())
        centroids = new_c
        iters = it + 1
        converged = (np.isfinite(inertia) and
                     abs(inertia - new_inertia) <= tol * max(1.0, inertia)) \
            or shift <= tol
        inertia = new_inertia
        if converged:
            break
    _, _, final_inertia = _one_pass(ds, centroids, vec_col)
    return {"centroids": centroids, "inertia": final_inertia,
            "iters": iters}


def _kmeans_fit_local(ds: Dataset, k: int, vec_col: str,
                      max_iters: int, tol: float) -> dict:
    """Driver-local fit over a tiny input: one streamed read, then the
    same init / assignment / update / convergence rules as the
    distributed loop (single np.add.at instead of per-block partials —
    float addition order differs in the last ulp only)."""
    parts = [_mat(b, vec_col) for b in ds.iter_batches(
        batch_format="pyarrow", batch_size=None) if b.num_rows]
    if not parts or sum(len(p) for p in parts) < k:
        raise ValueError(f"need >= {k} rows to init {k} centroids")
    m = _normalize(np.concatenate(parts))
    centroids = _normalize(m[:k].copy())

    def one_pass(c: np.ndarray):
        sims = m @ c.T
        assign = sims.argmax(axis=1)
        sums = np.zeros_like(c)
        counts = np.zeros(k, np.int64)
        np.add.at(sums, assign, m)
        np.add.at(counts, assign, 1)
        return sums, counts, float((1.0 - sims.max(axis=1)).sum())

    inertia = np.inf
    iters = 0
    for it in range(max_iters):
        sums, counts, new_inertia = one_pass(centroids)
        nonzero = counts > 0
        new_c = centroids.copy()
        new_c[nonzero] = _normalize(sums[nonzero] / counts[nonzero, None])
        shift = float(np.abs(new_c - centroids).max())
        centroids = new_c
        iters = it + 1
        converged = (np.isfinite(inertia) and
                     abs(inertia - new_inertia) <= tol * max(1.0, inertia)) \
            or shift <= tol
        inertia = new_inertia
        if converged:
            break
    _, _, final_inertia = one_pass(centroids)
    return {"centroids": centroids, "inertia": final_inertia,
            "iters": iters}


def kmeans_assign(ds: Dataset, centroids: np.ndarray, *,
                  vec_col: str = "embedding",
                  out_col: str = "cluster") -> Dataset:
    """Stamp the nearest-centroid index (the IVF bucket column)."""
    ref = ray.put(np.asarray(centroids, np.float64)) \
        if ray.is_initialized() else np.asarray(centroids, np.float64)

    def assign_fn(batch: pa.Table) -> pa.Table:
        c = np.asarray(_get(ref), np.float64)
        m = _normalize(_mat(batch, vec_col, c.shape[1]))
        assign = (m @ c.T).argmax(axis=1)
        return batch.append_column(out_col,
                                   pa.array(assign.astype(np.int64)))

    return ds.map_batches(assign_fn, batch_format="pyarrow",
                          batch_size=None)
