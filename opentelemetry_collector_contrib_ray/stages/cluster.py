"""K-means over embedding columns — the iterative-algorithm pattern and the
real IVF coarse quantizer for similarity search.

Ray-Data-first iteration shape: each round is ONE pass of
``map_batches`` producing per-block partial sums (sum vector + count per
centroid) followed by a tiny driver-side centroid update — the classic
combiner pattern, so the shuffle-free per-round cost is O(blocks x k x dim)
partials. Deterministic: centroids init from the first k vectors (seeded
alternative available), ties break to the lowest centroid index.

``assign`` then stamps a ``cluster`` column usable as the IVF bucket for
:func:`..similarity.cosine_pairs_within` / ANN candidate scoping.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .shuffle import actor_pool_size
from .similarity import _mat, _normalize


def _init_centroids(ds: Dataset, k: int, vec_col: str) -> np.ndarray:
    first = ds.limit(k).to_pandas()
    m = np.asarray(list(first[vec_col]), np.float64)
    if len(m) < k:
        raise ValueError(f"need >= {k} rows to init {k} centroids")
    return _normalize(m)


class _AssignPartial:
    """One pass: nearest centroid per row -> per-block (sum, count, inertia)
    partials. Centroids broadcast once per round."""

    def __init__(self, centroids_ref, vec_col: str):
        c = ray.get(centroids_ref) if isinstance(centroids_ref,
                                                 ray.ObjectRef) else centroids_ref
        self.c = np.asarray(c, np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_mat(batch, self.vec_col))
        sims = m @ self.c.T
        assign = sims.argmax(axis=1)
        k, dim = self.c.shape
        sums = np.zeros((k, dim))
        counts = np.zeros(k, np.int64)
        np.add.at(sums, assign, m)
        np.add.at(counts, assign, 1)
        inertia = float((1.0 - sims.max(axis=1)).sum())
        return pa.table({
            "cid": pa.array(np.arange(k, dtype=np.int64)),
            "vsum": pa.FixedSizeListArray.from_arrays(
                pa.array(sums.ravel(), pa.float64()), dim),
            "n": pa.array(counts),
            "inertia": pa.array([inertia] + [0.0] * (k - 1), pa.float64()),
        })


def kmeans_fit(ds: Dataset, k: int, *, vec_col: str = "embedding",
               max_iters: int = 10, tol: float = 1e-4) -> dict:
    """Spherical k-means (cosine). Returns {centroids, inertia, iters}.

    Each iteration re-reads the (lazy) dataset; for many iterations over
    remote storage, materialize the projected column first.
    """
    centroids = _init_centroids(ds, k, vec_col)
    inertia = np.inf
    iters = 0
    for it in range(max_iters):
        ref = ray.put(centroids) if ray.is_initialized() else centroids
        partials = ds.map_batches(
            _AssignPartial, fn_constructor_args=(ref, vec_col),
            batch_format="pyarrow", batch_size=None,
            concurrency=actor_pool_size()).to_pandas()
        dim = centroids.shape[1]
        sums = np.zeros((k, dim))
        counts = np.zeros(k, np.int64)
        for cid, vsum, n in zip(partials["cid"], partials["vsum"],
                                partials["n"]):
            sums[cid] += np.asarray(vsum)
            counts[cid] += n
        new_inertia = float(partials["inertia"].sum())
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
    return {"centroids": centroids, "inertia": inertia, "iters": iters}


def kmeans_assign(ds: Dataset, centroids: np.ndarray, *,
                  vec_col: str = "embedding",
                  out_col: str = "cluster") -> Dataset:
    """Stamp the nearest-centroid index (the IVF bucket column)."""
    ref = ray.put(np.asarray(centroids, np.float64)) \
        if ray.is_initialized() else np.asarray(centroids, np.float64)

    class Assign:
        def __init__(self, ref):
            self.c = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_mat(batch, vec_col))
            assign = (m @ self.c.T).argmax(axis=1)
            return batch.append_column(out_col,
                                       pa.array(assign.astype(np.int64)))

    return ds.map_batches(Assign, fn_constructor_args=(ref,),
                          batch_format="pyarrow", batch_size=None,
                          concurrency=actor_pool_size())
