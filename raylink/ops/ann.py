"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_brute_force` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch computes a partial top-k with a
  numpy matmul, and partials reduce on the driver. One streaming pass, no
  shuffle.
* :func:`knn_ivf` — IVF-style scale path: k-means-lite coarse centroids
  (sampled, seeded), vectors bucketed by nearest centroid at index time;
  queries probe only the ``nprobe`` nearest buckets.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _to_matrix(col, dtype=np.float64) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=dtype)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return mat / norm


def knn_brute_force(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: set | None = None,
) -> list[list[tuple[float, int]]]:
    """Exact cosine top-k for each query row.

    Returns, per query, a list of (cosine, id) sorted descending (ties by
    ascending id — deterministic). The dataset streams; only per-batch
    top-k partials reach the driver."""
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    q_ref = ray.put(q)
    nq = q.shape[0]
    excl = exclude_ids or set()

    class _PartialTopK:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column(id_col).to_pylist())
            mat = _normalize(_to_matrix(batch.column(emb_col)))
            sims = mat @ self.q.T  # (n, nq)
            out_q, out_id, out_sim = [], [], []
            for qi in range(self.q.shape[0]):
                col = sims[:, qi]
                top = min(k + len(excl), len(col))
                idx = np.argpartition(-col, top - 1)[:top] if top < len(col) else np.arange(len(col))
                for i in idx:
                    out_q.append(qi)
                    out_id.append(int(ids[i]))
                    out_sim.append(float(col[i]))
            return pa.table(
                {
                    "q": pa.array(out_q, type=pa.int32()),
                    id_col: pa.array(out_id, type=pa.int64()),
                    "cosine": pa.array(out_sim, type=pa.float64()),
                }
            )

    partials = ds.map_batches(_PartialTopK, batch_format="pyarrow", concurrency=(1, 4)).to_pandas()
    results: list[list[tuple[float, int]]] = []
    for qi in range(nq):
        sub = partials[partials["q"] == qi]
        cand = [
            (s, i)
            for s, i in zip(sub["cosine"], sub[id_col])
            if i not in excl
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        results.append(cand[:k])
    return results


def build_ivf_index(
    ds: ray.data.Dataset,
    num_centroids: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    sample_size: int = 2048,
    iters: int = 5,
) -> tuple[np.ndarray, ray.data.Dataset]:
    """Coarse quantizer + bucketed dataset: seeded mini k-means on a driver
    sample, then one streaming pass assigns every vector to its nearest
    centroid (``bucket`` column). Returns (centroids, bucketed_ds)."""
    samp = ds.limit(sample_size).to_pandas()
    mat = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in samp[emb_col]]))
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(num_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    cent_ref = ray.put(cent)

    class _Assign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(_to_matrix(batch.column(emb_col)))
            bucket = np.argmax(mat @ self.cent.T, axis=1)
            return batch.append_column(
                "bucket", pa.array(bucket.astype(np.int64))
            )

    return cent, ds.map_batches(_Assign, batch_format="pyarrow", concurrency=(1, 4))


def knn_ivf(
    bucketed: ray.data.Dataset,
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[tuple[float, int]]]:
    """Probe only the ``nprobe`` nearest centroid buckets per query —
    the approximate scale path (recall < 1 by design, bounded by nprobe)."""
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    wanted = sorted({int(b) for row in probe for b in row})

    filt = bucketed.filter(expr=f"bucket in {wanted}")
    sub = filt.to_pandas()
    mat = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in sub[emb_col]]))
    ids = sub[id_col].to_numpy()
    buckets = sub["bucket"].to_numpy()

    out = []
    for qi in range(q.shape[0]):
        mask = np.isin(buckets, probe[qi])
        sims = mat[mask] @ q[qi]
        sel_ids = ids[mask]
        heap = heapq.nlargest(k, zip(sims, sel_ids), key=lambda t: (t[0], -t[1]))
        out.append([(float(s), int(i)) for s, i in heap])
    return out
