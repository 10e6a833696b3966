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

from raylink.util import actor_pool_size


def _to_matrix(col, dtype=np.float64) -> np.ndarray:
    """Zero-copy-ish (n, dim) view of an Arrow embedding column:
    FixedSizeList and uniform-width List reshape the flat value buffer
    directly; only ragged input falls back to the Python-object path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        vals = col.flatten().to_numpy(zero_copy_only=False)
        return vals.reshape(len(col), col.type.list_size).astype(dtype, copy=False)
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        widths = np.diff(col.offsets.to_numpy())
        if len(widths) and (widths == widths[0]).all():
            vals = col.flatten().to_numpy(zero_copy_only=False)
            return vals.reshape(len(col), int(widths[0])).astype(dtype, copy=False)
    return np.asarray(col.to_pylist(), dtype=dtype)


def _empty_partial(id_col: str) -> pa.Table:
    return pa.table(
        {
            "q": pa.array([], type=pa.int32()),
            id_col: pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        }
    )


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
            if len(batch) == 0:
                return _empty_partial(id_col)
            ids = np.asarray(batch.column(id_col).to_pylist())
            mat = _normalize(_to_matrix(batch.column(emb_col)))
            sims = mat @ self.q.T  # (n, nq)
            out_q, out_id, out_sim = [], [], []
            for qi in range(self.q.shape[0]):
                col = sims[:, qi]
                top = min(k + len(excl), len(col))
                # Tie-consistent partial selection: order by (cosine desc,
                # id asc) — the same tie-break the final merge uses — so a
                # tie at the k-th boundary keeps the row the global
                # selection would keep.
                idx = np.lexsort((ids, -col))[:top]
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

    partials = ds.map_batches(_PartialTopK, batch_format="pyarrow", concurrency=(1, actor_pool_size())).to_pandas()
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
    centroids: np.ndarray | None = None,
) -> tuple[np.ndarray, ray.data.Dataset]:
    """Coarse quantizer + bucketed dataset: seeded mini k-means on a driver
    sample, then one streaming pass assigns every vector to its nearest
    centroid (``bucket`` column). Returns (centroids, bucketed_ds).

    The sample is a seeded ``random_sample`` over the whole dataset —
    ``limit()`` would take the first blocks only and bias the centroids
    toward however the input happens to be ordered.

    Pass ``centroids`` (e.g. from :func:`raylink.ops.kmeans.kmeans`, the
    full-data distributed fit) to skip the sample fit entirely — the
    right quantizer source at 10^12 rows, where a 2k-row sample
    underrepresents the tail."""
    if centroids is not None:
        cent = _normalize(np.asarray(centroids, dtype=np.float64))
        cent_ref0 = ray.put(cent)

        class _AssignPre:
            def __init__(self):
                self.cent = ray.get(cent_ref0)

            def __call__(self, batch: pa.Table) -> pa.Table:
                mat = _normalize(_to_matrix(batch.column(emb_col)))
                bucket = np.argmax(mat @ self.cent.T, axis=1)
                return batch.append_column(
                    "bucket", pa.array(bucket.astype(np.int64))
                )

        return cent, ds.map_batches(
            _AssignPre, batch_format="pyarrow", concurrency=(1, actor_pool_size())
        )
    n_total = ds.count()
    if n_total > sample_size:
        frac = min(1.0, (sample_size * 1.2) / max(n_total, 1))
        samp = ds.random_sample(frac, seed=seed).limit(sample_size).to_pandas()
    else:
        samp = ds.to_pandas()
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

    return cent, ds.map_batches(_Assign, batch_format="pyarrow", concurrency=(1, actor_pool_size()))


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
    the approximate scale path (recall < 1 by design, bounded by nprobe).

    Streaming: probed buckets are filtered map-side and each batch emits a
    per-query partial top-k (the ``knn_brute_force`` pattern); only
    O(batches × nq × k) partial rows reach the driver, never the probed
    buckets' vectors (which are O(n·nprobe/centroids) rows at scale)."""
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    nq = q.shape[0]
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    allowed = np.zeros((nq, len(centroids)), dtype=bool)
    for qi in range(nq):
        allowed[qi, probe[qi]] = True
    wanted = sorted({int(b) for row in probe for b in row})

    filt = bucketed.filter(expr=f"bucket in {wanted}")
    q_ref = ray.put((q, allowed))

    class _ProbeTopK:
        def __init__(self):
            self.q, self.allowed = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                # The bucket filter can leave empty blocks; _to_matrix
                # would yield a 1-D (0,) array and _normalize would raise.
                return _empty_partial(id_col)
            ids = np.asarray(batch.column(id_col).to_pylist())
            buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
            mat = _normalize(_to_matrix(batch.column(emb_col)))
            sims = mat @ self.q.T  # (n, nq)
            out_q, out_id, out_sim = [], [], []
            for qi in range(self.q.shape[0]):
                mask = self.allowed[qi, buckets]
                if not mask.any():
                    continue
                col = sims[mask, qi]
                sel_ids = ids[mask]
                top = min(k, len(col))
                # Tie-consistent with the final heap's (cosine, -id) order.
                idx = np.lexsort((sel_ids, -col))[:top]
                out_q.extend([qi] * len(idx))
                out_id.extend(int(i) for i in sel_ids[idx])
                out_sim.extend(float(s) for s in col[idx])
            return pa.table(
                {
                    "q": pa.array(out_q, type=pa.int32()),
                    id_col: pa.array(out_id, type=pa.int64()),
                    "cosine": pa.array(out_sim, type=pa.float64()),
                }
            )

    partials = filt.map_batches(
        _ProbeTopK, batch_format="pyarrow", concurrency=(1, actor_pool_size())
    ).to_pandas()

    out = []
    for qi in range(nq):
        sub = partials[partials["q"] == qi]
        heap = heapq.nlargest(
            k, zip(sub["cosine"], sub[id_col]), key=lambda t: (t[0], -t[1])
        )
        out.append([(float(s), int(i)) for s, i in heap])
    return out
