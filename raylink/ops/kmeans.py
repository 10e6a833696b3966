"""Distributed spherical k-means over an embedding column.

The IVF index (``ops/ann.py build_ivf_index``) fits its coarse quantizer
on a driver-side sample — fine for a 16-centroid bucketer, but a real
topic-clustering / curriculum-bucketing pass over 10^12 embeddings needs
Lloyd's iterations over ALL vectors.  The scale shape here:

  - centroids are broadcast once per iteration (``ray.put``, k x d
    float64 — megabytes, not data-scale),
  - each batch computes its assignment with one matmul and emits a
    PARTIAL per-cluster (sum-vector, count) — at most k slim rows per
    batch, so the driver reduce sees O(k * num_batches) rows, never the
    data,
  - the driver folds partials and renormalizes; empty clusters keep
    their previous centroid (no re-seeding, keeps the fit deterministic).

Init is the ``n smallest (id_hash(id), id)`` rows — the same
deterministic hash-ordered selection :func:`raylink.ops.sample.
stratified_sample` uses — so the whole fit is a pure function of the
data: no RNG, resumable, and pinnable in tests.

Spherical variant (normalize rows AND centroids, similarity = cosine via
dot product) because every downstream consumer here (ANN, near-dup
verify) is cosine-based.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from raylink.ops.ann import _normalize, _to_matrix
from raylink.ops.sample import id_hash


def _seed_centroids(
    ds: ray.data.Dataset, k: int, emb_col: str, id_col: str
) -> np.ndarray:
    """The k rows with smallest (id_hash(id), id): per-batch partial top-k
    (<= k rows leave each batch), global top-k on the driver."""

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return batch
        h = id_hash(ids).astype(np.int64)
        order = np.lexsort((ids, h))[:k]
        return batch.take(pa.array(order))

    parts = ds.select_columns([id_col, emb_col]).map_batches(
        _partial, batch_format="pyarrow"
    ).to_pandas()
    ids = parts[id_col].to_numpy().astype(np.int64)
    order = np.lexsort((ids, id_hash(ids).astype(np.int64)))[:k]
    top = parts.iloc[order]
    return _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in top[emb_col]]))


def kmeans(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    tol: float = 1e-6,
) -> np.ndarray:
    """Fit k spherical centroids with full-data Lloyd's iterations.
    Returns the (k, d) float64 centroid matrix (unit rows)."""
    cent = _seed_centroids(ds, k, emb_col, id_col)
    kk, d = cent.shape
    for _ in range(iters):
        cent_ref = ray.put(cent)

        def _partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            if len(batch) == 0:
                return pa.table(
                    {
                        "c": pa.array([], type=pa.int64()),
                        "n": pa.array([], type=pa.int64()),
                        "s": pa.array([], type=pa.list_(pa.float64())),
                    }
                )
            mat = _normalize(_to_matrix(batch.column(emb_col)))
            assign = np.argmax(mat @ c.T, axis=1)
            present = np.unique(assign)
            sums = np.zeros((len(present), mat.shape[1]))
            counts = np.zeros(len(present), dtype=np.int64)
            for j, cid in enumerate(present):
                m = assign == cid
                sums[j] = mat[m].sum(axis=0)
                counts[j] = int(m.sum())
            return pa.table(
                {
                    "c": pa.array(present.astype(np.int64)),
                    "n": pa.array(counts),
                    "s": pa.array(list(sums), type=pa.list_(pa.float64())),
                }
            )

        parts = ds.map_batches(_partials, batch_format="pyarrow").to_pandas()
        new = cent.copy()
        shift = 0.0
        for cid, grp in parts.groupby("c"):
            total = np.sum(np.stack(grp["s"].to_numpy()), axis=0)
            norm = np.linalg.norm(total)
            if norm > 0:
                v = total / norm
                shift = max(shift, float(np.abs(v - cent[int(cid)]).max()))
                new[int(cid)] = v
        cent = new
        if shift < tol:
            break
    return cent


def assign_clusters(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    out_col: str = "cluster",
) -> ray.data.Dataset:
    """Append argmax-cosine cluster ids (one broadcast, one matmul/batch)."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], type=pa.int64()))
        mat = _normalize(_to_matrix(batch.column(emb_col)))
        return batch.append_column(
            out_col, pa.array(np.argmax(mat @ c.T, axis=1).astype(np.int64))
        )

    return ds.map_batches(_assign, batch_format="pyarrow")


def grouped_vector_mean(
    ds: ray.data.Dataset,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact per-group embedding centroid evidence: emits LONG rows
    ``(group, dim, n, sum_e6)`` where each vector component quantizes to
    e6 micro-units (float32 promoted to float64 first, matching SQL's
    float→DOUBLE read of the same bits) BEFORE summing — both aggregates
    are exact int64 and order-free, so the centroid ``sum_e6 / n / 1e6``
    is a pure function of the data and the DuckDB replay
    (``unnest``/``generate_subscripts`` + ``SUM``) is bit-exact.

    The class-centroid shape (label-conditioned prototypes, LDA-style
    means, k-means M-step over fixed assignments): per-batch partials
    reduce each batch to (groups_in_batch × dim) rows via one
    ``np.add.at`` scatter — the exchange moves partials bounded by
    |groups|·dim per batch, never the vectors."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _to_matrix(batch.column(vec_col)).astype(np.float64)
        v6 = np.round(mat * 1e6).astype(np.int64)
        codes, uniq = pd.factorize(g, sort=True)
        sums = np.zeros((len(uniq), v6.shape[1]), dtype=np.int64)
        np.add.at(sums, codes, v6)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        k, d = sums.shape
        return pa.table(
            {
                group_col: pa.array(np.repeat(uniq, d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), k)),
                "n": pa.array(np.repeat(counts, d)),
                "sum_e6": pa.array(sums.reshape(-1)),
            }
        )

    return (
        ds.select_columns([group_col, vec_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby([group_col, "dim"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_e6", alias_name="sum_e6"))
    )
