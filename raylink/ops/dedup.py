"""Deduplication operators (training-data pipeline suite):

* exact — content-hash partition + per-group min-id survivor
* MinHash + LSH — shingle → minhash signature → banded bucket groupby →
  candidate pairs → Jaccard verify
* SimHash — 64-bit near-dup signature + hamming-bucket grouping
* n-gram Jaccard — verified pairwise Jaccard on shingle sets
* embedding cosine — near-dup pairs over an embedding column

Each follows the map-side-sketch → small-shuffle pattern: per-batch
vectorized signature computation, then a groupby keyed on the signature
(or band), never an all-pairs pass over the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min


def _sha1_int(data: bytes) -> int:
    return int.from_bytes(hashlib.sha1(data).digest()[:8], "little") & ((1 << 63) - 1)


# --------------------------------------------------------------------------
# Exact dedup


def dedup_exact(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Exact dedup: hash the content, keep the min-id row per hash.

    ``groupby(content_hash).min(id)`` — the survivor rule is deterministic
    (smallest id), the shuffle key is the 63-bit content hash (uniform, no
    skew), and only (hash, id) pairs move — not the content."""

    def _hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = pa.array([_sha1_int(t.encode()) for t in texts], type=pa.int64())
        return pa.table({ "content_hash": h, id_col: batch.column(id_col)})

    return (
        ds.map_batches(_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )


# --------------------------------------------------------------------------
# MinHash + LSH

_MERSENNE = (1 << 61) - 1


def _shingles(text: str, k: int = 5) -> set[int]:
    t = " ".join(text.lower().split())
    if len(t) < k:
        return {_sha1_int(t.encode())} if t else set()
    return {_sha1_int(t[i : i + k].encode()) for i in range(len(t) - k + 1)}


class MinHasher:
    """Per-batch minhash signatures: universal-hash family
    h_i(x) = (a_i * x + b_i) mod p, seeded."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 42,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
        self.num_perm = num_perm
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, _MERSENNE - 1, dtype=np.int64)
        x = np.fromiter(sh, dtype=np.int64, count=len(sh)).astype(object)
        # (num_perm, n_shingles) via broadcasting on object ints (exact mod)
        sig = np.empty(self.num_perm, dtype=np.int64)
        for i in range(self.num_perm):
            sig[i] = int(min((self.a[i] * xi + self.b[i]) % _MERSENNE for xi in x))
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = np.stack([self.signature(t) for t in texts])
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "signature": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), type=pa.int64()), self.num_perm
                ),
            }
        )


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """MinHash-LSH candidate pairs: signature → explode to (band, band_hash,
    id) rows → groupby band bucket → within-bucket pairs (id_a < id_b),
    deduped across bands. Returns a Dataset of (id_a, id_b)."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, k=k, seed=seed, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sig = np.asarray(
            batch.column("signature").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(len(ids), num_perm)
        out_band, out_hash, out_id = [], [], []
        for i, did in enumerate(ids):
            for b in range(bands):
                chunk = sig[i, b * rows_per_band : (b + 1) * rows_per_band]
                out_band.append(b)
                out_hash.append(_sha1_int(chunk.tobytes()))
                out_id.append(did)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
                id_col: pa.array(out_id),
            }
        )

    exploded = sigs.map_batches(_bands, batch_format="pyarrow")

    def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group[id_col].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"id_a": a, "id_b": b})

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # dedup pairs surfacing from multiple bands
    return pairs.groupby(["id_a", "id_b"]).aggregate(Min("id_a", alias_name="_m")).select_columns(["id_a", "id_b"])


def verify_jaccard(
    pairs: ray.data.Dataset,
    ds: ray.data.Dataset,
    threshold: float = 0.7,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Verify candidate pairs with true shingle Jaccard: broadcast the
    (small) candidate ids' texts, compute per-pair Jaccard map-side."""
    import ray

    cand = pairs.to_pandas()
    need = set(cand["id_a"]) | set(cand["id_b"])

    def _flt(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        mask = pa.array([i in need for i in ids], type=pa.bool_())
        return batch.filter(mask)

    texts = ds.map_batches(_flt, batch_format="pyarrow").select_columns([id_col, text_col]).to_pandas()
    text_map = dict(zip(texts[id_col], texts[text_col]))
    ref = ray.put(text_map)

    class _Verify:
        def __init__(self):
            self.texts = ray.get(ref)
            self.cache: dict[int, set] = {}

        def _sh(self, i):
            if i not in self.cache:
                self.cache[i] = _shingles(self.texts.get(i, ""), k)
            return self.cache[i]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ia = batch.column("id_a").to_pylist()
            ib = batch.column("id_b").to_pylist()
            jac = []
            for a, b in zip(ia, ib):
                sa, sb = self._sh(a), self._sh(b)
                u = len(sa | sb)
                jac.append(len(sa & sb) / u if u else 0.0)
            batch = batch.append_column("jaccard", pa.array(jac, type=pa.float64()))
            return batch.filter(
                pa.array([j >= threshold for j in jac], type=pa.bool_())
            )

    return pairs.map_batches(_Verify, batch_format="pyarrow", concurrency=(1, 4))


# --------------------------------------------------------------------------
# SimHash


class SimHasher:
    """64-bit SimHash over word unigrams (weighted by count)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in text.lower().split():
            h = _sha1_int(w.encode())
            for bit in range(64):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        out = 0
        for bit in range(64):
            if acc[bit] > 0:
                out |= 1 << bit
        return out & ((1 << 63) - 1)  # keep int64-safe

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        h = pa.array([self.simhash(t) for t in texts], type=pa.int64())
        return pa.table({self.id_col: batch.column(self.id_col), "simhash": h})


def simhash_signatures(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    return ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def simhash_near_dups(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: group on 16-bit bands of the signature
    (a pair within hamming distance ≤3 of 64 bits shares at least one of 4
    bands by pigeonhole), verify hamming distance within buckets."""
    sigs = simhash_signatures(ds, text_col, id_col)

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = batch.column("simhash").to_pylist()
        ob, oh, oi, os = [], [], [], []
        for i, h in zip(ids, hs):
            for b in range(4):
                ob.append(b)
                oh.append((h >> (16 * b)) & 0xFFFF)
                oi.append(i)
                os.append(h)
        return pa.table(
            {
                "band": pa.array(ob, type=pa.int32()),
                "band_val": pa.array(oh, type=pa.int32()),
                id_col: pa.array(oi),
                "simhash": pa.array(os, type=pa.int64()),
            }
        )

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(group[id_col], group["simhash"]))
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin(rows[i][1] ^ rows[j][1]).count("1")
                if ham <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(ham)
        return pd.DataFrame({"id_a": a, "id_b": b, "hamming": d})

    pairs = (
        sigs.map_batches(_bands, batch_format="pyarrow")
        .groupby(["band", "band_val"])
        .map_groups(_pairs, batch_format="pandas")
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup


def embedding_near_dups(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    num_buckets: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Scale path: random-hyperplane LSH — bucket on the sign pattern of
    ``ceil(log2(num_buckets))`` random projections, replicating nothing; at
    high thresholds near-dups land in the same bucket with high probability
    (candidate recall is sketch-bounded, stated, not silent). Within-bucket
    exact cosine verify.
    """
    n_planes = max(1, int(np.ceil(np.log2(num_buckets))))

    class _Bucket:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            embs = batch.column(emb_col)
            mat = np.asarray(embs.to_pylist(), dtype=np.float64)
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.normal(size=(mat.shape[1], n_planes))
            signs = (mat @ self.planes) > 0
            bucket = signs @ (1 << np.arange(n_planes))
            norm = np.linalg.norm(mat, axis=1, keepdims=True)
            norm[norm == 0] = 1.0
            mat = mat / norm
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "bucket": pa.array(bucket.astype(np.int64)),
                    "emb": pa.array(list(mat), type=pa.list_(pa.float64())),
                }
            )

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        mat = np.stack(group["emb"].to_numpy())
        sims = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        order = np.argsort(ids)
        inv_ids = ids
        return pd.DataFrame(
            {
                "id_a": np.minimum(inv_ids[ii[keep]], inv_ids[jj[keep]]),
                "id_b": np.maximum(inv_ids[ii[keep]], inv_ids[jj[keep]]),
                "cosine": sims[ii, jj][keep],
            }
        )

    return (
        ds.map_batches(_Bucket, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
    )
