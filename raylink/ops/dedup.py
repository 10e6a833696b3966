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
import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from raylink.util import actor_pool_size
from ray.data.aggregate import Count, Min

_log = logging.getLogger(__name__)


def _pairs_in_hot_buckets(
    exploded: ray.data.Dataset,
    bucket_cols: list[str],
    pair_fn,
) -> ray.data.Dataset:
    """Run a per-bucket pair generator only over buckets holding ≥2 rows.

    ``map_groups`` costs ~1ms per group; an LSH explosion has one bucket per
    (doc, band) — almost all singletons. A cheap ``groupby().count()``
    aggregate finds the hot buckets (their number ≈ number of duplicate
    groups, broadcast as a set), singletons are filtered out map-side, and
    the expensive per-group python only touches real candidates.

    The exploded table is consumed twice (count pass + survivor filter);
    it lands on tracked parquet (``util.make_spill_dir``) rather than
    being pinned in the object store — deterministic memory bound at
    ~bands×N rows, and the count pass reads ONLY the bucket columns
    (pruned scan). The hot-set size is logged: it is collected to the
    driver, which is fine while hot buckets ≈ duplicate groups but worth
    watching on a degenerate corpus where every bucket collides."""

    def _combine(batch: pa.Table) -> np.ndarray:
        """Single-uint64 combine of the bucket columns (mix64-folded).
        Collisions only ever ADD a bucket to the hot set — the later
        groupby still keys on the true bucket columns, so a collision
        costs one harmless singleton group, never a wrong pair."""
        acc = np.full(len(batch), np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
        for c in bucket_cols:
            vals = batch.column(c).to_numpy(zero_copy_only=False).astype(np.uint64)
            acc = _mix64(acc ^ vals)
        return acc

    from raylink.util import make_spill_dir

    spill_dir = make_spill_dir("raylink_lsh_")
    exploded.write_parquet(spill_dir)
    exploded = ray.data.read_parquet(spill_dir)
    counts = (
        ray.data.read_parquet(spill_dir, columns=list(bucket_cols))
        .groupby(bucket_cols)
        .aggregate(Count(alias_name="_n"))
    )
    hot_tbl = counts.filter(expr="_n >= 2").select_columns(bucket_cols).to_arrow_refs()
    hot_batches = [ray.get(r) for r in hot_tbl]
    hot_combined = (
        np.concatenate([_combine(t) for t in hot_batches if len(t)])
        if any(len(t) for t in hot_batches)
        else np.empty(0, dtype=np.uint64)
    )
    if len(hot_combined) == 0:
        cols = exploded.schema().names
        empty = pair_fn(pd.DataFrame({c: [] for c in cols}))
        if isinstance(empty, pa.Table):
            return ray.data.from_arrow(empty)
        return ray.data.from_pandas(empty)
    hot_set = np.unique(hot_combined)
    _log.info(
        "lsh hot buckets: %d of ~%d exploded rows", len(hot_set), exploded.count()
    )
    ref = ray.put(pa.array(hot_set))

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        value_set: pa.Array = ray.get(ref)
        combined = pa.array(_combine(batch))
        return batch.filter(pc.is_in(combined, value_set=value_set))

    survivors = exploded.map_batches(_filter, batch_format="pyarrow")
    # pandas per-group conversion costs ~1ms/group; with thousands of hot
    # buckets the pair fn must be arrow-native (pair_fn takes pa.Table when
    # arrow=True via attribute convention)
    fmt = getattr(pair_fn, "batch_format", "pandas")
    return survivors.groupby(bucket_cols).map_groups(pair_fn, batch_format=fmt)


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


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized on uint64 (wrapping arithmetic)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _shingle_codes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-gram hash codes of the whitespace-normalized lowercased
    text, fully vectorized: byte windows → polynomial code → mix64 → unique."""
    t = " ".join(text.lower().split())
    raw = t.encode("utf-8", errors="ignore")
    if len(raw) < k:
        if not raw:
            return np.empty(0, dtype=np.uint64)
        pad = raw + b"\x00" * (k - len(raw))
        arr = np.frombuffer(pad, dtype=np.uint8).astype(np.uint64)
    else:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
    n = max(len(arr) - k + 1, 1)
    powers = np.uint64(257) ** np.arange(k, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(arr, min(k, len(arr)))[:n]
    codes = (win * powers[: win.shape[1]]).sum(axis=1, dtype=np.uint64)
    return np.unique(_mix64(codes))


def _shingles(text: str, k: int = 5) -> set[int]:
    """Set view of the shingle codes (used by the exact-Jaccard verifier)."""
    return set(_shingle_codes(text, k).tolist())


class MinHasher:
    """Per-batch minhash signatures: h_i(x) = mix64(x ^ seed_i), min over
    the document's shingle codes — a seeded xor-mix universal family,
    computed as one (num_perm × n_shingles) vectorized broadcast."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 42,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        codes = _shingle_codes(text, self.k)
        if len(codes) == 0:
            return np.full(self.num_perm, (1 << 63) - 1, dtype=np.int64)
        sig = _mix64(codes[None, :] ^ self.seeds[:, None]).min(axis=1)
        return (sig & np.uint64((1 << 63) - 1)).astype(np.int64)

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
        concurrency=(1, actor_pool_size()),
    )

    def _bands(batch: pa.Table) -> pa.Table:
        """Band explosion, vectorized: the per-(row, band) bucket id folds
        the band's signature lanes through the splitmix64 finalizer (one
        ``_mix64`` pass per lane over ALL rows at once) instead of a
        per-row sha1 loop. Any injective-enough combine gives the same LSH
        bucket semantics (identical band signatures ⇒ identical hash)."""
        n = len(batch)
        sig = np.asarray(
            batch.column("signature").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(n, num_perm).astype(np.uint64)
        band_hash = np.empty((n, bands), dtype=np.uint64)
        for b in range(bands):
            seed_b = (0x9E3779B97F4A7C15 ^ (b * 0x2545F4914F6CDD1D)) & ((1 << 64) - 1)
            h = np.full(n, np.uint64(seed_b), dtype=np.uint64)
            for c in range(b * rows_per_band, (b + 1) * rows_per_band):
                h = _mix64(h ^ sig[:, c])
            band_hash[:, b] = h
        band_idx = np.tile(np.arange(bands, dtype=np.int32), n)
        ids_rep = batch.column(id_col).take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        )
        return pa.table(
            {
                "band": pa.array(band_idx),
                "band_hash": pa.array(
                    (band_hash.reshape(-1) & np.uint64((1 << 63) - 1)).astype(np.int64)
                ),
                id_col: ids_rep,
            }
        )

    exploded = sigs.map_batches(_bands, batch_format="pyarrow")

    def _bucket_pairs(group) -> pa.Table:
        ids = np.sort(np.asarray(group[id_col] if isinstance(group, pd.DataFrame) else group.column(id_col).to_numpy(zero_copy_only=False)))
        k = len(ids)
        if k < 2:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64())})
        ii, jj = np.triu_indices(k, k=1)
        return pa.table({"id_a": pa.array(ids[ii]), "id_b": pa.array(ids[jj])})

    _bucket_pairs.batch_format = "pyarrow"
    pairs = _pairs_in_hot_buckets(exploded, ["band", "band_hash"], _bucket_pairs)
    # dedup pairs surfacing from multiple bands
    return pairs.groupby(["id_a", "id_b"]).aggregate(Min("id_a", alias_name="_m")).select_columns(["id_a", "id_b"])


def verify_jaccard(
    pairs: ray.data.Dataset,
    ds: ray.data.Dataset,
    threshold: float = 0.7,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    emit_counts: bool = False,
) -> ray.data.Dataset:
    """Verify candidate pairs with true shingle Jaccard, fully distributed.

    With ``emit_counts`` the output carries the exact integer
    ``n_common``/``n_union`` shingle-set sizes alongside ``jaccard`` —
    SQL-replayable ground truth (for k=5 ASCII text the shingle hash is
    injective, so the counts equal distinct 5-char-substring counts; see
    the ``minhash_dedup`` DuckDB oracle), with no float rounding in the
    compared values.

    The texts are attached to the pair stream by TWO hash-partitioned
    shuffle joins (``util.shuffle_merge``) — one per endpoint — instead of
    collecting the candidate set and broadcasting a driver-built text map
    (which dies when the candidate ids' texts exceed one machine). Each
    verify batch then computes both shingle sets locally, memoizing per
    worker since a duplicate-heavy corpus repeats ids across pairs."""
    from raylink.util import shuffle_merge

    texts = ds.select_columns([id_col, text_col])

    s1 = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("_text_a", pa.string())]
    )
    s2 = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()),
         ("_text_a", pa.string()), ("_text_b", pa.string())]
    )

    def _attach(side: str, out_col: str):
        def _m(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
            rdf = rdf.drop_duplicates(subset=[id_col]).rename(
                columns={id_col: side, text_col: out_col}
            )
            return ldf.merge(rdf, how="left", on=side)

        return _m

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    text_schema = pa.schema([(id_col, pa.int64()), (text_col, pa.string())])
    j1 = shuffle_merge(
        pairs.select_columns(["id_a", "id_b"]), texts,
        ["id_a"], [id_col], _attach("id_a", "_text_a"), s1,
        num_partitions=num_partitions,
        left_schema=pair_schema, right_schema=text_schema,
    )
    j2 = shuffle_merge(
        j1, texts, ["id_b"], [id_col], _attach("id_b", "_text_b"), s2,
        num_partitions=num_partitions,
        left_schema=s1, right_schema=text_schema,
    )

    class _Verify:
        def __init__(self):
            self.cache: dict[str, set] = {}

        def _sh(self, t: str) -> set:
            got = self.cache.get(t)
            if got is None:
                got = self.cache[t] = _shingles(t or "", k)
                if len(self.cache) > 4096:
                    self.cache.clear()
            return got

        def __call__(self, batch: pa.Table) -> pa.Table:
            ta = batch.column("_text_a").to_pylist()
            tb = batch.column("_text_b").to_pylist()
            jac = np.empty(len(ta), dtype=np.float64)
            ni = np.empty(len(ta), dtype=np.int64)
            nu = np.empty(len(ta), dtype=np.int64)
            for i, (a, b) in enumerate(zip(ta, tb)):
                sa, sb = self._sh(a), self._sh(b)
                inter = len(sa & sb)
                u = len(sa) + len(sb) - inter
                ni[i], nu[i] = inter, u
                jac[i] = inter / u if u else 0.0
            keep = jac >= threshold
            cols = {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
            if emit_counts:
                cols["n_common"] = pa.array(ni)
                cols["n_union"] = pa.array(nu)
            return pa.table(cols).filter(pa.array(keep))

    return j2.map_batches(_Verify, batch_format="pyarrow", concurrency=(1, actor_pool_size()))


# --------------------------------------------------------------------------
# SimHash


import re as _re

_NONWS_ASCII = _re.compile(r"\S+", _re.ASCII)


def _md5_word_int(w: str) -> int:
    """63-bit word hash = DuckDB's ``md5_number_lower`` (bytes 8..16 of the
    md5 digest, little-endian) masked to 63 bits — chosen so the SQL oracle
    can recompute SimHash signatures bit-exactly."""
    return int.from_bytes(hashlib.md5(w.encode()).digest()[8:16], "little") & (
        (1 << 63) - 1
    )


class SimHasher:
    """64-bit SimHash over word unigrams (weighted by count).

    Word hash + tokenization are DuckDB-reproducible (md5_number_lower,
    RE2-compatible ASCII ``\\S+`` split) so ``simhash_dedup`` is covered by
    the SQL correctness gate."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash(text: str) -> int:
        """Vectorized: per-word 64-bit hashes unpack to a (n_words, 64) bit
        matrix in one ``np.unpackbits`` call; the ±1 vote and sign-pack are
        numpy reductions (bit-identical to the per-bit loop it replaces)."""
        words = _NONWS_ASCII.findall(text.lower())
        if not words:
            return 0
        hs = np.fromiter(
            (_md5_word_int(w) for w in words), dtype=np.uint64, count=len(words)
        )
        bits = np.unpackbits(
            hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        packed = np.packbits((acc > 0).astype(np.uint8), bitorder="little")
        out = int.from_bytes(packed.tobytes(), "little")
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
        concurrency=(1, actor_pool_size()),
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
        """Band explosion, vectorized: the (n, 4) 16-bit band values come
        from one shift-and-mask broadcast over the signature column; rows
        repeat via take/np.repeat — no per-row Python."""
        n = len(batch)
        hs = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        band_vals = ((hs[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)).astype(
            np.int32
        )
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), 4))
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_val": pa.array(band_vals.reshape(-1)),
                id_col: batch.column(id_col).take(rep),
                "simhash": batch.column("simhash").take(rep),
            }
        )

    def _pairs(group) -> pa.Table:
        if isinstance(group, pd.DataFrame):
            ids = group[id_col].to_numpy()
            sh = group["simhash"].to_numpy()
        else:
            ids = group.column(id_col).to_numpy(zero_copy_only=False)
            sh = group.column("simhash").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, sh = ids[order], sh[order].astype(np.uint64)
        k = len(ids)
        if k < 2:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        ii, jj = np.triu_indices(k, k=1)
        x = sh[ii] ^ sh[jj]
        # vectorized popcount via uint8 view + lookup table
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
        keep = ham <= max_hamming
        return pa.table({"id_a": pa.array(ids[ii[keep]].astype(np.int64)),
                         "id_b": pa.array(ids[jj[keep]].astype(np.int64)),
                         "hamming": pa.array(ham[keep].astype(np.int64))})

    _pairs.batch_format = "pyarrow"
    exploded = sigs.map_batches(_bands, batch_format="pyarrow")
    pairs = _pairs_in_hot_buckets(exploded, ["band", "band_val"], _pairs)
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup


def lsh_band_signatures(
    ds: ray.data.Dataset,
    bands: int,
    bits_per_band: int,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> ray.data.Dataset:
    """Random-hyperplane band signatures, exploded to (band, bucket, id)
    rows: ONE (dim × bands·r) matmul per batch, sign bits packed into
    per-band int64 bucket codes. Exposed separately so bucket-occupancy
    stats are observable (tests pin the max-bucket-size bound)."""
    from raylink.ops.ann import _to_matrix

    r = bits_per_band

    class _Sig:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _to_matrix(batch.column(emb_col), dtype=np.float32)
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.normal(size=(mat.shape[1], bands * r)).astype(
                    np.float32
                )
            signs = (mat @ self.planes) > 0  # (n, bands*r)
            weights = 1 << np.arange(r, dtype=np.int64)
            codes = signs.reshape(len(mat), bands, r) @ weights  # (n, bands)
            n = len(mat)
            ids_rep = batch.column(id_col).take(
                pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
            )
            return pa.table(
                {
                    "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                    "bucket": pa.array(codes.reshape(-1).astype(np.int64)),
                    id_col: ids_rep,
                }
            )

    return ds.map_batches(_Sig, batch_format="pyarrow", concurrency=(1, actor_pool_size()))


def embedding_near_dups(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 16,
    bits_per_band: int | None = None,
    target_bucket_rows: int = 64,
    seed: int = 42,
    dim: int | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs by embedding cosine ≥ threshold — real
    multi-band random-hyperplane LSH (the r1 single-table version put ~n/8
    of the corpus in each bucket: an O(n²) all-pairs in disguise).

    * ``bands`` independent hyperplane tables (OR-construction): a pair is
      a candidate if ANY band gives it the same sign pattern. Per-plane
      collision prob for angle θ is 1−θ/π; recall = 1−(1−p^r)^b.
    * ``bits_per_band`` r defaults to ``max(4, ceil(log2(n /
      target_bucket_rows)))`` so the occupied bucket count scales ∝ n and
      the EXPECTED bucket size stays bounded as the corpus grows.
    * Explosion ships only (band, bucket, id) rows; the hot-bucket
      prefilter (shared with the MinHash path) drops singleton buckets
      before any per-group work; in-bucket pair-gen emits id pairs only.
    * Exact verification: embeddings are shuffle-joined onto the deduped
      candidate pairs (never broadcast), cosine computed per batch.

    Recall is sketch-bounded and stated, never silent: callers needing a
    different operating point tune (bands, bits_per_band).
    """
    from raylink.ops.ann import _to_matrix
    from raylink.util import shuffle_merge

    n_total = ds.count()
    if bits_per_band is None:
        bits_per_band = max(
            4, int(np.ceil(np.log2(max(n_total, 2) / target_bucket_rows)))
        )
    r = bits_per_band

    def _bucket_pairs(group) -> pa.Table:
        ids = np.sort(
            np.asarray(
                group[id_col]
                if isinstance(group, pd.DataFrame)
                else group.column(id_col).to_numpy(zero_copy_only=False)
            )
        )
        m = len(ids)
        if m < 2:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64())})
        ii, jj = np.triu_indices(m, k=1)
        return pa.table({"id_a": pa.array(ids[ii]), "id_b": pa.array(ids[jj])})

    _bucket_pairs.batch_format = "pyarrow"

    exploded = lsh_band_signatures(
        ds, bands=bands, bits_per_band=r, emb_col=emb_col, id_col=id_col,
        seed=seed,
    )
    cand = _pairs_in_hot_buckets(exploded, ["band", "bucket"], _bucket_pairs)
    cand = (
        cand.groupby(["id_a", "id_b"])
        .aggregate(Min("id_a", alias_name="_m"))
        .select_columns(["id_a", "id_b"])
    )

    # ---- exact cosine verify: embeddings attached by shuffle join --------
    etype = dict(zip(ds.schema().names, ds.schema().types))[emb_col]
    embs = ds.select_columns([id_col, emb_col])
    s1 = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("_emb_a", etype)])
    s2 = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()),
         ("_emb_a", etype), ("_emb_b", etype)]
    )

    def _attach(side: str, out_col: str):
        def _m(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
            rdf = rdf.drop_duplicates(subset=[id_col]).rename(
                columns={id_col: side, emb_col: out_col}
            )
            return ldf.merge(rdf, how="left", on=side)

        return _m

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    emb_schema = pa.schema([(id_col, pa.int64()), (emb_col, etype)])
    j1 = shuffle_merge(cand, embs, ["id_a"], [id_col], _attach("id_a", "_emb_a"),
                       s1, num_partitions=num_partitions,
                       left_schema=pair_schema, right_schema=emb_schema)
    j2 = shuffle_merge(j1, embs, ["id_b"], [id_col], _attach("id_b", "_emb_b"),
                       s2, num_partitions=num_partitions,
                       left_schema=s1, right_schema=emb_schema)

    def _cos(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.schema(
                [("id_a", pa.int64()), ("id_b", pa.int64()),
                 ("cosine", pa.float64())]
            ).empty_table()
        a = _to_matrix(batch.column("_emb_a"))
        b = _to_matrix(batch.column("_emb_b"))
        na = np.linalg.norm(a, axis=1)
        nb = np.linalg.norm(b, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cos = (a * b).sum(axis=1) / (na * nb)
        keep = cos >= threshold
        out = pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "cosine": pa.array(cos, type=pa.float64()),
            }
        )
        return out.filter(pa.array(keep))

    return j2.map_batches(_cos, batch_format="pyarrow")
