"""Sorted-neighborhood blocking (Hernández & Stolfo 1995): sort all
records by a blocking key, slide a window of size ``w`` over the sorted
order, and emit every pair within the window — the classic alternative to
equality blocking when keys are dirty (nearby-but-unequal keys still
pair). The reference (fuzzylink) only has equality blocking
(``R/fuzzylink.R`` ``blocking.variables``); this extends the blocking
surface the same way ``ops/fellegi.py`` extends the scoring surface.

The hard part on Ray Data is that window-by-GLOBAL-RANK needs a total
order, and Dataset gives no ordered-partition-index primitive. Doing it
with a driver-side sort would be the anti-pattern; instead:

1. **stats pass** — each row gets an integer sort code (big-endian first
   8 bytes of the key, so code order is consistent with binary string
   order) and a ``prefix_bits``-bit bucket; per-batch partial bincounts →
   one tiny groupby → exact per-bucket counts on the driver (≤2^prefix_bits
   int64s). Exclusive cumsum = the exact GLOBAL RANK OFFSET of every
   bucket. One streaming pass over (key) only.
2. **rank exchange** — rows route by bucket (explicit, count-balanced
   boundaries cut from the histogram — every partition populated, no
   schema-less empties); each partition sorts its buckets by
   ``(key, id)`` and assigns ``rank = bucket_offset + local_rank``:
   exact global ranks with no global sort barrier. Each ranked row is
   then emitted to bands ``rank // w`` and ``rank // w + 1``.
3. **band exchange** — band ``k`` holds exactly ranks
   ``[(k-1)·w, (k+1)·w)``; for any pair ``i<j`` with ``j-i < w`` both
   rows are present in band ``j // w`` and in no other band under the
   emit rule — so emitting a pair only in band ``j // w`` yields the
   exact window pair set with zero duplicates. Bands are fixed-width in
   rank space, so boundaries are a plain arithmetic split: balanced by
   construction.

Scale shape: two all-to-alls + one stats pass, all over slim
``(id, key[, code])`` rows; the window kernel is a loop over rank
DISTANCES (≤2w iterations of whole-partition numpy ops), never over rows.
Skew contract: an equal-8-byte-prefix run of keys lands in one bucket —
SNM practice already demands a spreading sort key (phonetic code + name
prefix, not a constant); ``prefix_bits`` widens the bucket space if the
key's head is low-entropy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from raylink.ops.dedup import _default_partitions
from raylink.util import pa_type, sorted_partition_apply

__all__ = ["sort_codes", "sorted_neighborhood_pairs", "snm_jw_link"]


def sort_codes(keys: np.ndarray, prefix_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """(code, bucket) for an object array of strings: code = big-endian
    first-8-bytes (order-consistent with binary string order), bucket =
    top ``prefix_bits`` bits. Vectorized via numpy's fixed-width bytes
    dtype — no per-row Python loop on the ASCII fast path (non-ASCII keys
    fall back to per-row UTF-8 encoding; UTF-8 byte order stays consistent
    with codepoint order, matching DuckDB's binary collation)."""
    try:
        s8 = keys.astype("S8")  # truncate/zero-pad to 8 bytes
    except UnicodeEncodeError:
        s8 = np.array(
            [s.encode("utf-8", "surrogateescape")[:8] for s in keys], dtype="S8"
        )
    code = np.frombuffer(s8.tobytes(), dtype=">u8").astype(np.uint64)
    bucket = (code >> np.uint64(64 - prefix_bits)).astype(np.int64)
    return code.astype(np.int64), bucket


def _bucket_counts(
    ds: ray.data.Dataset,
    sort_col: str,
    prefix_bits: int,
    stats_partitions: int = 2,
) -> np.ndarray:
    """Exact per-bucket row counts: per-batch partial bincount → one tiny
    groupby → ≤2^prefix_bits rows to the driver. ``stats_partitions``
    bounds the aggregate's sort parallelism: it must stay below the
    POPULATED bucket count or sampled boundaries collide into schema-less
    empty partitions (a low-entropy key head can populate <10 of the 2^p
    buckets); raise it for high-entropy keys at corpus scale, where every
    bucket is populated and the partial table is large."""
    size = 1 << prefix_bits

    def _partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(sort_col).to_numpy(zero_copy_only=False)
        _, bucket = sort_codes(keys, prefix_bits)
        counts = np.bincount(bucket, minlength=size)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz].astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    rows = (
        ds.select_columns([sort_col])
        .map_batches(_partial, batch_format="pyarrow")
        .repartition(stats_partitions)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = np.zeros(size, dtype=np.int64)
    counts[rows["bucket"].to_numpy()] = rows["n"].to_numpy()
    return counts


def _balanced_cuts(weights: np.ndarray, parts: int) -> list[int]:
    """Equal-weight contiguous cut points over the populated index range
    (the `_pack_boundaries` idea, for a plain count histogram): boundary
    values for ``sort(..., boundaries=...)`` such that every resulting
    partition carries data."""
    pos = np.flatnonzero(weights)
    if len(pos) <= 1 or parts <= 1:
        return []
    csum = np.cumsum(weights[pos], dtype=np.float64)
    total = csum[-1]
    cuts: list[int] = []
    for k in range(1, parts):
        j = int(np.searchsorted(csum, total * k / parts))
        j = min(j, len(pos) - 1)
        b = int(pos[j])
        if not cuts or b > cuts[-1]:
            cuts.append(b)
    return [c for c in cuts if pos[0] < c <= pos[-1]]


def sorted_neighborhood_pairs(
    ds: ray.data.Dataset,
    sort_col: str,
    id_col: str,
    window: int,
    prefix_bits: int = 12,
    num_partitions: int | None = None,
    carry_key: bool = False,
) -> ray.data.Dataset:
    """All pairs within ``window`` of each other in the total order
    ``ORDER BY (sort_col, id_col)``: rows ``(id_a, id_b, dist)`` with
    ``id_a`` the lower-ranked record and ``1 ≤ dist ≤ window-1`` its rank
    distance — exactly ``ROW_NUMBER``-self-join semantics, distributed.
    ``carry_key=True`` also emits ``key_a``/``key_b`` (each side's
    ``sort_col`` value rides the band exchange) so a downstream scorer
    needs no extra join.
    """
    if window < 2:
        raise ValueError("window must be ≥ 2")
    w = int(window)
    nparts = num_partitions or _default_partitions()

    counts = _bucket_counts(ds, sort_col, prefix_bits)
    n_total = int(counts.sum())
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    bucket_cuts = _balanced_cuts(counts, nparts)

    # ---- stage 2: exact global ranks, then band duplication -------------
    def _tag_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(sort_col).to_numpy(zero_copy_only=False)
        _, bucket = sort_codes(keys, prefix_bits)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                sort_col: batch.column(sort_col),
                id_col: batch.column(id_col),
            }
        )

    def _rank_and_band(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(
            ["bucket", sort_col, id_col], kind="stable"
        )
        b = df["bucket"].to_numpy()
        # local rank within each (contiguous) bucket run
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        run_id = np.cumsum(np.r_[True, b[1:] != b[:-1]]) - 1
        local = np.arange(len(b)) - starts[run_id]
        rank = offsets[b] + local
        ids = df[id_col].to_numpy()
        band = rank // w
        # each row rides to its own band and the next one
        rr = np.concatenate([rank, rank])
        ii = np.concatenate([ids, ids])
        bb = np.concatenate([band, band + 1])
        cols = {
            "band": pa.array(bb.astype(np.int64)),
            "rank": pa.array(rr.astype(np.int64)),
            id_col: pa.array(ii),
        }
        if carry_key:
            ks = df[sort_col].to_numpy()
            cols[sort_col] = pa.array(np.concatenate([ks, ks]))
        return pa.table(cols)

    dschema = ds.schema()
    dtype = dict(zip(dschema.names, (pa_type(t) for t in dschema.types)))
    banded_fields = [
        ("band", pa.int64()), ("rank", pa.int64()), (id_col, dtype[id_col])
    ]
    if carry_key:
        banded_fields.append((sort_col, dtype[sort_col]))
    banded_schema = pa.schema(banded_fields)
    tagged = ds.map_batches(_tag_bucket, batch_format="pyarrow")
    banded = sorted_partition_apply(
        tagged.repartition(nparts),
        "bucket",
        _rank_and_band,
        banded_schema,
        boundaries=bucket_cuts or None,
    )

    # ---- stage 3: window pairs, emitted once (in band rank//w) ----------
    # bands 0..B are ALL populated (ranks are contiguous and every row
    # rides to rank//w and rank//w + 1), so cuts within [1, B] can never
    # create an empty sort partition
    B = (n_total - 1) // w + 1 if n_total > 0 else 0
    band_step = max(1, (B + 1) // nparts)
    band_cuts = list(range(band_step, B + 1, band_step))

    def _pairs(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(["band", "rank"], kind="stable")
        band = df["band"].to_numpy()
        rank = df["rank"].to_numpy()
        ids = df[id_col].to_numpy()
        ks = df[sort_col].to_numpy() if carry_key else None
        a_parts, b_parts, d_parts = [], [], []
        ka_parts, kb_parts = [], []
        # loop over rank DISTANCE, not rows: within a band rows are
        # rank-sorted, so a (i, i+step) shift covers one candidate
        # distance for the whole partition at once
        max_step = min(2 * w - 1, len(band) - 1)
        for step in range(1, max_step + 1):
            same_band = band[step:] == band[:-step]
            dist = rank[step:] - rank[:-step]
            owner = (rank[step:] // w) == band[step:]
            keep = same_band & (dist >= 1) & (dist < w) & owner
            if keep.any():
                a_parts.append(ids[:-step][keep])
                b_parts.append(ids[step:][keep])
                d_parts.append(dist[keep])
                if carry_key:
                    ka_parts.append(ks[:-step][keep])
                    kb_parts.append(ks[step:][keep])
        if not a_parts:
            return out_schema.empty_table()
        cols = {
            "id_a": pa.array(np.concatenate(a_parts)),
            "id_b": pa.array(np.concatenate(b_parts)),
            "dist": pa.array(np.concatenate(d_parts).astype(np.int64)),
        }
        if carry_key:
            cols["key_a"] = pa.array(np.concatenate(ka_parts))
            cols["key_b"] = pa.array(np.concatenate(kb_parts))
        return pa.table(cols)

    out_fields = [
        ("id_a", dtype[id_col]), ("id_b", dtype[id_col]), ("dist", pa.int64())
    ]
    if carry_key:
        out_fields += [("key_a", dtype[sort_col]), ("key_b", dtype[sort_col])]
    out_schema = pa.schema(out_fields)
    return sorted_partition_apply(
        banded.repartition(nparts),
        "band",
        _pairs,
        out_schema,
        boundaries=band_cuts or None,
    )


def snm_jw_link(
    ds: ray.data.Dataset,
    sort_col: str,
    id_col: str,
    window: int = 8,
    jw_e6_threshold: int = 900_000,
    num_partitions: int | None = None,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """End-to-end UNSUPERVISED linkage with no labels and no embeddings:
    sorted-neighborhood blocking → vectorized Jaro-Winkler scoring →
    acceptance at an integer micro-unit threshold → distributed min-label
    connected components. Returns ``(edges, clusters)`` where edges =
    ``(id_a, id_b, jw_e6)`` accepted pairs and clusters = ``(id, cluster)``
    for every record on an accepted edge, ``cluster`` the component's min
    id.

    Every stage is SQL-replayable, so unlike the flagship (whose oracle
    needs frozen learned state) this pipeline gates against a
    self-contained ROW_NUMBER + jaro_winkler_similarity + recursive-CTE
    oracle. The integer ``jw_e6`` threshold is the ``jw_kernel`` gate's
    convention: ``np.round(jw·1e6)`` is proven bit-equal to DuckDB's
    ``ROUND(jaro_winkler_similarity(..)*1e6)`` over 150k pairs, so
    acceptance can never flip between engine and oracle.

    Scale shape: the SNM exchanges (see :func:`sorted_neighborhood_pairs`)
    plus a stateless scoring map and the O(log diameter)
    ``cluster_label_propagation`` rounds. Ids must be non-negative (the
    zero-padded string labels of the propagation step must order like the
    ints — guarded loudly)."""
    from raylink.cluster import cluster_label_propagation
    from raylink.features import jw_cross

    pairs = sorted_neighborhood_pairs(
        ds, sort_col, id_col, window,
        num_partitions=num_partitions, carry_key=True,
    )

    def _score(batch: pa.Table) -> pa.Table:
        a_low = [s.lower() for s in batch.column("key_a").to_pylist()]
        b_low = [s.lower() for s in batch.column("key_b").to_pylist()]
        n = len(a_low)
        idx = np.arange(n)
        jw = jw_cross(a_low, b_low, idx, idx, boost_threshold=0.7)
        e6 = np.round(jw * 1_000_000).astype(np.int64)
        keep = e6 >= jw_e6_threshold
        return pa.table(
            {
                "id_a": pa.array(
                    batch.column("id_a").to_numpy(zero_copy_only=False)[keep]
                ),
                "id_b": pa.array(
                    batch.column("id_b").to_numpy(zero_copy_only=False)[keep]
                ),
                "jw_e6": pa.array(e6[keep]),
            }
        )

    edges = pairs.map_batches(_score, batch_format="pyarrow")

    def _to_str_edges(batch: pa.Table) -> pa.Table:
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        if len(ia) and (ia.min() < 0 or ib.min() < 0):
            raise ValueError(
                "snm_jw_link requires non-negative ids (zero-padded string "
                "min-labels must order like the ints)"
            )
        return pa.table(
            {
                "block": pa.array(["x"] * len(ia), type=pa.string()),
                "key_a": pa.array([f"{v:020d}" for v in ia], type=pa.string()),
                "key_b": pa.array([f"{v:020d}" for v in ib], type=pa.string()),
            }
        )

    labels = cluster_label_propagation(
        edges.map_batches(_to_str_edges, batch_format="pyarrow"),
        num_partitions=num_partitions,
    )

    def _back(batch: pa.Table) -> pa.Table:
        # propagation emits (block, key, entity_id) with entity_id =
        # "<block>|<min-label>"; strip the block prefix back to the int id
        ids = np.array(
            [int(s) for s in batch.column("key").to_pylist()], dtype=np.int64
        )
        lab = np.array(
            [int(s.split("|", 1)[1]) for s in batch.column("entity_id").to_pylist()],
            dtype=np.int64,
        )
        return pa.table({"id": pa.array(ids), "cluster": pa.array(lab)})

    return edges, labels.map_batches(_back, batch_format="pyarrow")
