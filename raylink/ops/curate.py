"""End-to-end document curation: the composition a training-data pipeline
actually runs, assembled from the individually oracle-gated operators.

    lang filter → quality floor → exact dedup → near-dup dedup → split

Every stage is the scale-shaped primitive from its own module: stateless
map filters (language vote, quality arithmetic), a (hash, id)-only
groupby for exact duplicates, the minhash→verify→label-propagation
near-dup graph with min-id survivors via a distributed anti-join
(nothing corpus-scale ever touches the driver), and a coordination-free
deterministic hash split. The whole composition is replayed by ONE
DuckDB oracle (see ``__ray_entry__.oracle_sql()['curation']``) so the
pipeline — not just its pieces — sits inside the bit-exact gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from raylink.ops.text import lang_id, quality_scores


def _exact_dup_non_survivors(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """Ids to DROP under exact dedup (everything but the min id per
    identical text). Only (hash, id) pairs shuffle; the output is
    duplicate-rate-sized, which keeps the survivor anti-join's right side
    small (cf. ops/dedup.py dedup_exact, which emits the survivors)."""
    from raylink.ops.dedup import _sha1_int

    def _hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = pa.array([_sha1_int(t.encode()) for t in texts], type=pa.int64())
        return pa.table({"content_hash": h, id_col: batch.column(id_col)})

    def _drop_min(df) -> pa.Table:
        ids = np.sort(df[id_col].to_numpy())
        return pa.table({id_col: pa.array(ids[1:], type=pa.int64())})

    return (
        ds.map_batches(_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .map_groups(_drop_min, batch_format="pandas")
    )


def curate_documents(
    ds: ray.data.Dataset,
    lang: str = "en",
    quality_floor_e6: int = 500_000,
    test_pct: int = 10,
    num_perm: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Curate a document corpus into a deduplicated, quality-filtered,
    split-assigned training set: ``(id, quality_e6, split)`` rows.

    Near-dup semantics: connected components of the exact-Jaccard-verified
    minhash graph OVER THE FILTERED SET (edges among dropped docs cannot
    eliminate a kept one), min-id member survives each component.
    """
    from raylink.cluster import cluster_label_propagation
    from raylink.ops.dedup import minhash_lsh_candidates, verify_jaccard
    from raylink.ops.relational import anti_join
    from raylink.ops.sample import split_by_hash

    # 1+2: stateless filters (language vote, quality arithmetic + floor)
    scored = quality_scores(lang_id(ds, text_col=text_col), text_col=text_col)

    def _keep(batch: pa.Table) -> pa.Table:
        q_e6 = np.round(
            batch.column("quality_score").to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        batch = batch.append_column("quality_e6", pa.array(q_e6))
        mask = pc.and_(
            pc.equal(batch.column("lang_pred"), lang),
            pc.greater_equal(batch.column("quality_e6"), quality_floor_e6),
        )
        return batch.filter(mask).select([id_col, text_col, "quality_e6"])

    kept = scored.map_batches(_keep, batch_format="pyarrow")

    # 3: exact dedup (anti-join against the duplicate-rate-sized drop set)
    kept = anti_join(
        kept,
        _exact_dup_non_survivors(kept, text_col, id_col),
        [id_col],
        num_partitions=num_partitions,
    )

    # 4: near-dup survivors over the filtered set (minhash -> exact verify
    # -> distributed label propagation -> min-id survivor via anti-join;
    # edge keys zero-padded so lexicographic min == numeric min, same
    # device as __ray_entry__._cc_clusters_ds)
    cands = minhash_lsh_candidates(
        kept, num_perm=num_perm, bands=bands, text_col=text_col, id_col=id_col
    )
    pairs = verify_jaccard(
        cands, kept, threshold=jaccard_threshold, text_col=text_col,
        id_col=id_col,
    )

    def _to_edges(batch: pa.Table) -> pa.Table:
        ida = batch.column("id_a").to_numpy(zero_copy_only=False)
        idb = batch.column("id_b").to_numpy(zero_copy_only=False)
        # zfill puts zeros BEFORE a '-' sign, so lexicographic min of the
        # padded keys != numeric min for negative ids — fail loudly (a bare
        # assert is stripped under python -O and would admit wrong survivors)
        if len(ida) and min(ida.min(), idb.min()) < 0:
            raise ValueError(
                "curate_documents requires non-negative doc ids: the "
                "zero-padded edge keys used for min-id survivor selection "
                "do not order correctly for negative ids"
            )
        return pa.table(
            {
                "block": pa.array(np.full(len(ida), "g"), type=pa.string()),
                "key_a": pa.array(np.char.zfill(ida.astype("U20"), 20)),
                "key_b": pa.array(np.char.zfill(idb.astype("U20"), 20)),
            }
        )

    clusters = cluster_label_propagation(
        pairs.map_batches(_to_edges, batch_format="pyarrow"),
        num_partitions=num_partitions,
    )

    def _near_dup_drops(batch: pa.Table) -> pa.Table:
        # entity_id is "block|min-label" on zero-padded keys: a node whose
        # label differs from its own key is a non-min member — drop it
        key = batch.column("key").to_pylist()
        lab = batch.column("entity_id").to_pylist()
        drop = [int(k) for k, e in zip(key, lab) if e.split("|", 1)[1] != k]
        return pa.table({id_col: pa.array(drop, type=pa.int64())})

    kept = anti_join(
        kept,
        clusters.map_batches(_near_dup_drops, batch_format="pyarrow"),
        [id_col],
        num_partitions=num_partitions,
    )

    # 5: deterministic split; final slim projection
    return split_by_hash(kept, id_col, test_pct=test_pct).select_columns(
        [id_col, "quality_e6", "split"]
    )
