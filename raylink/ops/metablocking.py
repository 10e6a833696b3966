"""Meta-blocking: restructure a redundancy-positive block collection into
a pruned comparison graph (Papadakis et al., TKDE 2013 — public
literature; no counterpart in the reference's R surface, which blocks on
a single exact key: ``R/fuzzylink.R`` ``blocking.variables``).

Token blocking assigns every document to one block per distinct token, so
true matches co-occur in MANY blocks (redundancy) while coincidental
pairs share few. Meta-blocking turns that redundancy into a signal:

1. **Block purging** drops oversize blocks (stopword tokens) — the cap
   ``max_block_size`` bounds every downstream cost.
2. The **comparison graph** has an edge per co-occurring pair, weighted
   by CBS (common-block count — how many retained blocks both share).
3. **WEP** (weighted-edge pruning) keeps edges with weight ≥ the global
   mean — as the integer inequality ``w · n_edges ≥ sum_w`` so the SQL
   oracle replays the keep decision bit-exactly (no float mean).

Distributed shape (two all-to-alls, no driver-side pair data):

* ONE vectorized map pass explodes documents into distinct
  ``(id, token)`` memberships (Arrow ``utf8_lower`` → ``split_pattern``
  → ``list_flatten`` + ``list_parent_indices``, per-batch pandas
  drop_duplicates — globally distinct because each document is one row).
* ONE token-hash exchange lands every block whole in a partition; the
  partition kernel drops purged blocks and expands per-block pairs with
  the closed-form repeat/cumsum arithmetic, pre-reducing duplicate pairs
  to ``(a, b, partial_count)`` before they leave the task.
* ONE pair-key groupby sums CBS weights; the weight table is
  materialized (object-store, spillable — it is consumed twice: once for
  the global mean, once for the filter) and a final broadcast-scalar map
  applies the WEP inequality.

Skew bound: the hottest retained block emits ≤ C(max_block_size, 2)
pairs — the purge cap is the contract, not a tuning hint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def token_blocking_wep(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_block_size: int = 50,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Token blocking + block purging + CBS weighting + WEP pruning.

    Input: one row per document (``id_col`` unique int64, ``text_col``
    string). Tokens are lowercase space-separated words (empty tokens
    from runs of spaces are dropped). Output: retained comparison edges
    ``(a, b, w)`` with ``a < b`` and ``w`` the common-block count,
    pruned to ``w · n_edges ≥ sum_w``.
    """
    from ray.data.aggregate import Sum

    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import skip_empty, sorted_partition_apply

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()

    member_schema = pa.schema(
        [("_pid", pa.int64()), ("id", pa.int64()), ("tk", pa.string())]
    )

    @skip_empty
    def _membership(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        splits = pc.split_pattern(pc.utf8_lower(col), pattern=" ")
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"id": ids[parent], "tk": flat.to_pandas()})
        df = df[df["tk"] != ""].drop_duplicates()
        if not len(df):
            return None
        # token-hash partition id (md5-free: _mix64 of pandas string hash
        # would not replay — hash the utf8 bytes with the engine's mix on
        # a stable per-string uint64 from Arrow's own hash is unavailable,
        # so reuse pandas.util.hash_array, deterministic across workers)
        hv = pd.util.hash_array(df["tk"].to_numpy(dtype=object)).astype(np.uint64)
        pid = (_mix64(hv) % P).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                "id": pa.array(df["id"].to_numpy()),
                "tk": pa.array(df["tk"].to_numpy(dtype=object), type=pa.string()),
            }
        )

    members = docs.map_batches(_membership, batch_format="pyarrow")

    pair_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())]
    )

    def _block_pairs(part: pa.Table) -> pa.Table:
        df = part.select(["id", "tk"]).to_pandas().sort_values(
            ["tk", "id"], kind="stable"
        )
        tk = df["tk"].to_numpy(dtype=object)
        ids = df["id"].to_numpy()
        sizes = pd.Series(np.arange(len(tk))).groupby(tk, sort=False).size().to_numpy()
        keep = sizes <= max_block_size
        if not keep.all():
            row_keep = np.repeat(keep, sizes)
            ids = ids[row_keep]
            sizes = sizes[keep]
        starts = np.cumsum(sizes) - sizes
        idx_in = np.arange(len(ids)) - np.repeat(starts, sizes)
        rep = (np.repeat(sizes, sizes) - idx_in - 1).astype(np.int64)
        total = int(rep.sum())
        if total == 0:
            return pair_schema.empty_table()
        i1 = np.repeat(np.arange(len(ids)), rep)
        excl = np.cumsum(rep) - rep
        rank = np.arange(total) - np.repeat(excl, rep)
        i2 = i1 + 1 + rank
        # ids ascending within each token block -> a < b; pre-reduce
        # duplicate pairs (two shared tokens hashed to this partition)
        pdf = pd.DataFrame({"a": ids[i1], "b": ids[i2]})
        g = pdf.groupby(["a", "b"], sort=False).size().rename("c").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        ).cast(pair_schema)

    pairs = sorted_partition_apply(
        members.repartition(nparts), "_pid", _block_pairs, pair_schema
    )
    weights = (
        pairs.groupby(["a", "b"]).aggregate(Sum("c", alias_name="w")).materialize()
    )

    @skip_empty
    def _stats(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(w)], type=pa.int64()),
                "s": pa.array([int(w.sum())], type=pa.int64()),
            }
        )

    sdf = weights.map_batches(_stats, batch_format="pyarrow").to_pandas()
    n_edges = int(sdf["n"].sum()) if "n" in sdf.columns else 0
    sum_w = int(sdf["s"].sum()) if "s" in sdf.columns else 0

    @skip_empty
    def _wep(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = w * n_edges >= sum_w
        return pa.table(
            {
                "a": t.column("a").cast(pa.int64()).filter(pa.array(keep)),
                "b": t.column("b").cast(pa.int64()).filter(pa.array(keep)),
                "w": pa.array(w[keep]),
            }
        )

    return weights.map_batches(_wep, batch_format="pyarrow")
