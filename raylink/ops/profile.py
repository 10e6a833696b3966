"""Blocking-key skew diagnostics.

The north rule requires "partitioning / shuffle / skew handled
explicitly"; the engine's pair generator bounds work by the hottest
block, the LSH dedup by the hottest bucket, sessionize by the hottest
entity. :func:`block_profile` is the operator that MEASURES those bounds
before a run: per-key block sizes, the top-N hottest keys with their
candidate-pair contribution (``n·(n−1)/2`` — the quantity that explodes
quadratically under skew), and a log2 block-size histogram. A pipeline
author reads the profile to pick salt factors / tile caps; the driver
never sees more than ``batches × top_n`` rows plus the ≤64-bucket
histogram.

Scale shape: ONE exchange — per-batch ``value_counts`` partials reduce
to ``groupby(key).sum`` (map-side combine, so the all-to-all moves
per-batch partials, never rows); top-N via per-block local top-N then a
final ``blocks × top_n`` reduction; the histogram is a second combine
over the tiny per-key table. The reference (fuzzylink) has no analogue —
its single-process blocking never has to ask the question.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def block_profile(
    ds: ray.data.Dataset,
    key_col: str,
    top_n: int = 20,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Profile blocking-key skew. Returns ``(topk, hist)``:

    * ``topk`` — the ``top_n`` hottest keys: ``(key, n_rows, n_pairs)``
      with ``n_pairs = n_rows·(n_rows−1)/2`` (the within-block candidate
      pairs a self-join would generate), ordered by
      ``(n_rows DESC, key ASC)`` — a total order, so bit-reproducible.
    * ``hist`` — log2 block-size histogram:
      ``(bucket, n_blocks, n_rows)`` where ``bucket = floor(log2(n))``,
      i.e. bucket 0 holds singleton blocks (which generate no pairs and
      can skip the pair stage entirely), bucket 3 holds sizes 8–15, …
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        vc = (
            pd.Series(batch.column(key_col).to_numpy(zero_copy_only=False))
            .value_counts()
        )
        return pa.table(
            {
                key_col: pa.array(vc.index.to_numpy()),
                "c": pa.array(vc.to_numpy().astype(np.int64)),
            }
        )

    blocks = (
        ds.select_columns([key_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("c", alias_name="n_rows"))
        .materialize()
    )

    def _local_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n_rows", key_col], ascending=[False, True], kind="stable"
        )
        return pa.Table.from_pandas(df.head(top_n), preserve_index=False)

    top = (
        blocks.map_batches(_local_top, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n_rows", key_col], ascending=[False, True], kind="stable")
        .head(top_n)
        .reset_index(drop=True)
    )
    n = top["n_rows"].to_numpy(np.int64)
    top["n_pairs"] = n * (n - 1) // 2

    def _hist_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("n_rows").to_numpy(zero_copy_only=False)
        bucket = np.floor(np.log2(c)).astype(np.int64)
        g = (
            pd.DataFrame({"bucket": bucket, "n_blocks": 1, "n_rows": c})
            .groupby("bucket", as_index=False)
            .agg(n_blocks=("n_blocks", "sum"), n_rows=("n_rows", "sum"))
        )
        return pa.Table.from_pandas(g.astype(np.int64), preserve_index=False)

    hist = (
        blocks.map_batches(_hist_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("n_blocks", alias_name="n_blocks"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    return top, hist
