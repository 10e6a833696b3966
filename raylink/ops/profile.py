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


def column_profile(
    ds: ray.data.Dataset,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Per-column data-quality profile in long form:
    ``(col_name, n_rows, n_null, n_distinct)`` — the standard ingest
    audit (row counts, null counts, EXACT distinct cardinality), one row
    per profiled column, SQL-replayable as a UNION ALL of per-column
    ``COUNT``/``COUNT(DISTINCT)`` selects.

    Scale shape: one stateless map pass emits, per batch and column, a
    3-field count partial PLUS that batch's distinct values (already
    deduplicated batch-side, canonicalized to strings with an injective
    cast — Arrow's float→string shortest-round-trip repr — so
    distinctness is preserved without shipping native types through the
    exchange). Distinct counting is then groupby-distinct over
    ``(col, value)`` followed by a per-column sum: the all-to-all moves
    per-batch DISTINCT values only. For columns whose cardinality
    approaches the row count this is the honest exact cost (the same
    one SQL pays); the documented approximate fallback at corpus scale
    is :func:`raylink.ops.sketch.hll_registers` per column.

    Caveat (stated): the string canonicalization maps ``-0.0`` and
    ``0.0`` to distinct strings while SQL's DISTINCT merges them —
    negative zero is normalized away before casting for exactly that
    reason; NaN counts as one distinct value on both sides.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    cols = columns or [n for n in ds.schema().names]
    ds = ds.select_columns(cols)

    def _partial(batch: pa.Table):
        names, vals = [], []
        nrows = batch.num_rows
        crows, cnull = [], []
        for c in cols:
            col = batch.column(c)
            cnull.append(col.null_count)
            crows.append(nrows)
            v = col.drop_null()
            if pa.types.is_floating(v.type):
                # -0.0 -> 0.0 so string distinctness == SQL distinctness
                v = pc.add(v, 0.0)
            u = pc.unique(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
            s = pc.cast(u, pa.string())
            names.extend([c] * len(s))
            vals.append(s)
        counts = pa.table(
            {
                "col_name": pa.array(cols, type=pa.string()),
                "n": pa.array(np.asarray(crows, dtype=np.int64)),
                "n_null": pa.array(np.asarray(cnull, dtype=np.int64)),
                "kind": pa.array(np.zeros(len(cols), dtype=np.int64)),
                "v": pa.array([""] * len(cols), type=pa.string()),
            }
        )
        distinct = pa.table(
            {
                "col_name": pa.array(names, type=pa.string()),
                "n": pa.array(np.zeros(len(names), dtype=np.int64)),
                "n_null": pa.array(np.zeros(len(names), dtype=np.int64)),
                "kind": pa.array(np.ones(len(names), dtype=np.int64)),
                "v": pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in vals]) if names else pa.array([], type=pa.string()),
            }
        )
        yield counts
        if distinct.num_rows:
            yield distinct

    parts = ds.map_batches(_partial, batch_format="pyarrow")

    def _batch_card(t: pa.Table) -> pa.Table:
        # per-batch combiner over the (already grouped-distinct) pairs:
        # one (col, count) row per column per batch, so the FINAL
        # aggregate sums a batches×cols-row table, never the pair stream
        df = pd.DataFrame({"col_name": t.column("col_name").to_pandas()})
        g = df.groupby("col_name", as_index=False, sort=False).agg(
            d=("col_name", "size")
        )
        return pa.table(
            {
                "col_name": pa.array(g["col_name"], type=pa.string()),
                "d": pa.array(g["d"].to_numpy().astype(np.int64)),
            }
        )

    # distinct (col, v) pairs -> one count row per column
    dcount = (
        parts.filter(expr="kind == 1")
        .groupby(["col_name", "v"])
        .aggregate(Count())
        .map_batches(_batch_card, batch_format="pyarrow")
        .repartition(1)  # ≤ batches×cols partial rows by here
        .groupby("col_name")
        .aggregate(Sum("d", alias_name="n_distinct"))
    )
    ccount = (
        parts.filter(expr="kind == 0")
        .repartition(1)
        .groupby("col_name")
        .aggregate(Sum("n", alias_name="n_rows"), Sum("n_null", alias_name="n_null"))
    )
    # both sides are exactly len(cols) rows: a broadcast merge in one
    # driver-side pandas join would also be fine, but keeping it as a
    # dataset keeps the operator composable
    cdf = ccount.to_pandas().merge(dcount.to_pandas(), on="col_name", how="left")
    cdf["n_distinct"] = cdf["n_distinct"].fillna(0).astype(np.int64)
    import ray.data as _rd

    return _rd.from_arrow(
        pa.Table.from_pandas(
            cdf.sort_values("col_name").reset_index(drop=True),
            preserve_index=False,
        ).replace_schema_metadata(None)
    )
