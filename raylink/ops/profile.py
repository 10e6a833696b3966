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
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-column data-quality profile in long form:
    ``(col_name, n_rows, n_null, n_distinct)`` — the standard ingest
    audit (row counts, null counts, EXACT distinct cardinality), one row
    per profiled column, SQL-replayable as a UNION ALL of per-column
    ``COUNT``/``COUNT(DISTINCT)`` selects.

    Scale shape — two passes with disjoint costs (they were one fused
    pass consumed twice, which re-ran the expensive unique+cast lineage
    for the cheap count branch):

    1. *Counts* (light): a stateless map emits ``len(cols)``
       (n, n_null) partial rows per batch, summed on the driver —
       batches×cols rows move, no exchange.
    2. *Distinct* (heavy): each batch emits its batch-side-deduplicated
       ``(col, value)`` pairs (canonicalized to strings with an
       injective cast — Arrow's float→string shortest-round-trip repr —
       so distinctness is preserved without shipping native types),
       routed by a pinned siphash of the pair through ONE explicit-
       boundary range exchange (:func:`raylink.util.uniform_pid_bounds`,
       the ``dedup_lines_global`` ownership device); every copy of a
       pair lands in one partition, so the partition kernel
       drop-duplicates on the TRUE pair (hash collisions only
       co-locate, never merge) and emits per-column cardinality
       partials — partitions×cols rows to the driver, never the pair
       stream.  For columns whose cardinality approaches the row count
       this is the honest exact cost (the same one SQL pays); the
       documented approximate fallback at corpus scale is
       :func:`raylink.ops.sketch.grouped_hll_registers` per column.

    Caveat (stated): the string canonicalization maps ``-0.0`` and
    ``0.0`` to distinct strings while SQL's DISTINCT merges them —
    negative zero is normalized away before casting for exactly that
    reason; NaN counts as one distinct value on both sides.
    """
    import pyarrow.compute as pc

    from raylink.ops.dedup import _default_partitions
    from raylink.util import (
        skip_empty,
        sorted_partition_apply,
        uniform_pid_bounds,
    )

    cols = columns or [n for n in ds.schema().names]
    ds = ds.select_columns(cols)
    nparts = num_partitions or _default_partitions()

    # pass 1 (light): per-batch count partials -> driver sum
    def _counts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "col_name": pa.array(cols, type=pa.string()),
                "n": pa.array(
                    np.full(len(cols), batch.num_rows, dtype=np.int64)
                ),
                "n_null": pa.array(
                    np.asarray(
                        [batch.column(c).null_count for c in cols],
                        dtype=np.int64,
                    )
                ),
            }
        )

    cdf = (
        ds.map_batches(_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby("col_name", as_index=False)
        .agg(n_rows=("n", "sum"), n_null=("n_null", "sum"))
    )

    # pass 2 (heavy): batch-distinct (col, v) pairs -> one hash exchange
    P = np.int64(1 << 31)

    def _distinct(batch: pa.Table):
        names, vals = [], []
        for c in cols:
            v = batch.column(c).drop_null()
            if pa.types.is_floating(v.type):
                # -0.0 -> 0.0 so string distinctness == SQL distinctness
                v = pc.add(v, 0.0)
            u = pc.unique(
                v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            )
            s = pc.cast(u, pa.string())
            names.extend([c] * len(s))
            vals.append(s)
        if not names:
            return pa.table(
                {
                    "_pid": pa.array([], type=pa.int64()),
                    "col_name": pa.array([], type=pa.string()),
                    "v": pa.array([], type=pa.string()),
                }
            )
        v_all = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in vals]
        )
        # pinned-key siphash of the (col, value) pair: deterministic
        # cross-process, collisions only co-locate (dedup is on the pair)
        key = np.asarray(
            [n + "\x1f" + s for n, s in zip(names, v_all.to_pylist())],
            dtype=object,
        )
        pid = (pd.util.hash_array(key, hash_key="raylink_colprof!") % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                "col_name": pa.array(names, type=pa.string()),
                "v": v_all,
            }
        )

    card_schema = pa.schema([("col_name", pa.string()), ("d", pa.int64())])

    def _card(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates(["col_name", "v"])
        g = df.groupby("col_name", as_index=False, sort=False).agg(
            d=("col_name", "size")
        )
        return pa.table(
            {
                "col_name": pa.array(g["col_name"], type=pa.string()),
                "d": pa.array(g["d"].to_numpy().astype(np.int64)),
            }
        )

    tagged = ds.map_batches(skip_empty(_distinct), batch_format="pyarrow")
    dcards = sorted_partition_apply(
        tagged, "_pid", _card, card_schema,
        boundaries=uniform_pid_bounds(nparts),
    ).to_pandas()
    dsum = dcards.groupby("col_name", as_index=False).agg(
        n_distinct=("d", "sum")
    )

    cdf = cdf.merge(dsum, on="col_name", how="left")
    cdf["n_distinct"] = cdf["n_distinct"].fillna(0).astype(np.int64)
    cdf["n_rows"] = cdf["n_rows"].astype(np.int64)
    cdf["n_null"] = cdf["n_null"].astype(np.int64)
    import ray.data as _rd

    return _rd.from_arrow(
        pa.Table.from_pandas(
            cdf.sort_values("col_name").reset_index(drop=True),
            preserve_index=False,
        ).replace_schema_metadata(None)
    )
