"""Relational primitives exercised as standalone engine operators
(SURVEY.md §2 operator inventory: M2/M3 maps & filters, J1 semi-join,
J7 payload join, A1/A2 distincts, K1 grouped top-k, sorts/limits,
pre-aggregated groupbys). Each has a DuckDB-checkable contract — the
``queries()``/``oracle_sql()`` entries in ``__ray_entry__.py`` wire them to
the driver's correctness gate.

Patterns: vectorized Arrow ``map_batches`` for maps/filters, broadcast sets
for semi-joins, per-batch partial aggregation before the small groupby,
rank-with-ties grouped top-k (``slice_max`` semantics, R/fuzzylink.R:203-211).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum


def lower_distinct(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """M3 + A1: lowercase projection then distinct (shuffle on the value)."""
    lowered = ds.map_batches(
        lambda t: pa.table({col: pc.utf8_lower(t.column(col))}),
        batch_format="pyarrow",
    )
    return (
        lowered.groupby(col).aggregate(Count()).select_columns([col]).sort(col)
    )


def union_distinct(
    ds1: ray.data.Dataset, col1: str, ds2: ray.data.Dataset, col2: str,
    out_col: str = "key",
) -> ray.data.Dataset:
    """A2 (R/fuzzylink.R:93): distinct union of two key columns."""
    a = ds1.select_columns([col1]).rename_columns({col1: out_col})
    b = ds2.select_columns([col2]).rename_columns({col2: out_col})
    return (
        a.union(b).groupby(out_col).aggregate(Count()).select_columns([out_col]).sort(out_col)
    )


def semi_join(
    ds: ray.data.Dataset,
    key_col: str,
    keys: set,
) -> ray.data.Dataset:
    """J1: broadcast key-set semi-join (no shuffle of the big side).

    The key set is converted to an Arrow array ONCE on the driver and
    broadcast; each task runs the vectorized ``pc.is_in`` kernel against the
    zero-copy shared value set instead of a per-row Python membership loop."""
    ref = ray.put(pa.array(sorted(keys)))

    def _filter(batch: pa.Table) -> pa.Table:
        value_set = ray.get(ref)
        return batch.filter(pc.is_in(batch.column(key_col), value_set=value_set))

    return ds.map_batches(_filter, batch_format="pyarrow")


def anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_keys: list[str],
    right_keys: list[str] | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed anti-join: left rows whose key appears nowhere in
    ``right``. Both sides go through ONE hash-partitioned exchange
    (``shuffle_merge``) and each partition does a vectorized pandas
    left-only merge — unlike :func:`semi_join` this never collects or
    broadcasts the right side, so it holds when the exclusion set is
    corpus-sized (e.g. dropping every non-survivor of a dedup pass)."""
    from raylink.util import shuffle_merge

    rk = right_keys or left_keys
    lschema = left.schema()
    out_schema = pa.schema(
        [(n, t) for n, t in zip(lschema.names, lschema.types)]
    )
    lcols = list(lschema.names)
    # right keys share the left keys' types (join compatibility), so the
    # right schema is derivable WITHOUT Dataset.schema() — which on a lazy
    # groupby-rooted right side would execute its whole lineage just to
    # learn dtypes
    ltype = dict(zip(lschema.names, lschema.types))
    right_schema = pa.schema(
        [(rn, ltype[ln]) for ln, rn in zip(left_keys, rk)]
    )

    def _anti(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if len(ldf) == 0 or len(rdf) == 0:
            return ldf[lcols]
        m = ldf.merge(
            rdf[rk].drop_duplicates(),
            how="left",
            left_on=left_keys,
            right_on=rk,
            indicator="__in_right__",
        )
        return m[m["__in_right__"] == "left_only"][lcols]

    return shuffle_merge(
        left,
        right.select_columns(rk),
        left_keys,
        rk,
        _anti,
        out_schema,
        num_partitions=num_partitions,
        left_schema=out_schema,
        right_schema=right_schema,
    )


def broadcast_left_join(
    big: ray.data.Dataset,
    small_df: pd.DataFrame,
    left_on: list[str],
    right_on: list[str],
) -> ray.data.Dataset:
    """J7 pattern: small side broadcast via ray.put, pandas merge map-side."""
    ref = ray.put(small_df)

    def _join(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(ref)
        return batch.merge(small, how="left", left_on=left_on, right_on=right_on)

    return big.map_batches(_join, batch_format="pandas")


def grouped_topk(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    k: int,
    tiebreak: list[str] | None = None,
) -> ray.data.Dataset:
    """K1 (R/fuzzylink.R:203-211): per-group top-k by value, keeping ties —
    ``slice_max`` semantics = rows with rank() <= k under descending value."""

    def _topk(group: pd.DataFrame) -> pa.Table:
        ranks = group[value_col].rank(method="min", ascending=False)
        out = group[ranks <= k]
        if tiebreak:
            out = out.sort_values(tiebreak, kind="stable")
        # arrow out: keeps block types homogeneous for downstream shuffles
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return ds.groupby(group_col).map_groups(_topk, batch_format="pandas")


def preagg_sum_count(
    ds: ray.data.Dataset,
    group_cols: list[str],
    sum_cols: dict[str, str],
    final_partitions: int | None = None,
) -> ray.data.Dataset:
    """Pre-aggregated grouped sums: per-batch pandas partial aggregation
    (one row per group per batch) before the global groupby — the
    shuffle moves partials, not rows (SURVEY.md §4 / ray_guide).

    ``final_partitions``: when the group-key cardinality is KNOWN to be
    small (e.g. a roll-up to a handful of status flags), pass a matching
    small count — the final groupby's sort otherwise partitions the tiny
    partial table to the input block count and emits one schema-less empty
    block per surplus partition (Ray 2.49 executor warnings). Leave None
    for high-cardinality groups: the partial table is (blocks × groups)
    rows and needs the parallel sort."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(group_cols, as_index=False, sort=False).agg(
            **{out: (src, "sum") for src, out in sum_cols.items()},
            _n=(group_cols[0], "size"),
        )
        return g

    partials = ds.map_batches(_partial, batch_format="pandas")
    if final_partitions is not None:
        partials = partials.repartition(final_partitions)
    aggs = [Sum(out, alias_name=out) for out in sum_cols.values()]
    aggs.append(Sum("_n", alias_name="n"))
    return partials.groupby(group_cols).aggregate(*aggs)
