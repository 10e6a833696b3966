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

    def _topk(group: pd.DataFrame) -> pd.DataFrame:
        ranks = group[value_col].rank(method="min", ascending=False)
        out = group[ranks <= k]
        if tiebreak:
            out = out.sort_values(tiebreak, kind="stable")
        return out

    return ds.groupby(group_col).map_groups(_topk, batch_format="pandas")


def preagg_sum_count(
    ds: ray.data.Dataset,
    group_cols: list[str],
    sum_cols: dict[str, str],
) -> ray.data.Dataset:
    """Pre-aggregated grouped sums: per-batch pandas partial aggregation
    (one row per group per batch) before the global groupby — the
    shuffle moves partials, not rows (SURVEY.md §4 / ray_guide)."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(group_cols, as_index=False, sort=False).agg(
            **{out: (src, "sum") for src, out in sum_cols.items()},
            _n=(group_cols[0], "size"),
        )
        return g

    partials = ds.map_batches(_partial, batch_format="pandas")
    aggs = [Sum(out, alias_name=out) for out in sum_cols.values()]
    aggs.append(Sum("_n", alias_name="n"))
    return partials.groupby(group_cols).aggregate(*aggs)
