"""Distributed graph analytics over entity-resolution edge sets.

The ER pipelines emit pair/edge tables (near-dup candidates, accepted
matches, blocking candidates). Beyond connected components
(``raylink/cluster.py``), the standard structural statistic is the
TRIANGLE count — how clique-like the match graph is (a near-dup cluster
of mutually-similar documents closes its wedges; a chain of borderline
matches does not). :func:`triangle_counts` is the compact-forward
algorithm distributed on the engine's two exchange primitives:

1. route edges by their LOW endpoint (``a < b`` ordering makes every
   triangle ``a < b1 < b2`` countable exactly once, at its lowest node);
   each partition expands, for every node, all ``(b1 < b2)`` neighbor
   pairs — wedges — with the same closed-form ``np.repeat`` + cumsum
   index arithmetic as ``ops/window.py basket_pairs`` (no per-node loop).
2. one ``shuffle_merge`` joins the wedge stream against the edge table on
   the closing pair ``(b1, b2)``; each match is one triangle and credits
   all three corners. Per-partition ``value_counts`` partials reduce
   before the final node-keyed groupby sum.

Scale contract: the wedge stream is Σ_a deg⁺(a)² rows (deg⁺ = higher
neighbors) through ONE exchange — the low-endpoint orientation bounds it
by the classic arboricity argument (hub nodes rank HIGH in most of their
edges, so their wedge fan-out collapses); the skew bound is the hottest
low node's deg⁺². Edges must be distinct with ``a < b`` (raise otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def triangle_counts(
    edges: ray.data.Dataset,
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-node triangle participation counts. Input: distinct undirected
    edges with ``a_col < b_col`` (int64 node ids). Output: one row per
    node that belongs to ≥1 triangle — ``(node, n_triangles)``."""
    from ray.data.aggregate import Sum

    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import shuffle_merge, sorted_partition_apply

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()

    def _tag(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False)
        b = batch.column(b_col).to_numpy(zero_copy_only=False)
        if not (a < b).all():
            raise ValueError("triangle_counts requires a < b on every edge")
        pid = (_mix64(a.astype(np.uint64)) % P).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                "a": pa.array(a.astype(np.int64)),
                "b": pa.array(b.astype(np.int64)),
            }
        )

    wedge_schema = pa.schema(
        [("w1", pa.int64()), ("w2", pa.int64()), ("apex", pa.int64())]
    )

    def _wedges(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(["a", "b"], kind="stable")
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        sizes = pd.Series(a).groupby(a, sort=False).size().to_numpy()
        starts = np.cumsum(sizes) - sizes
        idx_in = np.arange(len(a)) - np.repeat(starts, sizes)
        rep = (np.repeat(sizes, sizes) - idx_in - 1).astype(np.int64)
        total = int(rep.sum())
        if total == 0:
            return wedge_schema.empty_table()
        i1 = np.repeat(np.arange(len(a)), rep)
        excl = np.cumsum(rep) - rep
        rank = np.arange(total) - np.repeat(excl, rep)
        i2 = i1 + 1 + rank
        # neighbors sorted ascending within each a: b[i1] < b[i2]
        return pa.table(
            {
                "w1": pa.array(b[i1]),
                "w2": pa.array(b[i2]),
                "apex": pa.array(a[i1]),
            }
        )

    tagged = edges.map_batches(_tag, batch_format="pyarrow")
    wedges = sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _wedges, wedge_schema
    )

    partial_schema = pa.schema([("node", pa.int64()), ("c", pa.int64())])

    def _close(wdf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        if len(wdf) == 0 or len(edf) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.int64)})
        m = wdf.merge(
            edf.drop_duplicates(), left_on=["w1", "w2"], right_on=["a", "b"]
        )
        if len(m) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.int64)})
        nodes = np.concatenate(
            [m["apex"].to_numpy(), m["w1"].to_numpy(), m["w2"].to_numpy()]
        )
        vc = pd.Series(nodes).value_counts()
        return pd.DataFrame(
            {"node": vc.index.to_numpy(np.int64), "c": vc.to_numpy(np.int64)}
        )

    partials = shuffle_merge(
        wedges,
        edges.map_batches(
            lambda t: pa.table(
                {
                    "a": t.column(a_col).cast(pa.int64()),
                    "b": t.column(b_col).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        ["w1", "w2"],
        ["a", "b"],
        _close,
        partial_schema,
        num_partitions=num_partitions,
        left_schema=wedge_schema,
        right_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    )
    return partials.groupby("node").aggregate(Sum("c", alias_name="n_triangles"))
