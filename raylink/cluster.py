"""Entity clustering: transitive closure over accepted match edges
(north_rule extension beyond the reference; SURVEY.md §1.3 last row, §7 B-CLUSTER).

Nodes are ``(block, key)`` strings (A- and B-side keys share the node space —
string identity within a block, matching the reference's string-keyed pair
semantics). Two paths:

* :func:`cluster_union_find` — driver-side union-find; default, since the
  accepted edge set is post-filter and label-budget-shaped (small relative
  to the candidate stream).
* :func:`cluster_label_propagation` — distributed min-label propagation
  (iterated ``groupby(node).min(label)`` message passing) for when the edge
  set itself is too large for one machine; converges in O(component
  diameter) rounds. Partitioning assumption: edges are shuffled by ``block``
  + node key each round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Min


def cluster_union_find(edges: pd.DataFrame) -> pd.DataFrame:
    """edges: columns (block, key_a, key_b) → (block, key, entity_id).

    entity_id = the lexicographically smallest key in the component,
    namespaced by block — deterministic, order-insensitive."""
    parent: dict[tuple[str, str], tuple[str, str]] = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the lexicographically smaller root for determinism
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    for blk, ka, kb in zip(edges["block"], edges["key_a"], edges["key_b"]):
        a, b = (blk, ka), (blk, kb)
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        union(a, b)

    rows = {"block": [], "key": [], "entity_id": []}
    for node in parent:
        root = find(node)
        rows["block"].append(node[0])
        rows["key"].append(node[1])
        rows["entity_id"].append(f"{root[0]}|{root[1]}")
    out = pd.DataFrame(rows).sort_values(["block", "key"], kind="stable")
    return out.reset_index(drop=True)


def cluster_label_propagation(
    edges: ray.data.Dataset, max_iter: int = 50, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Distributed min-label propagation over an edge Dataset
    (block, key_a, key_b) — the genuinely distributed scale path: per round
    the node→label table is attached to both edge endpoints via
    hash-partitioned **shuffle joins** (``util.shuffle_merge``), never
    collected to the driver or broadcast whole. O(component diameter)
    rounds, each round = two shuffles of the edge set + one groupby-min of
    the proposal stream; the fixpoint check is a distributed hash aggregate
    (one scalar to the driver per round)."""
    import pyarrow.compute as pc

    from raylink.util import shuffle_merge

    def _nodes(batch: pa.Table) -> pa.Table:
        blk = pa.concat_arrays(
            [batch.column("block").combine_chunks(), batch.column("block").combine_chunks()]
        )
        key = pa.concat_arrays(
            [batch.column("key_a").combine_chunks(), batch.column("key_b").combine_chunks()]
        )
        return pa.table({"block": blk, "key": key, "label": key})

    labels = (
        edges.map_batches(_nodes, batch_format="pyarrow")
        .groupby(["block", "key"])
        .aggregate(Min("label", alias_name="label"))
    )

    edges = edges.select_columns(["block", "key_a", "key_b"]).materialize()
    labels = labels.materialize()

    e1_schema = pa.schema(
        [("block", pa.string()), ("key_a", pa.string()), ("key_b", pa.string()),
         ("la", pa.string())]
    )
    e2_schema = pa.schema(
        [("block", pa.string()), ("key_a", pa.string()), ("key_b", pa.string()),
         ("la", pa.string()), ("lb", pa.string())]
    )

    def _attach(col: str, out: str):
        def _m(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
            m = ldf.merge(
                rdf.rename(columns={"key": col, "label": out}),
                how="left", on=["block", col],
            )
            # every endpoint is seeded in the label table; defensive fallback
            m[out] = m[out].fillna(m[col])
            return m

        return _m

    def _label_digest(lab: ray.data.Dataset) -> int:
        """Distributed fixpoint probe: order-independent sum of per-row
        hashes (one int64 partial per batch reaches the driver)."""

        def _h(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            h = pd.util.hash_pandas_object(df, index=False).to_numpy()
            return pa.table({"d": pa.array([int(h.sum(dtype=np.uint64))],
                                           type=pa.uint64())})

        parts = lab.map_batches(_h, batch_format="pyarrow").to_pandas()
        return int(np.sum(parts["d"].to_numpy(dtype=np.uint64), dtype=np.uint64))

    prev_digest: int | None = None
    for _ in range(max_iter):
        e1 = shuffle_merge(
            edges, labels, ["block", "key_a"], ["block", "key"],
            _attach("key_a", "la"), e1_schema, num_partitions=num_partitions,
        )
        e2 = shuffle_merge(
            e1, labels, ["block", "key_b"], ["block", "key"],
            _attach("key_b", "lb"), e2_schema, num_partitions=num_partitions,
        )

        def _messages(batch: pa.Table) -> pa.Table:
            m = pc.min_element_wise(batch.column("la"), batch.column("lb"))
            blk = pa.concat_arrays(
                [batch.column("block").combine_chunks()] * 2
            )
            key = pa.concat_arrays(
                [batch.column("key_a").combine_chunks(), batch.column("key_b").combine_chunks()]
            )
            mm = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
            return pa.table(
                {"block": blk, "key": key, "label": pa.concat_arrays([mm, mm])}
            )

        proposals = e2.map_batches(_messages, batch_format="pyarrow").union(labels)
        labels = (
            proposals.groupby(["block", "key"])
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )

        # labels are monotone non-increasing per node: equal digests ⇒ fixpoint
        cur_digest = _label_digest(labels)
        if cur_digest == prev_digest:
            break
        prev_digest = cur_digest

    def _entity(batch: pa.Table) -> pa.Table:
        eid = pc.binary_join_element_wise(
            batch.column("block"), batch.column("label"), "|"
        )
        return pa.table(
            {"block": batch.column("block"), "key": batch.column("key"), "entity_id": eid}
        )

    return labels.map_batches(_entity, batch_format="pyarrow")
