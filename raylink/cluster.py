"""Entity clustering: transitive closure over accepted match edges
(north_rule extension beyond the reference; SURVEY.md §1.3 last row, §7 B-CLUSTER).

Nodes are ``(block, key)`` strings (A- and B-side keys share the node space —
string identity within a block, matching the reference's string-keyed pair
semantics). Two paths:

* :func:`cluster_union_find` — driver-side union-find; default, since the
  accepted edge set is post-filter and label-budget-shaped (small relative
  to the candidate stream).
* :func:`cluster_label_propagation` — distributed min-label propagation
  with pointer jumping, for when the edge set itself is too large for one
  machine; converges in O(log component diameter) rounds. Partitioning
  assumption: edges are shuffled by ``block`` + node key each round.
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
    collected to the driver or broadcast whole. Each round = two
    shuffle-join relabels of the edge set, one groupby-min
    of the proposal stream, and a pointer-jumping self-join (label-of-label
    shortcut) that makes convergence O(log diameter); the fixpoint check is
    a distributed hash aggregate (one scalar to the driver per round). The
    label table's block count is re-pinned each round — Ray's sort-based
    groupby otherwise compounds partition counts round over round."""
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

    if num_partitions is None:
        try:
            _P = max(8, int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            _P = 8
    else:
        _P = num_partitions
    edges = (
        edges.select_columns(["block", "key_a", "key_b"]).repartition(_P).materialize()
    )
    labels = labels.repartition(_P).materialize()

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

    edge_schema = pa.schema(
        [("block", pa.string()), ("key_a", pa.string()), ("key_b", pa.string())]
    )
    label_schema = pa.schema(
        [("block", pa.string()), ("key", pa.string()), ("label", pa.string())]
    )

    import os as _os
    import time as _time

    # round-level tracing for ops debugging (RAYLINK_LP_DEBUG=1)
    _dbg = bool(_os.environ.get("RAYLINK_LP_DEBUG"))
    prev_digest: int | None = None
    for _round in range(max_iter):
        if _dbg:
            print(f"LP r{_round} start {_time.time():.1f}", flush=True)
        # explicit schemas: a Dataset.schema() probe on the lazy e1 would
        # re-execute its whole shuffle once per round
        e1 = shuffle_merge(
            edges, labels, ["block", "key_a"], ["block", "key"],
            _attach("key_a", "la"), e1_schema, num_partitions=num_partitions,
            left_schema=edge_schema, right_schema=label_schema,
        )
        e2 = shuffle_merge(
            e1, labels, ["block", "key_b"], ["block", "key"],
            _attach("key_b", "lb"), e2_schema, num_partitions=num_partitions,
            left_schema=e1_schema, right_schema=label_schema,
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
        # pinned: the self-join below reads this twice (once per side)
        labels = (
            proposals.groupby(["block", "key"])
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        if _dbg:
            print(f"LP r{_round} relabel done {_time.time():.1f}", flush=True)

        # pointer jumping: replace every node's label with its label's
        # label (one more shuffle join) — chains halve each round, so
        # convergence is O(log diameter) instead of O(diameter)
        def _jump(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
            r2 = rdf.rename(columns={"key": "label", "label": "_ll"})
            m = ldf.merge(r2, how="left", on=["block", "label"])
            m["label"] = m["_ll"].fillna(m["label"])
            return m[["block", "key", "label"]]

        # Re-pin the label table's block count each round: Ray's sort-based
        # groupby emits one output partition per INPUT block, so without
        # this the labels inherit (edges + labels + messages) blocks every
        # round — compounding block counts and per-round cost.
        labels = (
            shuffle_merge(
                labels, labels, ["block", "label"], ["block", "key"],
                _jump, label_schema, num_partitions=num_partitions,
                left_schema=label_schema, right_schema=label_schema,
            )
            .repartition(_P)
            .materialize()
        )
        if _dbg:
            print(f"LP r{_round} jump done {_time.time():.1f}", flush=True)

        # labels are monotone non-increasing per node: equal digests ⇒ fixpoint
        cur_digest = _label_digest(labels)
        if _dbg:
            print(f"LP r{_round} digest={cur_digest}", flush=True)
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
