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
    edges: ray.data.Dataset, max_iter: int = 50
) -> ray.data.Dataset:
    """Distributed variant over an edge Dataset (block, key_a, key_b).

    Each round: every edge proposes min(label_a, label_b) to both endpoints;
    ``groupby(block, key).min`` folds proposals; stop at fixpoint. The edge
    table is re-labeled via join each round — at 10¹²-file scale this is
    O(rounds) hash shuffles of the (small) accepted-edge set, never of the
    corpus."""
    import pyarrow.compute as pc

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
    prev_sum: int | None = None
    for _ in range(max_iter):
        # Broadcast the current node→label map (node table is proportional
        # to the accepted-edge endpoints, not the corpus) and re-label both
        # edge endpoints map-side; Ray 2.49's Dataset.join cannot be used
        # here because label partitions go sparse near convergence
        # (util.hash_join warning).
        lab_map = {
            (b, k): l
            for b, k, l in zip(
                *(labels.to_pandas()[c] for c in ("block", "key", "label"))
            )
        }
        lab_ref = ray.put(lab_map)

        def _messages(batch: pa.Table) -> pa.Table:
            lab = ray.get(lab_ref)
            blks = batch.column("block").to_pylist()
            kas = batch.column("key_a").to_pylist()
            kbs = batch.column("key_b").to_pylist()
            out_blk, out_key, out_lab = [], [], []
            for b, ka, kb in zip(blks, kas, kbs):
                la = lab.get((b, ka), ka)
                lb = lab.get((b, kb), kb)
                m = la if la < lb else lb
                out_blk += [b, b]
                out_key += [ka, kb]
                out_lab += [m, m]
            return pa.table(
                {
                    "block": pa.array(out_blk, type=pa.string()),
                    "key": pa.array(out_key, type=pa.string()),
                    "label": pa.array(out_lab, type=pa.string()),
                }
            )

        proposals = edges.map_batches(_messages, batch_format="pyarrow").union(labels)
        labels = (
            proposals.groupby(["block", "key"])
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )

        # fixpoint: total label ordering is monotone non-increasing; stop
        # when the multiset of labels stops changing (cheap hash aggregate)
        lab_pdf = labels.to_pandas()
        cur_sum = int(
            pd.util.hash_pandas_object(
                lab_pdf.sort_values(["block", "key"]).reset_index(drop=True)
            ).sum()
        )
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    def _entity(batch: pa.Table) -> pa.Table:
        eid = pc.binary_join_element_wise(
            batch.column("block"), batch.column("label"), "|"
        )
        return pa.table(
            {"block": batch.column("block"), "key": batch.column("key"), "entity_id": eid}
        )

    return labels.map_batches(_entity, batch_format="pyarrow")
