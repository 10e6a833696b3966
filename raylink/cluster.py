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


def golden_records(
    records: ray.data.Dataset,
    edges: ray.data.Dataset,
    id_col: str = "doc_id",
    fields: list[str] | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Survivorship: collapse each connected component of ``edges`` into
    ONE canonical ("golden") record — the master-data-management step that
    follows matching in every real ER deployment (reference scope ends at
    pairs + clusters; this consumes them). Emits one row per entity:
    ``(entity_id, n_members, *fields)`` where

    * ``entity_id`` = the smallest member id (int64) — deterministic and
      stable under re-runs; singletons (records in no edge) are their own
      entity, so the output covers every input record;
    * each field's golden value is the component's MODAL value under the
      ``grouped_mode`` tie rule (highest count, then smallest value) — a
      total order, so the table is a pure function of (records, edges).

    Shape: the component labels come from the distributed
    :func:`cluster_label_propagation` (edge-scale shuffle joins, O(log
    diameter) rounds); labels attach to records via ONE
    ``util.shuffle_merge`` hash exchange on the id; then ONE
    hash-of-entity exchange co-locates each component's members so
    n_members and every field's mode are computed vectorized per
    partition (all entities of the partition at once, per-field
    sort + group-first — no per-entity loop). Skew bound: the largest
    component must fit a partition — the same assumption the clustering
    itself states.

    Ids must be non-negative int64 (zero-padded label keys — the curate
    edge-key contract; explicit raise).
    """
    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import (
        pa_type,
        shuffle_merge,
        skip_empty,
        sorted_partition_apply,
    )

    fields = list(fields or [])
    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    schema = records.schema()
    ftypes = dict(zip(schema.names, (pa_type(t) for t in schema.types)))

    def _pad(arr: np.ndarray) -> np.ndarray:
        if len(arr) and arr.min() < 0:
            raise ValueError(
                "golden_records requires non-negative ids (zero-padded "
                "label keys do not order correctly for negatives)"
            )
        return np.char.zfill(arr.astype("U20"), 20)

    def _to_edges(batch: pa.Table) -> pa.Table:
        ida = batch.column("id_a").to_numpy(zero_copy_only=False)
        idb = batch.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "block": pa.array(np.full(len(ida), "g"), type=pa.string()),
                "key_a": pa.array(_pad(ida)),
                "key_b": pa.array(_pad(idb)),
            }
        )

    def _unpack_label(batch: pa.Table) -> pa.Table:
        # entity_id is "g|<padded-min-key>": strip the block prefix back
        # to the padded key (block is the constant 'g' namespace here)
        ent = batch.column("entity_id").to_pandas().str.slice(2)
        return pa.table(
            {
                "key": batch.column("key"),
                "label": pa.array(ent.to_numpy(), type=pa.string()),
            }
        )

    labels = cluster_label_propagation(
        edges.map_batches(skip_empty(_to_edges), batch_format="pyarrow"),
        num_partitions=nparts,
    ).map_batches(skip_empty(_unpack_label), batch_format="pyarrow")

    def _tag_rec(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cols = {"_k": pa.array(_pad(ids)), id_col: batch.column(id_col)}
        for f in fields:
            cols[f] = batch.column(f)
        return pa.table(cols)

    att_schema = pa.schema(
        [(id_col, pa.int64()), ("entity_id", pa.int64())]
        + [(f, ftypes[f]) for f in fields]
    )

    def _attach(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        lab = right.drop_duplicates("key").set_index("key")["label"]
        ent = left["_k"].map(lab)
        ent = ent.where(ent.notna(), left["_k"])  # singleton: own key
        out = pd.DataFrame(
            {
                id_col: left[id_col].to_numpy(),
                "entity_id": ent.astype(np.int64).to_numpy(),
            }
        )
        for f in fields:
            out[f] = left[f].to_numpy()
        return out

    attached = shuffle_merge(
        records.map_batches(_tag_rec, batch_format="pyarrow"),
        labels,
        ["_k"],
        ["key"],
        _attach,
        att_schema,
        num_partitions=nparts,
    )

    out_schema = pa.schema(
        [("entity_id", pa.int64()), ("n_members", pa.int64())]
        + [(f, ftypes[f]) for f in fields]
    )

    def _tag_ent(batch: pa.Table) -> pa.Table:
        ent = batch.column("entity_id").to_numpy(zero_copy_only=False)
        pid = (_mix64(ent.astype(np.uint64)) % P).astype(np.int64)
        return batch.append_column("_pid", pa.array(pid)).replace_schema_metadata(None)

    def _golden(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        base = df.groupby("entity_id", as_index=False).agg(
            n_members=(id_col, "size")
        )
        for f in fields:
            cnt = df.groupby(["entity_id", f], as_index=False).agg(
                _c=(id_col, "size")
            )
            cnt = cnt.sort_values(
                ["entity_id", "_c", f], ascending=[True, False, True],
                kind="stable",
            )
            mode = cnt.groupby("entity_id", as_index=False, sort=False).first()
            # LEFT merge: the per-(entity, f) count groupby drops NaN
            # values, so an entity whose f is all-null has NO mode row —
            # an inner merge would silently drop the whole entity,
            # breaking the "covers every input record" contract. The
            # golden value for such a field is null.
            base = base.merge(mode[["entity_id", f]], on="entity_id", how="left")
        cols = {
            "entity_id": pa.array(base["entity_id"].to_numpy(), type=pa.int64()),
            "n_members": pa.array(base["n_members"].to_numpy().astype(np.int64)),
        }
        for f in fields:
            col = base[f].astype(object).where(base[f].notna(), None)
            cols[f] = pa.array(col.to_numpy(), type=ftypes[f])
        return pa.table(cols)

    return sorted_partition_apply(
        attached.map_batches(skip_empty(_tag_ent), batch_format="pyarrow").repartition(nparts),
        "_pid",
        _golden,
        out_schema,
    )


def incremental_components(
    assign: "ray.data.Dataset",
    new_edges: "ray.data.Dataset",
    node_col: str = "node",
    comp_col: str = "comp",
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int | None = None,
    driver_edge_cap: int = 5_000_000,
) -> "ray.data.Dataset":
    """Incremental connected components — the daily-shard ER reclustering
    primitive: given an EXISTING assignment table ``(node, comp)`` (comp
    following the min-node-id convention the engine's clusterings emit)
    and a batch of NEW edges, produce the updated assignment WITHOUT
    re-running closure over the corpus.

    Shape: the only corpus-scale work is two hash exchanges. (1) each new
    edge endpoint is rewritten to its component representative via one
    ``shuffle_merge`` per side against ``assign`` (unknown endpoints — 
    brand-new nodes — represent themselves); (2) union-find runs DRIVER-
    side over the REP edge table, which is bounded by the NEW shard's
    size, not the corpus (the incremental contract, same as
    ``minhash_incremental_candidates``; ``driver_edge_cap`` guards the
    bound loudly — above it, fall back to a full distributed closure);
    (3) one ``shuffle_merge`` of ``assign`` against the rep→new-root
    remap attaches the merged labels, and nodes in untouched components
    pass through without a rewrite. New nodes appear in the output with
    their merged component. Root convention: MIN over the merged
    component of (old comps, new node ids) — stays min-node-id, so the
    op composes with itself shard after shard.
    """
    import numpy as np
    from raylink.util import pa_type, shuffle_merge, skip_empty

    nd_schema = pa.schema([(node_col, pa.int64()), (comp_col, pa.int64())])

    epair = new_edges.map_batches(
        skip_empty(
            lambda t: pa.table(
                {
                    "a": t.column(a_col).cast(pa.int64()),
                    "b": t.column(b_col).cast(pa.int64()),
                }
            )
        ),
        batch_format="pyarrow",
    )

    def _attach(side: str, out: str):
        def _m(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
            m = ldf.merge(
                rdf.rename(columns={node_col: side, comp_col: out}),
                how="left",
                on=side,
            )
            m[out] = m[out].fillna(m[side]).astype(np.int64)
            return m

        return _m

    s1 = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("ra", pa.int64())])
    s2 = pa.schema(list(s1) + [pa.field("rb", pa.int64())])
    rep = shuffle_merge(
        epair, assign, ["a"], [node_col], _attach("a", "ra"), s1,
        num_partitions=num_partitions,
        left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
        right_schema=nd_schema,
    )
    rep = shuffle_merge(
        rep, assign, ["b"], [node_col], _attach("b", "rb"), s2,
        num_partitions=num_partitions,
        left_schema=s1, right_schema=nd_schema,
    ).materialize()  # consumed twice: rep-edge collect + fresh-node scan

    def _slim(t: pa.Table) -> pa.Table:
        ra = t.column("ra").to_numpy(zero_copy_only=False)
        rb = t.column("rb").to_numpy(zero_copy_only=False)
        keep = ra != rb
        # per-partition dedup: the rep stream is shard-scale already, this
        # only trims the driver collect
        df = pd.DataFrame({"ra": ra[keep], "rb": rb[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    rep_df = rep.map_batches(skip_empty(_slim), batch_format="pyarrow").to_pandas()
    rep_df = rep_df.drop_duplicates()
    if len(rep_df) > driver_edge_cap:
        raise ValueError(
            f"incremental_components: {len(rep_df)} rep edges exceed "
            f"driver_edge_cap={driver_edge_cap}; run a full distributed "
            "closure for this shard instead"
        )
    # driver union-find over the shard-scale rep graph, min-root convention
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for ra, rb in rep_df.itertuples(index=False):
        xa, xb = find(int(ra)), find(int(rb))
        if xa != xb:
            lo, hi = (xa, xb) if xa < xb else (xb, xa)
            parent[hi] = lo
    remap = {x: find(x) for x in list(parent)}
    remap = {k: v for k, v in remap.items() if k != v}
    remap_tbl = pa.table(
        {
            "old": pa.array(list(remap.keys()), pa.int64()),
            "new": pa.array(list(remap.values()), pa.int64()),
        }
    )
    remap_ds = ray.data.from_arrow(remap_tbl) if len(remap) else None

    # new nodes (endpoints absent from assign) enter the output seeded by
    # themselves so the final remap covers them too
    def _new_nodes(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        ra = t.column("ra").to_numpy(zero_copy_only=False)
        rb = t.column("rb").to_numpy(zero_copy_only=False)
        fresh = np.unique(np.concatenate([a[ra == a], b[rb == b]]))
        return pa.table(
            {node_col: pa.array(fresh, pa.int64()),
             comp_col: pa.array(fresh, pa.int64())}
        )

    # a node can be "fresh" only if absent from assign; nodes whose comp
    # HAPPENS to equal their id are cluster roots and re-emitting them
    # (node, node) is exactly their assign row — the union below dedups
    # via groupby-min? No: keep it exact — anti the fresh set against
    # assign inside the final merge instead.
    fresh_nodes = rep.map_batches(skip_empty(_new_nodes), batch_format="pyarrow")

    full = assign.union(fresh_nodes)

    if remap_ds is None:
        from ray.data.aggregate import Min

        return full.groupby(node_col).aggregate(
            Min(comp_col, alias_name=comp_col)
        )

    out_schema = nd_schema

    def _remap(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        m = ldf.merge(
            rdf.rename(columns={"old": comp_col, "new": "_new"}),
            how="left",
            on=comp_col,
        )
        m[comp_col] = m["_new"].fillna(m[comp_col]).astype(np.int64)
        # duplicate (node, comp) rows from fresh-node re-emission of roots
        return m[[node_col, comp_col]].drop_duplicates()

    return shuffle_merge(
        full,
        remap_ds,
        [comp_col],
        ["old"],
        _remap,
        out_schema,
        num_partitions=num_partitions,
        left_schema=nd_schema,
        right_schema=pa.schema([("old", pa.int64()), ("new", pa.int64())]),
    )
