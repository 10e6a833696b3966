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


def pagerank(
    edges: ray.data.Dataset,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
    broadcast_cap: int = 2_000_000,
) -> ray.data.Dataset:
    """Integer fixed-point PageRank over a DIRECTED edge table — every
    arithmetic step is int64, so the result is bit-reproducible and
    SQL-replayable with unrolled per-iteration CTEs (the ``pagerank``
    oracle gate):

    * ``pr_0(v) = scale`` for every node (unnormalized mass convention);
    * ``contrib(u) = pr(u) // outdeg(u)`` (floor division; dangling-node
      mass is dropped, the standard simplification — document it to
      callers);
    * ``pr_{k+1}(v) = (scale*(100-damping_pct))//100
      + (damping_pct * Σ_{(u,v)∈E} contrib(u)) // 100``.

    Scale shape: the degree-annotated edge table is built ONCE (one
    groupby + one ``shuffle_merge``) and materialized for reuse; each
    iteration is exactly TWO exchanges — ``shuffle_merge`` of the
    node-scale ``pr`` table onto the edge partitions (contribs are
    pre-summed per dst INSIDE the merge kernel, so the second exchange
    moves per-partition partials, not per-edge rows) and one global
    ``groupby(node).sum``. Zero-rows for every node ride the same
    groupby, folding the no-inbound-edges left join into the exchange
    that already happens. Nodes = distinct endpoints of ``edges``.
    Returns ``(node, pr)`` rows.
    """
    from ray.data.aggregate import Count, Sum

    from raylink.util import shuffle_merge

    base = (scale * (100 - damping_pct)) // 100

    from raylink.util import skip_empty

    epair = edges.map_batches(
        skip_empty(
            lambda t: pa.table(
                {
                    "src": t.column(src_col).cast(pa.int64()),
                    "dst": t.column(dst_col).cast(pa.int64()),
                }
            )
        ),
        batch_format="pyarrow",
    ).materialize()

    deg = epair.groupby("src").aggregate(Count(alias_name="deg"))

    edge_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("deg", pa.int64())]
    )

    def _attach_deg(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if len(ldf) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in ("src", "dst", "deg")}
            )
        m = ldf.merge(rdf, left_on="src", right_on="src", how="inner")
        return m[["src", "dst", "deg"]].astype(np.int64)

    E = shuffle_merge(
        epair,
        deg,
        ["src"],
        ["src"],
        _attach_deg,
        edge_schema,
        num_partitions=num_partitions,
        left_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        right_schema=pa.schema([("src", pa.int64()), ("deg", pa.int64())]),
    ).materialize()

    def _endpoints(t: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                t.column("src").to_numpy(zero_copy_only=False),
                t.column("dst").to_numpy(zero_copy_only=False),
            ]
        )
        return pa.table({"node": pa.array(np.unique(both))})

    nodes = (
        epair.map_batches(skip_empty(_endpoints), batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .select_columns(["node"])
        .materialize()
    )
    zeros = nodes.map_batches(
        skip_empty(lambda t: pa.table(
            {
                "node": t.column("node"),
                "s": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        )),
        batch_format="pyarrow",
    ).materialize()

    pr = nodes.map_batches(
        skip_empty(lambda t: pa.table(
            {
                "node": t.column("node"),
                "pr": pa.array(np.full(t.num_rows, scale, dtype=np.int64)),
            }
        )),
        batch_format="pyarrow",
    ).materialize()

    partial_schema = pa.schema([("node", pa.int64()), ("s", pa.int64())])

    def _contrib(edf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(edf) == 0 or len(pdf) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=np.int64),
                 "s": pd.Series([], dtype=np.int64)}
            )
        m = edf.merge(pdf, left_on="src", right_on="node", how="inner")
        c = m["pr"].to_numpy(np.int64) // m["deg"].to_numpy(np.int64)
        # map-side combine: per-dst partial sums leave this partition,
        # never the per-edge contrib rows
        out = (
            pd.DataFrame({"node": m["dst"].to_numpy(np.int64), "s": c})
            .groupby("node", sort=False, as_index=False)["s"]
            .sum()
        )
        return out.astype(np.int64)

    # Size pick for the per-iteration join (same device as k_core's peel
    # set): pr is NODE-scale, so graphs whose node table fits the object
    # store broadcast it once per round and the contrib join becomes a
    # stateless sorted-searchsorted map over the STATIC edge table — zero
    # join exchanges per iteration (only the partial-sum groupby moves).
    # Node tables above broadcast_cap keep the fully distributed
    # shuffle-join path.
    n_nodes = nodes.count()
    use_broadcast = n_nodes <= broadcast_cap

    for _ in range(iters):
        if use_broadcast:
            prdf = pr.to_pandas()
            order = np.argsort(prdf["node"].to_numpy(), kind="stable")
            node_arr = prdf["node"].to_numpy(dtype=np.int64)[order]
            pr_arr = prdf["pr"].to_numpy(dtype=np.int64)[order]
            pr_ref = ray.put((node_arr, pr_arr))

            def _contrib_bcast(t: pa.Table) -> pa.Table:
                narr, parr = ray.get(pr_ref)
                src = t.column("src").to_numpy(zero_copy_only=False)
                dst = t.column("dst").to_numpy(zero_copy_only=False)
                deg = t.column("deg").to_numpy(zero_copy_only=False)
                idx = np.searchsorted(narr, src)
                c = parr[idx] // deg
                out = (
                    pd.DataFrame({"node": dst, "s": c})
                    .groupby("node", sort=False, as_index=False)["s"]
                    .sum()
                )
                return pa.table(
                    {
                        "node": pa.array(out["node"].to_numpy(np.int64)),
                        "s": pa.array(out["s"].to_numpy(np.int64)),
                    }
                )

            partials = E.map_batches(
                skip_empty(_contrib_bcast), batch_format="pyarrow"
            )
        else:
            partials = shuffle_merge(
                E,
                pr,
                ["src"],
                ["node"],
                _contrib,
                partial_schema,
                num_partitions=num_partitions,
                left_schema=edge_schema,
                right_schema=pa.schema(
                    [("node", pa.int64()), ("pr", pa.int64())]
                ),
            )
        summed = (
            partials.union(zeros)
            .groupby("node")
            .aggregate(Sum("s", alias_name="s"))
        )
        pr = summed.map_batches(
            skip_empty(lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "pr": pa.array(
                        base
                        + (
                            damping_pct
                            * t.column("s").to_numpy(zero_copy_only=False)
                        )
                        // 100
                    ),
                }
            )),
            batch_format="pyarrow",
        ).materialize()
    return pr


def k_core(
    edges: ray.data.Dataset,
    k: int,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 100,
    num_partitions: int | None = None,
    broadcast_cap: int = 1_000_000,
) -> ray.data.Dataset:
    """Nodes of the k-CORE: the maximal subgraph where every node keeps
    degree ≥ k, by distributed iterative peeling. Input: distinct
    undirected edges (``a_col`` < ``b_col``). Per round: one
    edge-scale groupby counts degrees and nodes under ``k`` form the
    peel set; edges touching it are removed by the classic size pick —
    peel sets ≤ ``broadcast_cap`` (the usual case after round 1: peel
    sets shrink fast) are ``ray.put`` once and dropped in a stateless
    vectorized ``np.isin`` map with ZERO exchanges, while larger ones go
    through TWO distributed anti-joins (one per endpoint) so round 1 of
    a large ``k`` can still drop half the graph without touching the
    driver. Monotone, so it terminates; rounds are bounded by the peel
    depth (the driver sees one scalar count per round — the fixpoint
    test). Returns ``(node,)`` rows of the surviving core.
    """
    from ray.data.aggregate import Count

    from raylink.ops.relational import anti_join

    from raylink.util import skip_empty

    E = edges.map_batches(
        skip_empty(
            lambda t: pa.table(
                {
                    "a": t.column(a_col).cast(pa.int64()),
                    "b": t.column(b_col).cast(pa.int64()),
                }
            )
        ),
        batch_format="pyarrow",
    ).materialize()

    def _endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            t.column("a").to_numpy(zero_copy_only=False),
                            t.column("b").to_numpy(zero_copy_only=False),
                        ]
                    )
                )
            }
        )

    for _ in range(max_rounds):
        deg = (
            E.map_batches(skip_empty(_endpoints), batch_format="pyarrow")
            .groupby("node")
            .aggregate(Count(alias_name="deg"))
        )
        bad = deg.map_batches(
            skip_empty(
                lambda t: t.filter(
                    pa.compute.less(t.column("deg"), pa.scalar(k))
                ).select(["node"])
            ),
            batch_format="pyarrow",
        ).materialize()
        n_bad = bad.count()
        if n_bad == 0:
            break
        if n_bad <= broadcast_cap:
            # the usual case after round 1: the peel set shrinks fast, so
            # ship it ONCE via ray.put and drop edges in a stateless
            # vectorized map — ZERO exchanges this round (vs two
            # anti-join all-to-alls of the whole edge set). np.isin is a
            # sort-based membership test, exact.
            bad_ids = np.sort(
                bad.to_pandas()["node"].to_numpy(dtype=np.int64)
            )
            bad_ref = ray.put(bad_ids)

            def _drop(t: pa.Table) -> pa.Table:
                ids = ray.get(bad_ref)
                a = t.column("a").to_numpy(zero_copy_only=False)
                b = t.column("b").to_numpy(zero_copy_only=False)
                keep = ~(np.isin(a, ids) | np.isin(b, ids))
                return t.filter(pa.array(keep))

            E = E.map_batches(
                skip_empty(_drop), batch_format="pyarrow"
            ).materialize()
        else:
            E = anti_join(
                anti_join(
                    E, bad, ["a"], ["node"], num_partitions=num_partitions
                ),
                bad,
                ["b"],
                ["node"],
                num_partitions=num_partitions,
            ).materialize()
        if E.count() == 0:
            break
    if E.count() == 0:
        # a fully-unraveled graph: typed empty result (a groupby over an
        # empty dataset would drop the schema)
        return ray.data.from_arrow(
            pa.schema([("node", pa.int64())]).empty_table()
        )
    return (
        E.map_batches(skip_empty(_endpoints), batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .select_columns(["node"])
    )


def bfs_distances(
    edges: ray.data.Dataset,
    source: int,
    max_hops: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
    broadcast_cap: int = 2_000_000,
) -> ray.data.Dataset:
    """Single-source BFS hop distances over a DIRECTED edge table:
    ``(node, dist)`` for every node reachable from ``source`` within
    ``max_hops`` edges. SQL-replayable with a bounded recursive CTE
    (UNION-dedup on (node, dist) states + MIN(dist) per node).

    Scale shape: level-synchronous frontier expansion. Frontiers up to
    ``broadcast_cap`` nodes (the common case: frontiers peak at one BFS
    level, not at graph size) are ``ray.put`` once and expanded by a
    stateless vectorized ``np.isin`` map over the edge table — a ZERO-
    exchange edge scan, the same size-picked pattern as :func:`k_core`'s
    peel sets. Larger frontiers fall back to one
    :func:`raylink.util.shuffle_merge` of the frontier onto hash
    partitions of the edges. Either way the round then does exactly ONE
    node-scale exchange: a shuffle_merge of the candidate dsts against
    the visited table that folds dedup + anti-join in one kernel (unit
    edge weights: a node's distance is final the first round it appears,
    so no min-merge is ever needed). The edge table is materialized once
    and never re-partitioned. The driver holds one scalar per round (the
    fixpoint test) plus the ≤cap broadcast frontier; rounds are bounded
    by min(graph diameter, ``max_hops``).
    """
    from raylink.util import shuffle_merge, skip_empty

    epair = edges.map_batches(
        skip_empty(
            lambda t: pa.table(
                {
                    "src": t.column(src_col).cast(pa.int64()),
                    "dst": t.column(dst_col).cast(pa.int64()),
                }
            )
        ),
        batch_format="pyarrow",
    ).materialize()

    nd_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])
    node_schema = pa.schema([("node", pa.int64())])
    dist = ray.data.from_arrow(
        pa.table({"node": pa.array([source], pa.int64()),
                  "dist": pa.array([0], pa.int64())})
    )
    frontier = dist
    frontier_n = 1

    def _expand_merge(ldf, rdf):
        import pandas as _pd

        if len(ldf) == 0 or len(rdf) == 0:
            return _pd.DataFrame({"node": _pd.Series([], dtype=np.int64)})
        m = ldf.merge(rdf, left_on="src", right_on="node", how="inner")
        # all candidates this round share one dist level: plain dedup
        return _pd.DataFrame({"node": m["dst"].astype(np.int64)}).drop_duplicates()

    def _dedup_anti(cdf, ddf):
        import pandas as _pd

        nodes = cdf["node"].drop_duplicates()
        if len(ddf):
            nodes = nodes[~nodes.isin(ddf["node"])]
        return _pd.DataFrame({"node": nodes.astype(np.int64)})

    for level in range(1, max_hops + 1):
        if frontier_n <= broadcast_cap:
            # to_pandas is pure block fetch on a driver-built / materialized
            # frontier — no Project op, so no schema-less empties
            fr_nodes = np.sort(frontier.to_pandas()["node"].to_numpy())
            ref = ray.put(fr_nodes)

            def _scan(t: pa.Table, _ref=ref) -> pa.Table:
                fn = ray.get(_ref)
                src = t.column("src").to_numpy(zero_copy_only=False)
                hit = np.searchsorted(fn, src)
                m = (hit < len(fn)) & (fn[np.minimum(hit, len(fn) - 1)] == src)
                dsts = np.unique(
                    t.column("dst").to_numpy(zero_copy_only=False)[m]
                )
                return pa.table({"node": pa.array(dsts, pa.int64())})

            cand = epair.map_batches(skip_empty(_scan), batch_format="pyarrow")
        else:
            cand = shuffle_merge(
                epair,
                frontier.select_columns(["node"]),
                ["src"],
                ["node"],
                _expand_merge,
                node_schema,
                num_partitions=num_partitions,
                left_schema=pa.schema(
                    [("src", pa.int64()), ("dst", pa.int64())]
                ),
                right_schema=node_schema,
            )
        # ONE candidate-scale exchange folds the cross-partition dedup
        # (same dst reached from several edge partitions) and the
        # visited-set anti-join — typed schemas throughout
        # dist passes WHOLE (node, dist): the merge tagger projects the
        # right_schema columns itself and skips 0-row anchor blocks, where
        # an explicit select_columns would Project them into schema-less
        # bundles (one executor warning per round)
        new_nodes = shuffle_merge(
            cand,
            dist,
            ["node"],
            ["node"],
            _dedup_anti,
            node_schema,
            num_partitions=num_partitions,
            left_schema=node_schema,
            right_schema=node_schema,
            # driver counts/collects the result itself: no schema anchor,
            # so an all-empty final round yields zero blocks, not a 0-row
            # block that downstream stages would re-emit schema-less
            anchor=False,
        ).materialize()
        frontier_n = new_nodes.count()
        if frontier_n == 0:
            break
        # the dedup-anti exchange dropped dist; every survivor is at this level
        if frontier_n <= broadcast_cap:
            # next round broadcasts anyway: rebuild the frontier as ONE
            # clean driver-built block, so the accumulating union carries
            # no 0-row anchor blocks (each anchor a downstream operator
            # would re-emit as a schema-less, warning-firing bundle)
            nodes_np = np.sort(new_nodes.to_pandas()["node"].to_numpy())
            frontier = ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(nodes_np, pa.int64()),
                        "dist": pa.array(
                            np.full(len(nodes_np), level, dtype=np.int64)
                        ),
                    }
                )
            )
            dist = dist.union(frontier)
        else:
            frontier = new_nodes.map_batches(
                skip_empty(
                    lambda t, _d=level: pa.table(
                        {
                            "node": t.column("node"),
                            "dist": pa.array(
                                np.full(t.num_rows, _d, dtype=np.int64)
                            ),
                        }
                    )
                ),
                batch_format="pyarrow",
            ).materialize()
            dist = dist.union(frontier).materialize()
    return dist


def link_prediction(
    edges: ray.data.Dataset,
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int | None = None,
    max_degree: int | None = None,
) -> ray.data.Dataset:
    """Common-neighbor link prediction over an undirected ER match graph:
    for every NON-adjacent pair ``(u < v)`` sharing at least one common
    neighbor, emit ``(u, v, cn, pa_score)`` — the common-neighbor count
    and the preferential-attachment score ``deg(u) * deg(v)``. Both are
    exact integers, so the result replays bit-exactly in SQL. In an ER
    pipeline these are the classic "missed match" candidates: two records
    never compared directly but each matched to the same third record.

    Input: distinct undirected edges with ``a_col < b_col`` (int64 ids;
    raises otherwise, same contract as :func:`triangle_counts`).

    Distributed shape (no driver materialization):

    1. symmetrize → route by CENTER node; each partition expands every
       node's sorted neighbor list into all ``m1 < m2`` pairs with the
       closed-form repeat/cumsum arithmetic (no per-node Python loop).
       The wedge stream is Σ_v deg(v)² rows through ONE exchange — unlike
       the triangle count's low-endpoint orientation this is the FULL
       square, so the skew bound is the hottest node's deg²;
       ``max_degree`` prunes hub centers (a node with deg > max_degree
       contributes no wedges), the standard meta-blocking escape valve.
    2. ONE shuffle_merge on the candidate pair does the (u, v) count AND
       the anti-join against the edge table in the same partition visit
       (equal pairs share a hash partition, so the per-partition
       value_counts is the global count).
    3. degrees are per-batch value_counts partials → node groupby sum
       (node-scale, not pair-scale); two node-keyed shuffle_merges attach
       deg(u) and deg(v) and compute the product.
    """
    from ray.data.aggregate import Sum

    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import shuffle_merge, skip_empty, sorted_partition_apply

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()

    @skip_empty
    def _sym(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if not (a < b).all():
            raise ValueError("link_prediction requires a < b on every edge")
        n = np.concatenate([a, b])
        m = np.concatenate([b, a])
        pid = (_mix64(n.astype(np.uint64)) % P).astype(np.int64)
        return pa.table(
            {"_pid": pa.array(pid), "n": pa.array(n), "m": pa.array(m)}
        )

    wedge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def _wedges(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(["n", "m"], kind="stable")
        n = df["n"].to_numpy()
        m = df["m"].to_numpy()
        sizes = pd.Series(n).groupby(n, sort=False).size().to_numpy()
        if max_degree is not None and (sizes > max_degree).any():
            keep = np.repeat(sizes <= max_degree, sizes)
            n, m = n[keep], m[keep]
            sizes = sizes[sizes <= max_degree]
        starts = np.cumsum(sizes) - sizes
        idx_in = np.arange(len(n)) - np.repeat(starts, sizes)
        rep = (np.repeat(sizes, sizes) - idx_in - 1).astype(np.int64)
        total = int(rep.sum())
        if total == 0:
            return wedge_schema.empty_table()
        i1 = np.repeat(np.arange(len(n)), rep)
        excl = np.cumsum(rep) - rep
        rank = np.arange(total) - np.repeat(excl, rep)
        i2 = i1 + 1 + rank
        # neighbors sorted ascending within each center: m[i1] < m[i2]
        return pa.table({"u": pa.array(m[i1]), "v": pa.array(m[i2])})

    sym = edges.map_batches(_sym, batch_format="pyarrow")
    wedges = sorted_partition_apply(
        sym.repartition(nparts), "_pid", _wedges, wedge_schema
    )

    edge_tbl = edges.map_batches(
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
    cn_schema = pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("cn", pa.int64())]
    )

    def _count_anti(wdf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        if len(wdf) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in ("u", "v", "cn")}
            )
        cn = (
            wdf.groupby(["u", "v"], sort=False).size().rename("cn").reset_index()
        )
        if len(edf):
            m = cn.merge(
                edf.drop_duplicates(),
                left_on=["u", "v"],
                right_on=["a", "b"],
                how="left",
                indicator=True,
            )
            cn = m[m["_merge"] == "left_only"][["u", "v", "cn"]]
        return cn.astype(np.int64)

    cand = shuffle_merge(
        wedges,
        edge_tbl,
        ["u", "v"],
        ["a", "b"],
        _count_anti,
        cn_schema,
        num_partitions=num_partitions,
        left_schema=wedge_schema,
        right_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
        # consumed by another shuffle_merge whose tagger skips empties —
        # a 0-row anchor block would only re-fire the schema warning there
        anchor=False,
    )

    @skip_empty
    def _deg_partial(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False)
        b = t.column(b_col).to_numpy(zero_copy_only=False)
        vc = pd.Series(np.concatenate([a, b])).value_counts()
        return pa.table(
            {
                "node": pa.array(vc.index.to_numpy(np.int64)),
                "d": pa.array(vc.to_numpy(np.int64)),
            }
        )

    deg = (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
    )
    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    u_schema = pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("cn", pa.int64()),
         ("deg_u", pa.int64())]
    )

    def _attach_u(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        out = ldf.merge(rdf, left_on="u", right_on="node", how="inner")
        out = out.rename(columns={"deg": "deg_u"})
        return out[["u", "v", "cn", "deg_u"]]

    with_u = shuffle_merge(
        cand, deg, ["u"], ["node"], _attach_u, u_schema,
        num_partitions=num_partitions,
        left_schema=cn_schema, right_schema=deg_schema,
        anchor=False,
    )

    out_schema = pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("cn", pa.int64()),
         ("pa_score", pa.int64())]
    )

    def _attach_v(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        out = ldf.merge(rdf, left_on="v", right_on="node", how="inner")
        out["pa_score"] = out["deg_u"] * out["deg"]
        return out[["u", "v", "cn", "pa_score"]]

    return shuffle_merge(
        with_u, deg, ["v"], ["node"], _attach_v, out_schema,
        num_partitions=num_partitions,
        left_schema=u_schema, right_schema=deg_schema,
    )
