"""Blocking, hot-key tiling, and candidate-pair generation
(SURVEY.md §2.4 J1/J2 — the scale-critical shuffle).

The reference loops over blocks serially, materializing one dense |A|×|B|
similarity matrix per block (``R/fuzzylink.R:113-155``,
``R/get_similarity_matrix.R:38``) and melting it into a long pair table. A
hot blocking key makes that quadratic in one process.

Here pair generation is a Ray Data shuffle keyed on ``(block, ta, tb)``:

* J1 blocking semi-join — the distinct A-side block keys are broadcast via
  ``ray.put`` and B rows filtered inside ``map_batches`` (no shuffle;
  reference: ``inner_join`` at R/fuzzylink.R:78-86).
* hot-key salting/tiling — each block's distinct A keys are split into
  ``Ta = ceil(nA / tile_rows)`` tiles by key hash and B keys into ``Tb``
  tiles; A rows are replicated across the Tb B-tiles and B rows across the
  Ta A-tiles, so every group holds at most ``2*tile_rows`` keys and emits at
  most ``tile_rows**2`` pairs. A pathological block becomes Ta×Tb bounded
  groups instead of one quadratic task; pair-count per tile is bounded by
  construction, never silently truncated.
* per-tile similarity — ``groupby(block, ta, tb).map_groups``: the group's
  A/B embedding FixedSizeList columns are viewed as numpy matrices and
  multiplied (`A @ B.T`, unit vectors ⇒ cosine), emitting the pair rows
  ``(block, key_a, key_b, sim)``. The full pair set is never materialized in
  one place — it streams out of the groupby under backpressure.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count

from raylink.embed import embeddings_to_numpy
from raylink.features import pair_features_batch


def stable_hash(s: str) -> int:
    return zlib.crc32(s.encode())


def distinct_keys(ds: ray.data.Dataset, by: str) -> ray.data.Dataset:
    """Distinct ``(key, block)`` rows (SURVEY.md A1/A2 analogue: the unit of
    embedding and pairing is the distinct string within its block,
    R/fuzzylink.R:150-151). groupby-based so it scales as a shuffle."""
    out = (
        ds.select_columns([by, "block"])
        .groupby([by, "block"])
        .aggregate(Count())
        .select_columns([by, "block"])
    )
    if by != "key":
        out = out.rename_columns({by: "key"})
    return out


def a_side_block_set(keys_a: ray.data.Dataset) -> pa.Array:
    """Distinct A-side block keys as a sorted Arrow array, collected to the
    driver. Block-key cardinality is assumed ≪ row count (the blocking
    design contract); the array is broadcast once via ``ray.put`` and used
    zero-copy by every semi-join task (built here ONCE, not per batch)."""
    tbl = keys_a.select_columns(["block"]).groupby("block").aggregate(Count())
    return pa.array(sorted(tbl.to_pandas()["block"].tolist()))


def semi_join_blocks(
    ds: ray.data.Dataset, blocks_ref: "ray.ObjectRef"
) -> ray.data.Dataset:
    """J1: keep rows whose block key occurs in the broadcast A-side array."""

    # Stateless task (not an actor pool): elastic, no pinned CPU slot.
    # ray.get on the broadcast ref is a zero-copy plasma read per task.
    def _filter(batch: pa.Table) -> pa.Table:
        value_set: pa.Array = ray.get(blocks_ref)
        mask = pc.is_in(batch.column("block"), value_set=value_set)
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def block_histograms(
    keys_a: ray.data.Dataset, keys_b: ray.data.Dataset
) -> tuple[dict[str, int], dict[str, int]]:
    """Per-block distinct-key counts for both sides — the single pair of
    small driver-side aggregates everything else (tile plan, exact pair
    count, skew report) derives from."""
    ca = keys_a.groupby("block").aggregate(Count(alias_name="n")).to_pandas()
    cb = keys_b.groupby("block").aggregate(Count(alias_name="n")).to_pandas()
    na = {b: int(n) for b, n in zip(ca["block"], ca["n"])}
    nb = {b: int(n) for b, n in zip(cb["block"], cb["n"])}
    return na, nb


def tile_plan_from_hist(
    na: dict[str, int], nb: dict[str, int], tile_rows: int
) -> dict[str, tuple[int, int]]:
    """Per-block (Ta, Tb) tile counts (the explicit skew plan of
    SURVEY.md §4). Blocks missing on either side are excluded (they can emit
    no pairs; the reference skips them via the NA sentinel,
    R/fuzzylink.R:137-141)."""
    plan = {}
    for blk in set(na) & set(nb):
        ta = -(-na[blk] // tile_rows)
        tb = -(-nb[blk] // tile_rows)
        plan[blk] = (ta, tb)
    return plan


def pair_count_from_hist(na: dict[str, int], nb: dict[str, int]) -> int:
    """Exact candidate-pair count Σ_block |A_b|·|B_b| (no materialization)."""
    return int(sum(na[b] * nb[b] for b in set(na) & set(nb)))


def tile_plan(
    keys_a: ray.data.Dataset, keys_b: ray.data.Dataset, tile_rows: int
) -> dict[str, tuple[int, int]]:
    na, nb = block_histograms(keys_a, keys_b)
    return tile_plan_from_hist(na, nb, tile_rows)


def _want_sort_blocks(plan: dict) -> int:
    """Target input-block count for the pair-gen groupby sort.

    The sort shuffle behind groupby sizes its output partitioning from the
    input block count; tile-size skew makes coarse partitions straggle,
    while fine partitions multiply per-task scheduling cost. Measured sweep
    at 16 CPUs, sf0.1 r256 (same accepted count, same host window):
    4 blocks/CPU → 42.5s, 8 → 37.3s, 16 → 50.9s, 32 → 71.8s. 8/CPU is the
    sweet spot even though the max fused task runs ~3× the mean — the tail
    loss is smaller than the task-overhead slope on this host."""
    try:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n_cpus = 8
    total_groups = sum(ta * tb for ta, tb in plan.values()) or 1
    try:
        per_cpu = max(1, int(os.environ.get("GRAFT_BLOCKS_PER_CPU", "8")))
    except ValueError:
        raise ValueError(
            "GRAFT_BLOCKS_PER_CPU must be a positive integer, got "
            f"{os.environ.get('GRAFT_BLOCKS_PER_CPU')!r}"
        ) from None
    return min(max(per_cpu * n_cpus, 16), max(total_groups, 16))


def _presplit_side(
    ds: ray.data.Dataset, want_half: int
) -> tuple[ray.data.Dataset, bool]:
    """Split an under-partitioned side table BEFORE tile expansion.

    Expansion is a map stage, so block count is preserved through it: giving
    the slim pre-expansion rows enough blocks means the groupby sort already
    sees a well-partitioned input and the post-expansion repartition barrier
    (a second all-to-all over the tiles-replicated rows) is never inserted.
    Returns (dataset, guaranteed) — guaranteed=False when the lazy block
    count is unknowable and the caller must keep the post-expansion net.
    ``GRAFT_PRESPLIT=0`` forces the legacy post-expansion repartition."""
    if os.environ.get("GRAFT_PRESPLIT", "1") == "0":
        return ds, False
    exact = True
    try:
        have = ds.num_blocks()
    except Exception:
        # lazy lineage: num_blocks() raises NotImplementedError. The plan's
        # initial block count is only a HINT here — upstream filters or
        # all-to-alls can leave fewer real blocks than the plan metadata
        # claims (ADVICE r3), so it must never justify skipping the split.
        exact = False
        try:
            have = ds._plan.initial_num_blocks()
        except Exception:
            return ds, False
    if have is None:
        return ds, False
    if exact and have >= want_half:
        return ds, True
    # Hint-based (or exact-but-low) count: repartition the SLIM
    # pre-expansion rows. Over-partitioning N slim rows costs one cheap
    # exchange; trusting an inflated hint serializes the pair-gen sort.
    return ds.repartition(want_half), True


def _spread_blocks(both: ray.data.Dataset, plan: dict) -> ray.data.Dataset:
    """Post-expansion safety net: repartition the EXPANDED rows only when
    the pre-expansion split could not be applied (unknown lazy block count).
    Prefer :func:`_presplit_side` — it moves the same barrier before the
    tile replication, shuffling N rows instead of N×tiles."""
    want = _want_sort_blocks(plan)
    try:
        have = both.num_blocks()
    except Exception:
        have = 0
    if have and have >= want:
        return both
    return both.repartition(want)


def _plan_with_bases(plan: dict) -> dict:
    """Augment a tile plan with a dense tile-group id base per block:
    ``gid = base[block] + ta * tb_n + tb`` enumerates every (block, ta, tb)
    tile with a single int64 — the groupby sorts ONE integer column
    instead of a (string, int, int) composite, which is the dominant
    compare/sample cost of the pair-gen all-to-all."""
    out, acc = {}, 0
    for b in sorted(plan):
        ta, tb = plan[b]
        out[b] = (ta, tb, acc)
        acc += max(ta, 1) * max(tb, 1)
    return out


# Per-row (encode) vs per-pair (matmul + pruned JW) cost ratio of the fused
# tile kernel, from the r3 profile (BASELINE.md): ~150 core-s of in-tile
# encode over ~8M tile rows (~19 µs/row) vs ~45 core-s of JW+matmul over
# 375M candidate pairs (~0.12 µs/pair). Only the RATIO matters for packing.
_ROW_COST = 160.0


def _pack_boundaries(
    plan_b: dict, na: dict, nb: dict, n_bins: int
) -> list[int]:
    """Equal-COST contiguous partition boundaries in tile-group-id space.

    Ray's sampled sort boundaries equalize ROWS per partition, but the fused
    kernel's cost per tile is ``pairs + _ROW_COST × rows`` — partial tiles
    (blocks whose side count just crosses a tile_rows multiple) carry ~4×
    less pair mass per row than full tiles, so equal-row partitions straggle
    (measured at 16 CPUs r256: max fused task 10.2s vs 3.9s mean, 2.6×).
    Expected per-tile cost is known exactly from the block histograms (key
    ownership is a uniform hash, so a block's rows spread ~evenly over its
    tile axis): cut the gid axis where the cost cumsum crosses multiples of
    total/n_bins.

    Contiguity is load-bearing, not a simplification: a key's replicas sit
    at CONSECUTIVE gids (a-side; stride tb_n for b-side within one block's
    range), so contiguous ranges keep every replica of a key in ONE task
    and the per-worker encode/JW memo caches hot. A first implementation
    that LPT-scattered individual tiles across bins balanced cost perfectly
    but re-encoded every key per tile — measured 3-4× MORE core-s than the
    row-balanced fallback (1,950 vs 420-840 core-s at 16 CPUs r256).

    Driver cost: one O(T) pass over T tiles (~4M at 10¹²-pair scale).
    Returns strictly-increasing gid cutpoints (may be fewer than n_bins-1
    when a single hot tile exceeds the per-bin budget — a tile is the
    unsplittable unit either way).
    """
    total = sum(max(ta, 1) * max(tb, 1) for ta, tb, _ in plan_b.values())
    cost = np.empty(total, dtype=np.float64)
    for b, (ta, tb, base) in plan_b.items():
        ta_, tb_ = max(ta, 1), max(tb, 1)
        ma = na.get(b, 0) / ta_
        mb = nb.get(b, 0) / tb_
        cost[base : base + ta_ * tb_] = ma * mb + _ROW_COST * (ma + mb)
    cum = np.cumsum(cost)
    if total < 2 or cum[-1] <= 0:
        return []
    targets = cum[-1] * np.arange(1, n_bins) / n_bins
    cuts = np.unique(np.searchsorted(cum, targets, side="left") + 1)
    return [int(c) for c in cuts if 0 < c < total]


def _plan_and_cuts(
    keys_a: ray.data.Dataset,
    keys_b: ray.data.Dataset,
    tile_rows: int,
    plan: dict | None,
    hist: "tuple[dict, dict] | None",
) -> tuple[dict, int, "list[int] | None"]:
    """Shared pair-generator setup: resolve the tile plan (computing the
    block histograms when none was given), the target sort-partition
    count, and the cost-equalized packing cuts (None → row-sampled
    groupby fallback; ``GRAFT_PACK=0`` forces it)."""
    if plan is None:
        hist = block_histograms(keys_a, keys_b)
        plan = tile_plan_from_hist(hist[0], hist[1], tile_rows)
    plan_b = _plan_with_bases(plan)
    want = _want_sort_blocks(plan)
    cuts = (
        _pack_boundaries(plan_b, hist[0], hist[1], want)
        if hist is not None and os.environ.get("GRAFT_PACK", "1") != "0"
        else None
    )
    return plan_b, want, cuts


def _tile_group_apply(
    both: ray.data.Dataset,
    tile_fn,
    out_schema: pa.Schema,
    cuts: "list[int] | None",
) -> ray.data.Dataset:
    """Route expanded (side, gid) rows to per-tile kernel calls.

    Packed path (``cuts`` present): ONE range exchange with EXPLICIT
    cost-equalized boundaries — ``sort('gid', boundaries=cuts)`` — then a
    single task per partition slices its (already gid-sorted) rows per gid
    and runs ``tile_fn`` on each whole tile. Every output — including an
    empty partition's — is ``out_schema``-typed, so the executor never sees
    schema-less blocks (the sorted_partition_apply discipline).

    Fallback (no histograms, or nothing to cut): Ray's sort-based
    ``groupby(gid).map_groups`` — same tile semantics, row-sampled
    partitions. ``GRAFT_PACK=0`` forces this path for A/B runs.
    """
    if not cuts:
        return both.groupby("gid").map_groups(tile_fn, batch_format="pyarrow")

    def _part(tbl: pa.Table):
        if tbl.num_rows == 0:
            yield out_schema.empty_table()
            return
        g = tbl.column("gid").to_numpy()
        bounds = np.flatnonzero(np.diff(g)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(g)]])
        # yield per tile, never concat: a cost-equalized partition holds
        # ~total_pairs/n_bins output rows — one concatenated table would
        # pin that whole slice in the task heap, where per-tile yields let
        # Ray assemble right-sized output blocks under backpressure
        any_rows = False
        for s, e in zip(starts, ends):
            out = tile_fn(tbl.slice(int(s), int(e - s)))
            if out.num_rows:
                any_rows = True
                yield out
        if not any_rows:
            # typed empty instead of a schema-less zero-yield bundle
            yield out_schema.empty_table()

    return both.sort("gid", boundaries=cuts).map_batches(
        _part, batch_size=None, batch_format="pyarrow"
    )


def _expand_side(
    ds: ray.data.Dataset,
    plan_ref: "ray.ObjectRef",
    side: str,
    encode_dim: int | None = None,
) -> ray.data.Dataset:
    """Tag rows with (side, gid), replicating across the other side's
    tile axis. Input: distinct (key, block, embedding) rows; ``plan_ref``
    holds the base-augmented plan from :func:`_plan_with_bases`.

    The shuffled row is deliberately slim: one int64 tile-group id and an
    int8 side flag ride along with the payload columns — no composite
    (block, ta, tb) string key ever reaches the sort.

    ``encode_dim``: encode each key's embedding HERE, pre-replication, and
    let the ``take`` replicate the bytes. Each raw row is encoded exactly
    once across the whole run (vs once per tile copy per worker for the
    in-tile path) at the cost of shipping dim×4 B per expanded row through
    the sort — the right side of the trade whenever encode cost ≫ shuffle
    bandwidth (profiled: the in-tile encode was ~430 core-s of the 32-CPU
    headline run vs ~2 GB of extra shuffle ≈ 1-2 s)."""

    # Stateless task stage; the tile plan is a broadcast zero-copy read.
    # Fully vectorized: the replication across the other side's tile axis is
    # np.repeat/cumsum index arithmetic, not a per-row Python loop (rows in
    # blocks absent from the plan get rep=0 and vanish from np.repeat).
    def _expand(batch: pa.Table) -> pa.Table:
        plan: dict[str, tuple[int, int, int]] = ray.get(plan_ref)
        keys = batch.column("key").to_pylist()
        if encode_dim is not None and "embedding" not in batch.column_names:
            from raylink.embed import matrix_to_arrow, worker_embedder

            we = worker_embedder(encode_dim)
            batch = batch.append_column(
                "embedding", matrix_to_arrow(we.encode_many(keys))
            )
        blocks = batch.column("block").to_pylist()
        n = len(keys)
        _z = (0, 0, 0)
        # probe the plan once per DISTINCT block in the batch (factorize +
        # LUT gather), not once per row — block cardinality ≪ rows
        codes, uniq = pd.factorize(np.asarray(blocks, dtype=object))
        lut = (
            np.array([plan.get(b, _z) for b in uniq], dtype=np.int64).reshape(-1, 3)
            if len(uniq)
            else np.zeros((0, 3), dtype=np.int64)
        )
        tiles = lut[codes] if n else np.zeros((0, 3), dtype=np.int64)
        ta_n, tb_n, base = tiles[:, 0], tiles[:, 1], tiles[:, 2]
        # vectorized deterministic key hash (PYTHONHASHSEED-independent);
        # tile ownership only needs a stable uniform hash, and the pair
        # coverage is invariant to which tile owns a key
        h = pd.util.hash_array(np.asarray(keys, dtype=object))
        if side == "a":
            own = (h % np.maximum(ta_n, 1).astype(np.uint64)).astype(np.int64)
            rep = tb_n
        else:
            own = (h % np.maximum(tb_n, 1).astype(np.uint64)).astype(np.int64)
            rep = ta_n
        take_idx = np.repeat(np.arange(n, dtype=np.int64), rep)
        own_rep = np.repeat(own, rep)
        ends = np.cumsum(rep)
        total = int(ends[-1]) if n else 0
        other = np.arange(total, dtype=np.int64) - np.repeat(ends - rep, rep)
        tas = own_rep if side == "a" else other
        tbs = other if side == "a" else own_rep
        gid = np.repeat(base, rep) + tas * np.repeat(tb_n, rep) + tbs
        out = batch.take(pa.array(take_idx, type=pa.int64()))
        out = out.append_column("gid", pa.array(gid.astype(np.int64)))
        out = out.append_column(
            "side",
            pa.array(
                np.full(total, 0 if side == "a" else 1, dtype=np.int8),
                type=pa.int8(),
            ),
        )
        return out

    return ds.map_batches(_expand, batch_format="pyarrow")


_EMPTY: dict = {}

_PAIR_SCHEMA = pa.schema(
    [
        ("block", pa.string()),
        ("key_a", pa.string()),
        ("key_b", pa.string()),
        ("sim", pa.float64()),
    ]
)


def _empty_pairs() -> pa.Table:
    return _PAIR_SCHEMA.empty_table()


def generate_pairs(
    keys_emb_a: ray.data.Dataset,
    keys_emb_b: ray.data.Dataset,
    dim: int,
    tile_rows: int,
    sim_floor: float | None = None,
    plan: dict | None = None,
    hist: tuple[dict, dict] | None = None,
) -> ray.data.Dataset:
    """J2: within-block cross product with cosine similarity, tiled.

    Inputs are the per-side distinct ``(key, block, embedding)`` datasets.
    Output streams ``(block, key_a, key_b, sim)`` pair rows.
    ``hist``: the per-side block histograms the plan was derived from;
    enables size-aware LPT tile packing (computed here when plan is None).
    """
    plan_b, want, cuts = _plan_and_cuts(
        keys_emb_a, keys_emb_b, tile_rows, plan, hist
    )
    plan_ref = ray.put(plan_b)

    want_half = -(-want // 2)
    keys_emb_a, ok_a = _presplit_side(keys_emb_a, want_half)
    keys_emb_b, ok_b = _presplit_side(keys_emb_b, want_half)
    ea = _expand_side(keys_emb_a, plan_ref, "a")
    eb = _expand_side(keys_emb_b, plan_ref, "b")
    both = ea.union(eb)
    if not (ok_a and ok_b):
        both = _spread_blocks(both, plan)

    def _pairgen(group: pa.Table) -> pa.Table:
        side = group.column("side")
        mask_a = pc.equal(side, 0)
        ga = group.filter(mask_a)
        gb = group.filter(pc.invert(mask_a))
        if len(ga) == 0 or len(gb) == 0:
            return _empty_pairs()
        emb_a = embeddings_to_numpy(ga.column("embedding"), dim)
        emb_b = embeddings_to_numpy(gb.column("embedding"), dim)
        sims = (emb_a.astype(np.float32) @ emb_b.astype(np.float32).T).astype(
            np.float64
        )
        na, nb = len(ga), len(gb)
        ai = np.repeat(np.arange(na), nb)
        bi = np.tile(np.arange(nb), na)
        simf = sims.reshape(-1)
        if sim_floor is not None:
            keep = simf >= sim_floor
            ai, bi, simf = ai[keep], bi[keep], simf[keep]
        key_a = ga.column("key").take(pa.array(ai, type=pa.int64()))
        key_b = gb.column("key").take(pa.array(bi, type=pa.int64()))
        block = ga.column("block").take(
            pa.array(np.zeros(len(ai), dtype=np.int64))
        )
        return pa.table(
            {
                "block": block.combine_chunks() if isinstance(block, pa.ChunkedArray) else block,
                "key_a": key_a.combine_chunks() if isinstance(key_a, pa.ChunkedArray) else key_a,
                "key_b": key_b.combine_chunks() if isinstance(key_b, pa.ChunkedArray) else key_b,
                "sim": pa.array(simf, type=pa.float64()),
            },
            schema=_PAIR_SCHEMA,
        )

    return _tile_group_apply(both, _pairgen, _PAIR_SCHEMA, cuts)


def generate_scored_pairs(
    keys_emb_a: ray.data.Dataset,
    keys_emb_b: ray.data.Dataset,
    dim: int,
    tile_rows: int,
    model_state: dict,
    cutoff: float,
    labels: dict | None = None,
    emit: str = "accepted",
    plan: dict | None = None,
    embed_in_tile: bool = False,
    embed_in_expand: bool = False,
    dedup_in_tile: bool = False,
    sim_floor: float | None = None,
    jw_counter=None,
    hist: tuple[dict, dict] | None = None,
) -> ray.data.Dataset:
    """Fused tile stage: pair-gen + lexical features + scoring + acceptance
    in ONE ``map_groups`` task per tile.

    This is the production wide path: at 10¹²-file scale the intermediate
    pair stream (≈70 B/pair) must never hit the object store between
    stages — each tile computes its cosine matmul, index-expanded
    Jaro-Winkler (``jw_cross``: each side encoded once per tile), the
    broadcast-model probability and the acceptance predicate in-core, and
    emits only the surviving rows (``emit='accepted'``) or the full scored
    tile (``emit='all'``, reference ``return_all_pairs`` semantics).
    The unfused ``generate_pairs`` → ``add_pair_features`` →
    ``score_pairs`` composition remains for the label-loop phase, which
    needs the whole slim pair table anyway.
    """
    from raylink.features import jw_cross
    from raylink.learner import predict_from_state

    plan_b, want, cuts = _plan_and_cuts(
        keys_emb_a, keys_emb_b, tile_rows, plan, hist
    )
    plan_ref = ray.put(plan_b)
    state_ref = ray.put(model_state)
    # labels pre-grouped by A key: tiles probe their own ~tile_rows keys
    # instead of scanning the whole label map
    labels_by_a: dict[str, dict[str, str]] = {}
    for (a, b), lab in (labels or {}).items():
        labels_by_a.setdefault(a, {})[b] = lab
    labels_ref = ray.put(labels_by_a)

    if embed_in_expand and embed_in_tile:
        raise ValueError("embed_in_expand and embed_in_tile are exclusive")
    enc_dim = dim if embed_in_expand else None
    want_half = -(-want // 2)
    keys_emb_a, ok_a = _presplit_side(keys_emb_a, want_half)
    keys_emb_b, ok_b = _presplit_side(keys_emb_b, want_half)
    ea = _expand_side(keys_emb_a, plan_ref, "a", encode_dim=enc_dim)
    eb = _expand_side(keys_emb_b, plan_ref, "b", encode_dim=enc_dim)
    both = ea.union(eb)
    if not (ok_a and ok_b):
        both = _spread_blocks(both, plan)

    out_schema = pa.schema(
        [
            ("block", pa.string()),
            ("key_a", pa.string()),
            ("key_b", pa.string()),
            ("sim", pa.float64()),
            ("jw", pa.float64()),
            ("exact", pa.bool_()),
            ("match", pa.string()),
            ("match_probability", pa.float64()),
        ]
    )

    def _fused(group: pa.Table) -> pa.Table:
        side = group.column("side")
        mask_a = pc.equal(side, 0)
        ga = group.filter(mask_a)
        gb = group.filter(pc.invert(mask_a))
        if len(ga) == 0 or len(gb) == 0:
            return out_schema.empty_table()
        if dedup_in_tile:
            # raw (possibly duplicated) corpus rows: tile assignment is by
            # key hash, so all copies of a (key, block) land here — dedup
            # locally instead of paying a global distinct shuffle upstream
            for which in ("a", "b"):
                g = ga if which == "a" else gb
                _, first = np.unique(
                    np.asarray(g.column("key").to_pylist(), dtype=object),
                    return_index=True,
                )
                if len(first) < len(g):
                    g = g.take(pa.array(np.sort(first)))
                    if which == "a":
                        ga = g
                    else:
                        gb = g
        state = ray.get(state_ref)
        label_map: dict[str, dict[str, str]] = ray.get(labels_ref)
        keys_a = ga.column("key").to_pylist()
        keys_b = gb.column("key").to_pylist()
        if embed_in_tile:
            from raylink.embed import worker_embedder

            we = worker_embedder(dim)
            emb_a = we.encode_many(keys_a)
            emb_b = we.encode_many(keys_b)
        else:
            emb_a = embeddings_to_numpy(ga.column("embedding"), dim)
            emb_b = embeddings_to_numpy(gb.column("embedding"), dim)
        sims = emb_a @ emb_b.T  # float32, (na, nb)
        na, nb = len(ga), len(gb)
        low_a = [k.lower() for k in keys_a]
        low_b = [k.lower() for k in keys_b]
        arr_a = np.asarray(keys_a, dtype=object)
        arr_b = np.asarray(keys_b, dtype=object)

        prune = emit == "accepted" and state.get("kind") == "glm"
        if prune:
            # Exact branch-and-bound on the monotone glm: with jw pinned at
            # its most favorable value, σ(b0 + bs·sim + bj·jw*) upper-bounds
            # match_probability, which translates to a scalar similarity
            # threshold — applied directly on the (na, nb) similarity
            # matrix, so the full cross-product index arrays are never
            # built. Labeled/exact pairs are force-included, keeping the
            # accepted set bit-identical to the unpruned path.
            import math

            coef = [float(c) for c in state["coef"]]
            jw_star = 1.0 if coef[2] >= 0 else 0.0
            thr = (
                math.log(cutoff / (1.0 - cutoff)) if 0.0 < cutoff < 1.0 else -math.inf
            )
            # The unpruned path decides on float64(sim); rounding the float64
            # threshold to float32 could round *toward* the data and drop a
            # boundary pair. Nudge the float32 compare value one ulp outward
            # so the pruned candidate set is a superset of the exact one.
            if coef[1] > 0:
                sim_thr = (thr - coef[0] - coef[2] * jw_star) / coef[1]
                cand = sims > np.nextafter(
                    np.float32(sim_thr), np.float32(-np.inf)
                )
            elif coef[1] < 0:
                sim_thr = (thr - coef[0] - coef[2] * jw_star) / coef[1]
                cand = sims < np.nextafter(
                    np.float32(sim_thr), np.float32(np.inf)
                )
            else:
                cand = np.full(
                    (na, nb), coef[0] + coef[2] * jw_star > thr, dtype=bool
                )
            # exact pairs and labeled pairs must always be evaluated
            a_index = {k: i for i, k in enumerate(keys_a)}
            b_index = {k: j for j, k in enumerate(keys_b)}
            for k, i in a_index.items():
                j = b_index.get(k)
                if j is not None:
                    cand[i, j] = True
            if label_map:
                for a, i in a_index.items():
                    bs = label_map.get(a)
                    if not bs:
                        continue
                    for b in bs:
                        j = b_index.get(b)
                        if j is not None:
                            cand[i, j] = True
            ai, bi = np.nonzero(cand)
            simf = sims[ai, bi].astype(np.float64)
        else:
            ai = np.repeat(np.arange(na), nb)
            bi = np.tile(np.arange(nb), na)
            simf = sims.reshape(-1).astype(np.float64)

        if sim_floor is not None:
            # same semantics as generate_pairs: the floor drops pairs
            # unconditionally (even exact/labeled), compared in float64
            fkeep = simf >= sim_floor
            ai, bi, simf = ai[fkeep], bi[fkeep], simf[fkeep]

        if jw_counter is not None:
            # fire-and-forget tally of pairs whose JW is actually computed
            # (pruned pairs are skipped by the exact branch-and-bound); the
            # bench reports this beside the raw candidate count so
            # "scored pairs/s" is an honest metric (VERDICT r1 #10)
            jw_counter.add.remote(len(ai))

        jw = jw_cross(low_a, low_b, ai, bi)
        X = np.column_stack([simf, jw])
        probs = predict_from_state(state, X)
        exact = arr_a[ai] == arr_b[bi]
        probs = np.where(exact, 1.0, probs)
        if label_map:
            match = np.asarray(
                [
                    "Yes" if e else label_map.get(a, _EMPTY).get(b)
                    for a, b, e in zip(arr_a[ai], arr_b[bi], exact)
                ],
                dtype=object,
            )
            labeled_yes = match == "Yes"
            unlabeled = np.asarray([m is None for m in match])
        else:
            match = np.where(exact, "Yes", None)
            labeled_yes = exact
            unlabeled = ~exact
        if emit == "accepted":
            keep = labeled_yes | (unlabeled & (probs > cutoff))
        else:
            keep = np.ones(len(ai), dtype=bool)
        ai, bi = ai[keep], bi[keep]
        return pa.table(
            {
                "block": ga.column("block").take(pa.array(np.zeros(len(ai), dtype=np.int64))),
                "key_a": pa.array(arr_a[ai], type=pa.string()),
                "key_b": pa.array(arr_b[bi], type=pa.string()),
                "sim": pa.array(simf[keep]),
                "jw": pa.array(jw[keep]),
                "exact": pa.array(exact[keep]),
                "match": pa.array(match[keep], type=pa.string()),
                "match_probability": pa.array(probs[keep]),
            },
            schema=out_schema,
        )

    return _tile_group_apply(both, _fused, out_schema, cuts)


def add_pair_features(
    pairs: ray.data.Dataset, full: bool = False
) -> ray.data.Dataset:
    """B-FEATURES (M3/M4 + F1-F7): append ``jw`` (and, for the forest
    learner, the six extra stringdist features, R/fuzzylink.R:179-186) and
    the canonical ``exact`` flag (A == B on the *original* strings,
    R/fuzzylink.R:193). Stateless vectorized map_batches; kernels memoize
    per distinct lowercased pair inside the worker."""

    def _feat(batch: pa.Table) -> pa.Table:
        ka = np.asarray(batch.column("key_a").to_pylist(), dtype=object)
        kb = np.asarray(batch.column("key_b").to_pylist(), dtype=object)
        feats = pair_features_batch(ka, kb, full=full)
        for name, arr in feats.items():
            batch = batch.append_column(name, pa.array(arr, type=pa.float64()))
        exact = pc.equal(batch.column("key_a"), batch.column("key_b"))
        return batch.append_column("exact", exact)

    # big batches: the vectorized jw kernel amortizes its per-op numpy
    # overhead over ~16k pairs at a time
    return pairs.map_batches(_feat, batch_format="pyarrow", batch_size=16384)
