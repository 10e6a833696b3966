"""Pair generation: tiling must emit exactly the within-block cross product
of distinct keys — once — regardless of tile size (hot-key salting path)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raylink.block import add_pair_features, distinct_keys, generate_pairs, tile_plan
from raylink.embed import HashedNgramEmbedder
from raylink.schema import add_block_key


def _keyed(rows, blocking):
    ds = rd.from_arrow(pa.table(rows))
    ds = add_block_key(ds, blocking)
    return distinct_keys(ds, "key")


def _embed(ds, dim=32):
    return ds.map_batches(
        HashedNgramEmbedder,
        fn_constructor_kwargs={"dim": dim, "text_col": "key"},
        batch_format="pyarrow",
        concurrency=(1, 2),  # autoscaling pool: min 1 actor so a 4-CPU test
        # session running two embed pools + sort + map tasks can't starve
    )


@pytest.mark.parametrize("tile_rows", [2, 3, 1024])
def test_pairs_complete_and_unique(tile_rows):
    rows_a = {
        "key": ["a1", "a2", "a3", "a4", "x"],
        "lang": ["py", "py", "py", "c", "go"],
    }
    rows_b = {
        "key": ["b1", "b2", "b3", "x", "y"],
        "lang": ["py", "py", "c", "c", "rb"],
    }
    ka = _keyed(rows_a, ["lang"])
    kb = _keyed(rows_b, ["lang"])
    pairs = generate_pairs(_embed(ka), _embed(kb), 32, tile_rows).to_pandas()

    expected = set()
    for i, (k, l) in enumerate(zip(rows_a["key"], rows_a["lang"])):
        for j, (k2, l2) in enumerate(zip(rows_b["key"], rows_b["lang"])):
            if l == l2:
                expected.add((l, k, k2))
    got = set(zip(pairs["block"], pairs["key_a"], pairs["key_b"]))
    assert got == expected
    assert len(pairs) == len(got)  # no duplicates


def test_pair_sim_is_cosine():
    ka = _keyed({"key": ["string_utils"], "lang": ["py"]}, ["lang"])
    kb = _keyed({"key": ["str_utils", "zebra"], "lang": ["py", "py"]}, ["lang"])
    pairs = generate_pairs(_embed(ka), _embed(kb), 32, 1024).to_pandas()
    emb = HashedNgramEmbedder(dim=32)
    for _, r in pairs.iterrows():
        expect = float(
            emb.encode_one(r["key_a"]).astype(np.float32)
            @ emb.encode_one(r["key_b"]).astype(np.float32)
        )
        assert r["sim"] == pytest.approx(expect, abs=1e-5)


def test_tile_plan_skips_single_sided_blocks():
    ka = _keyed({"key": ["a"], "lang": ["py"]}, ["lang"])
    kb = _keyed({"key": ["b"], "lang": ["c"]}, ["lang"])
    plan = tile_plan(ka, kb, 1024)
    assert plan == {}


def test_tile_plan_splits_hot_block():
    n = 50
    ka = _keyed({"key": [f"a{i}" for i in range(n)], "lang": ["py"] * n}, ["lang"])
    kb = _keyed({"key": [f"b{i}" for i in range(n)], "lang": ["py"] * n}, ["lang"])
    plan = tile_plan(ka, kb, 10)
    assert plan["py"] == (5, 5)


def test_sim_floor_prunes():
    ka = _keyed({"key": ["string_utils"], "lang": ["py"]}, ["lang"])
    kb = _keyed(
        {"key": ["string_utils", "qqwwzz"], "lang": ["py", "py"]}, ["lang"]
    )
    pairs = generate_pairs(_embed(ka), _embed(kb), 32, 1024, sim_floor=0.9).to_pandas()
    assert list(pairs["key_b"]) == ["string_utils"]


@pytest.mark.parametrize("with_labels", [False, True])
def test_fused_path_matches_unfused(with_labels):
    """generate_scored_pairs(emit='accepted') must equal
    accept_filter(score_pairs(add_pair_features(generate_pairs(...)))) —
    including labeled pairs, exact pairs, and the glm branch-and-bound
    prune (ADVICE r1: the fused production path was untested)."""
    import ray

    from raylink.block import generate_scored_pairs
    from raylink.link import accept_filter, score_pairs

    n = 40
    keys_a = [f"module_{i:02d}" for i in range(n)] + ["exact_hit"]
    keys_b = [f"module_{i:02d}x" for i in range(n)] + ["exact_hit", "zz_other"]
    ka = _keyed({"key": keys_a, "lang": ["py"] * len(keys_a)}, ["lang"])
    kb = _keyed({"key": keys_b, "lang": ["py"] * len(keys_b)}, ["lang"])
    kea, keb = _embed(ka).materialize(), _embed(kb).materialize()

    state = {"kind": "glm", "coef": [-8.0, 9.0, 4.0]}
    cutoff = 0.6
    labels = (
        {("module_00", "zz_other"): "Yes", ("module_01", "module_01x"): "No"}
        if with_labels
        else {}
    )

    fused = generate_scored_pairs(
        kea, keb, 32, 7, model_state=state, cutoff=cutoff,
        labels=labels, emit="accepted",
    ).to_pandas()

    pairs = add_pair_features(generate_pairs(kea, keb, 32, 7))
    scored = score_pairs(
        pairs, ray.put(state), ray.put(labels), ["sim", "jw"]
    )
    unfused = accept_filter(scored, cutoff).to_pandas()

    cols = ["block", "key_a", "key_b", "sim", "jw", "match", "match_probability"]
    f = fused[cols].sort_values(["key_a", "key_b"]).reset_index(drop=True)
    u = unfused[cols].sort_values(["key_a", "key_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(f, u)
    assert len(f) > 0
    if with_labels:
        assert ("module_00", "zz_other") in set(zip(f["key_a"], f["key_b"]))
        assert ("module_01", "module_01x") not in set(zip(f["key_a"], f["key_b"]))
    assert "exact_hit" in set(f["key_a"])


def test_add_pair_features_columns():
    ka = _keyed({"key": ["abc"], "lang": ["py"]}, ["lang"])
    kb = _keyed({"key": ["abc", "abd"], "lang": ["py", "py"]}, ["lang"])
    pairs = add_pair_features(
        generate_pairs(_embed(ka), _embed(kb), 32, 1024), full=True
    ).to_pandas()
    assert {"jw", "osa", "cosine", "jaccard", "lcs", "qgram", "soundex", "exact"} <= set(
        pairs.columns
    )
    exact_row = pairs[pairs["key_b"] == "abc"].iloc[0]
    assert bool(exact_row["exact"]) and exact_row["jw"] == 1.0


def test_pack_boundaries_balance():
    """Cost-equalized contiguous cuts: strictly increasing, in range, and
    every resulting partition's cost ≤ mean + heaviest tile (the contiguous
    equal-cumsum guarantee)."""
    from raylink.block import _ROW_COST, _pack_boundaries, _plan_with_bases

    # skew on purpose: one hot block of full tiles + partial-tile blocks
    plan = {"hot": (8, 8), "p1": (1, 1), "p2": (2, 1), "p3": (3, 2)}
    na = {"hot": 4096, "p1": 10, "p2": 520, "p3": 1100}
    nb = {"hot": 4096, "p1": 700, "p2": 380, "p3": 900}
    pb = _plan_with_bases(plan)
    n_bins = 7
    cuts = _pack_boundaries(pb, na, nb, n_bins)
    total = sum(a * b for a, b in plan.values())
    assert cuts == sorted(set(cuts))
    assert all(0 < c < total for c in cuts)
    cost = np.empty(total)
    for b, (ta, tb, base) in pb.items():
        ma, mb = na[b] / ta, nb[b] / tb
        cost[base : base + ta * tb] = ma * mb + _ROW_COST * (ma + mb)
    edges = [0] + cuts + [total]
    loads = np.array(
        [cost[lo:hi].sum() for lo, hi in zip(edges, edges[1:])]
    )
    assert loads.max() <= cost.sum() / n_bins + cost.max() + 1e-9

    # degenerate inputs: single tile / empty plan → no cuts, fallback path
    assert _pack_boundaries(_plan_with_bases({"x": (1, 1)}), {"x": 5}, {"x": 5}, 4) == []
    assert _pack_boundaries(_plan_with_bases({}), {}, {}, 4) == []


@pytest.mark.parametrize("emit", ["accepted", "all"])
def test_packed_routing_matches_fallback(monkeypatch, emit):
    """GRAFT_PACK=1 (explicit-boundary equal-cost partitions) and
    GRAFT_PACK=0 (row-sampled groupby sort) must produce the identical
    scored-pair table — packing only changes which task runs a tile."""
    from raylink.block import generate_scored_pairs

    n = 120
    keys_a = [f"pkg_{i:03d}" for i in range(n)]
    keys_b = [f"pkg_{i:03d}{'x' if i % 4 else ''}" for i in range(n)]
    langs_a = [("py", "c", "go")[i % 3] for i in range(n)]
    langs_b = [("py", "c", "go")[(i * 7) % 3] for i in range(n)]
    ka = _keyed({"key": keys_a, "lang": langs_a}, ["lang"])
    kb = _keyed({"key": keys_b, "lang": langs_b}, ["lang"])
    kea, keb = _embed(ka).materialize(), _embed(kb).materialize()
    state = {"kind": "glm", "coef": [-8.0, 9.0, 4.0]}

    out = {}
    for pack in ("1", "0"):
        monkeypatch.setenv("GRAFT_PACK", pack)
        df = generate_scored_pairs(
            kea, keb, 32, 8, model_state=state, cutoff=0.6, emit=emit
        ).to_pandas()
        out[pack] = df.sort_values(["block", "key_a", "key_b"]).reset_index(
            drop=True
        )
    assert len(out["1"]) > 0
    pd.testing.assert_frame_equal(out["1"], out["0"])


def test_pack_boundaries_property():
    """Property check over random plans: cuts are valid, and every
    resulting contiguous partition's cost stays within mean + the
    heaviest single tile (the equal-cumsum guarantee), for any histogram
    shape."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from raylink.block import _ROW_COST, _pack_boundaries, _plan_with_bases

    @settings(max_examples=60, deadline=None)
    @given(
        blocks=st.lists(
            st.tuples(
                st.integers(1, 2000),  # na
                st.integers(1, 2000),  # nb
                st.integers(1, 6),     # ta
                st.integers(1, 6),     # tb
            ),
            min_size=1, max_size=12,
        ),
        n_bins=st.integers(1, 24),
    )
    def check(blocks, n_bins):
        plan = {f"b{i}": (ta, tb) for i, (_, _, ta, tb) in enumerate(blocks)}
        na = {f"b{i}": a for i, (a, _, _, _) in enumerate(blocks)}
        nb = {f"b{i}": b for i, (_, b, _, _) in enumerate(blocks)}
        pb = _plan_with_bases(plan)
        cuts = _pack_boundaries(pb, na, nb, n_bins)
        total = sum(ta * tb for ta, tb in plan.values())
        assert cuts == sorted(set(cuts)) and all(0 < c < total for c in cuts)
        assert len(cuts) <= max(0, n_bins - 1)
        cost = np.empty(total)
        for bk, (ta, tb, base) in pb.items():
            ma, mb = na[bk] / ta, nb[bk] / tb
            cost[base : base + ta * tb] = ma * mb + _ROW_COST * (ma + mb)
        edges = [0] + cuts + [total]
        loads = [cost[lo:hi].sum() for lo, hi in zip(edges, edges[1:])]
        assert max(loads) <= cost.sum() / max(1, n_bins) + cost.max() + 1e-6

    check()
