"""Sorted-neighborhood blocking (raylink/ops/snm.py): exactness vs a
brute-force window over the driver-sorted order, duplicate-freeness, the
sort-code order contract, and histogram-cut balance."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from raylink.ops.snm import _balanced_cuts, sort_codes, sorted_neighborhood_pairs


def _rand_df(n, seed, alphabet="abcdefgh", maxlen=12):
    rng = np.random.default_rng(seed)
    keys = [
        "".join(rng.choice(list(alphabet), size=rng.integers(1, maxlen)))
        for _ in range(n)
    ]
    return pd.DataFrame({"id": np.arange(n, dtype=np.int64), "k": keys})


def _brute(df, w):
    srt = df.sort_values(["k", "id"], kind="stable").reset_index(drop=True)
    ids = srt["id"].to_numpy()
    n = len(ids)
    return {
        (ids[i], ids[j], j - i)
        for i in range(n)
        for j in range(i + 1, min(i + w, n))
    }


@pytest.mark.parametrize("w", [2, 5, 9])
def test_snm_matches_brute_force(ray_session, w):
    df = _rand_df(1500, seed=w)
    got = sorted_neighborhood_pairs(
        ray.data.from_pandas(df), "k", "id", window=w
    ).to_pandas()
    gotset = set(zip(got["id_a"], got["id_b"], got["dist"]))
    assert len(gotset) == len(got), "duplicate pairs"
    assert gotset == _brute(df, w)


def test_snm_heavy_ties(ray_session):
    # many identical keys: the total order must fall back to id and the
    # pair set must still be the exact rank window
    df = _rand_df(800, seed=11, alphabet="ab", maxlen=3)
    got = sorted_neighborhood_pairs(
        ray.data.from_pandas(df), "k", "id", window=6
    ).to_pandas()
    assert set(zip(got["id_a"], got["id_b"], got["dist"])) == _brute(df, 6)


def test_sort_codes_are_order_consistent():
    keys = np.array(
        ["", "a", "aa", "ab", "abcdefghZZZ", "abcdefgha", "b", "zz"],
        dtype=object,
    )
    code, bucket = sort_codes(keys, 12)
    # codes must be monotone non-decreasing in binary string order
    assert (np.diff(code.astype(np.uint64).astype(np.float64)) >= 0).all()
    assert (bucket >= 0).all() and (bucket < (1 << 12)).all()
    # equal 8-byte prefixes tie (full order restored within the bucket)
    assert code[4] == code[5]


def test_balanced_cuts_cover_weight():
    w = np.zeros(100, dtype=np.int64)
    w[10] = 500
    w[40] = 300
    w[90] = 200
    cuts = _balanced_cuts(w, 4)
    assert cuts == sorted(set(cuts))
    assert all(10 < c <= 90 for c in cuts)
    # single populated bucket -> no cuts
    w2 = np.zeros(100, dtype=np.int64)
    w2[3] = 7
    assert _balanced_cuts(w2, 8) == []


def test_snm_window_validation(ray_session):
    df = _rand_df(10, seed=1)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(ray.data.from_pandas(df), "k", "id", window=1)


def test_snm_jw_link_matches_brute_force(ray_session):
    # small corpus with planted near-duplicate names
    import itertools
    from raylink.features import jaro_winkler_sim
    from raylink.ops.snm import snm_jw_link
    import ray.data as rd

    rng = np.random.default_rng(21)
    base = ["smith", "jones", "brown", "taylor", "wilson"]
    names = []
    for i in range(120):
        b = base[rng.integers(0, len(base))]
        if rng.random() < 0.4:  # corrupt one char
            p = int(rng.integers(0, len(b)))
            b = b[:p] + chr(ord("a") + int(rng.integers(0, 26))) + b[p + 1:]
        names.append(b)
    df = pd.DataFrame({"id": np.arange(120, dtype=np.int64), "k": names})
    edges, clusters = snm_jw_link(
        rd.from_pandas(df), "k", "id", window=6, jw_e6_threshold=900_000
    )
    e = edges.to_pandas()
    # brute force: same window rule + same jw threshold + transitive closure
    srt = df.sort_values(["k", "id"], kind="stable").reset_index(drop=True)
    ids, keys = srt["id"].to_numpy(), list(srt["k"])
    want_edges = set()
    for i in range(len(ids)):
        for j in range(i + 1, min(i + 6, len(ids))):
            if round(jaro_winkler_sim(keys[i].lower(), keys[j].lower(), boost_threshold=0.7) * 1e6) >= 900_000:
                want_edges.add((ids[i], ids[j]))
    assert set(zip(e["id_a"], e["id_b"])) == want_edges
    # closure: union-find over want_edges
    parent = {v: v for pr in want_edges for v in pr}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in want_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_cl = {v: find(v) for v in parent}
    c = clusters.to_pandas()
    got_cl = dict(zip(c["id"], c["cluster"]))
    assert got_cl == want_cl


def test_snm_jw_link_rejects_negative_ids(ray_session):
    import ray.data as rd
    from raylink.ops.snm import snm_jw_link

    df = pd.DataFrame(
        {"id": np.array([-1, 2, 3], dtype=np.int64), "k": ["aa", "aa", "aa"]}
    )
    # label propagation materializes eagerly, so the guard fires inside
    # the snm_jw_link call itself
    with pytest.raises(Exception, match="non-negative"):
        edges, clusters = snm_jw_link(rd.from_pandas(df), "k", "id", window=3)
        clusters.to_pandas()
