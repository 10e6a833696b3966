"""Prefix-filter set-similarity join (raylink/ops/ssjoin.py): brute-force
parity, exact rational prefix lengths (the float-ceil trap), rank-order
determinism, and planted-duplicate recall."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from raylink.ops.dedup import _NONWS_ASCII
from raylink.ops.ssjoin import prefix_length, set_similarity_join, token_ranks


def _corpus(n, seed, vocab_size=60, lo=3, hi=15):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(vocab_size)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(lo, hi))) for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _brute(texts, num, den):
    sets = [set(_NONWS_ASCII.findall(t.lower())) for t in texts]
    want = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            c = len(sets[i] & sets[j])
            u = len(sets[i] | sets[j])
            if u and den * c >= num * u:
                want[(i, j)] = (c, u)
    return want


@pytest.mark.parametrize(
    "thr,num,den,vocab",
    [(0.25, 1, 4, 60), (0.5, 1, 2, 60), (0.75, 3, 4, 10)],
)
def test_ssjoin_matches_brute_force(ray_session, thr, num, den, vocab):
    df = _corpus(150, seed=int(den), vocab_size=vocab)
    got = set_similarity_join(
        ray.data.from_pandas(df), threshold=thr
    ).to_pandas()
    gotmap = (
        {}
        if got.empty
        else {
            (a, b): (c, u)
            for a, b, c, u in zip(
                got["id_a"], got["id_b"], got["n_common"], got["n_union"]
            )
        }
    )
    assert gotmap == _brute(list(df["text"]), num, den)


def test_ssjoin_planted_duplicates(ray_session):
    df = _corpus(100, seed=9)
    texts = list(df["text"])
    texts[50] = texts[10]  # exact word-set duplicate
    texts[51] = texts[10] + " zzzextra"  # one extra token
    df["text"] = texts
    got = set_similarity_join(
        ray.data.from_pandas(df), threshold=0.9
    ).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (10, 50) in pairs
    n10 = len(set(_NONWS_ASCII.findall(texts[10].lower())))
    # (10, 51): J = n/(n+1) — in iff 10*n >= 9*(n+1) i.e. n >= 9
    assert ((10, 51) in pairs) == (10 * n10 >= 9 * (n10 + 1))


def test_prefix_length_exact_rational():
    # float ceil(0.95*20) = 20 (wrong); exact rational gives 19
    assert prefix_length(20, 19, 20) == 20 - 19 + 1
    assert prefix_length(0, 1, 2) == 0
    assert prefix_length(7, 1, 2) == 7 - 4 + 1  # ceil(7/2)=4
    assert prefix_length(1, 1, 1) == 1


def test_token_ranks_deterministic_rare_first(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["a b", "a b c", "a", "a d"],
        }
    )
    rk = token_ranks(ray.data.from_pandas(df))
    assert list(rk["tok"]) == ["c", "d", "b", "a"]  # df asc, tok asc
    assert list(rk["df"]) == [1, 1, 2, 4]
    assert list(rk["rank"]) == [0, 1, 2, 3]


def test_ssjoin_threshold_validation(ray_session):
    df = _corpus(5, seed=1)
    with pytest.raises(ValueError):
        set_similarity_join(ray.data.from_pandas(df), threshold=0.0)
