"""duplicate_spans / span_fingerprints (raylink/ops/dedup.py): planted
shared-substring recall, df-cap boilerplate suppression, set semantics,
and parity with a brute-force fingerprint index."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from raylink.ops.dedup import _md5_word_int, duplicate_spans, span_fingerprints


def _fps(text, k, stride):
    return {
        _md5_word_int(text[i : i + k]) for i in range(0, len(text) - k + 1, stride)
    }


def _mk_docs(texts):
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )


def test_planted_duplicate_detected(ray_session):
    rng = np.random.default_rng(0)
    alpha = list("abcdefghij ")
    base = "".join(rng.choice(alpha, 200))
    shared = "".join(rng.choice(alpha, 80))
    texts = [
        shared + base,  # doc 0: shared span at alignment 0
        shared + "".join(rng.choice(alpha, 150)),  # doc 1: same span, same grid
        "".join(rng.choice(alpha, 220)),  # doc 2: unrelated
    ]
    out = duplicate_spans(_mk_docs(texts), k=32, stride=8).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs
    n = out.set_index(["id_a", "id_b"])["n_shared"].loc[(0, 1)]
    # an 80-char shared prefix has ceil((80-32+1)/8)=7 grid windows
    assert n == 7


def test_df_cap_drops_boilerplate(ray_session):
    boiler = "x" * 64  # same gram in every doc
    texts = [boiler + f"unique tail {i:040d} padding padding" for i in range(70)]
    # df of the boilerplate grams is 70 > max_df=64: no pairs survive
    out = duplicate_spans(_mk_docs(texts), k=32, stride=8, max_df=64).to_pandas()
    assert len(out) == 0
    # raising the cap brings the pairs back
    out2 = duplicate_spans(_mk_docs(texts), k=32, stride=8, max_df=128).to_pandas()
    assert len(out2) == 70 * 69 // 2


def test_fingerprints_match_brute_force(ray_session):
    rng = np.random.default_rng(5)
    texts = [
        "".join(rng.choice(list("abc def"), rng.integers(0, 120)))
        for _ in range(40)
    ]
    got = span_fingerprints(_mk_docs(texts), k=16, stride=4).to_pandas()
    for did, grp in got.groupby("doc_id"):
        assert set(grp["gram_h"]) == _fps(texts[did], 16, 4)
    # docs shorter than k contribute nothing
    short_ids = {i for i, t in enumerate(texts) if len(t) < 16}
    assert short_ids.isdisjoint(set(got["doc_id"]))


def test_within_doc_repeats_do_not_self_pair(ray_session):
    texts = [("abcdefgh" * 20)]  # one doc full of internal repeats
    out = duplicate_spans(_mk_docs(texts), k=32, stride=8).to_pandas()
    assert len(out) == 0


def test_min_shared_filter(ray_session):
    rng = np.random.default_rng(9)
    shared = "".join(rng.choice(list("qwerty "), 40))  # exactly 2 grid windows
    pad_a = "".join(rng.choice(list("asdf "), 100))
    texts = [shared + pad_a, shared + "".join(rng.choice(list("zxcv "), 90))]
    lo = duplicate_spans(_mk_docs(texts), k=32, stride=8, min_shared=1).to_pandas()
    assert len(lo) == 1 and lo["n_shared"].iloc[0] == 2
    hi = duplicate_spans(_mk_docs(texts), k=32, stride=8, min_shared=3).to_pandas()
    assert len(hi) == 0
