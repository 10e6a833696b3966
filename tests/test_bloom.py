"""Bloom-filtered anti-join: bit-exact anti-join semantics regardless of
the bloom's false-positive rate (the exact verify stage kills every FP),
with the definite-non-member fast path carrying most rows untouched."""

import numpy as np
import pandas as pd
import ray.data as rd

from raylink.ops.relational import (
    _bloom_positions,
    bloom_anti_join,
    build_bloom,
)


def _expected(left: pd.DataFrame, right_keys) -> pd.DataFrame:
    return (
        left[~left["k"].isin(set(right_keys))]
        .sort_values("v")
        .reset_index(drop=True)
    )


def _run(left_df, right_df, **kw) -> pd.DataFrame:
    out = bloom_anti_join(
        rd.from_pandas(left_df),
        rd.from_pandas(right_df),
        "k",
        "rk",
        **kw,
    ).to_pandas()
    return out.sort_values("v").reset_index(drop=True)


def test_bloom_anti_join_matches_exact_anti_join():
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {"k": rng.integers(-500, 500, 3000), "v": np.arange(3000)}
    )
    right = pd.DataFrame({"rk": rng.integers(-500, 500, 400)})
    got = _run(left, right)
    pd.testing.assert_frame_equal(got, _expected(left, right["rk"]))


def test_exact_even_under_heavy_false_positives():
    # 2 bits/key -> FP rate ~50%: half the non-members take the slow
    # (verify) path, and the output must still be bit-exact.
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {"k": rng.integers(0, 10_000, 4000), "v": np.arange(4000)}
    )
    right = pd.DataFrame({"rk": rng.integers(0, 10_000, 500)})
    got = _run(left, right, bits_per_key=2)
    pd.testing.assert_frame_equal(got, _expected(left, right["rk"]))


def test_empty_exclusion_set_returns_left_unchanged():
    left = pd.DataFrame({"k": [1, 2, 3], "v": [0, 1, 2]})
    right = pd.DataFrame({"rk": pd.array([], dtype="int64")})
    got = _run(left, right)
    pd.testing.assert_frame_equal(got, left)


def test_bloom_has_no_false_negatives_and_sane_fp_rate():
    rng = np.random.default_rng(3)
    members = rng.choice(2**40, size=5000, replace=False)
    right = rd.from_pandas(pd.DataFrame({"rk": members.astype(np.int64)}))
    ref, m, k, n = build_bloom(right, "rk", bits_per_key=10)
    import ray

    bloom = ray.get(ref)
    assert n == 5000

    def probe(keys):
        pos = _bloom_positions(keys.astype(np.int64), m, k)
        return (
            (bloom[(pos >> np.uint64(6)).astype(np.int64)]
             >> (pos & np.uint64(63))) & np.uint64(1)
        ).all(axis=1)

    # no false negatives, ever
    assert probe(members).all()
    # FP rate at 10 bits/key is ~0.8%; allow generous slack
    outsiders = (rng.choice(2**40, size=20_000) + 2**41).astype(np.int64)
    assert probe(outsiders).mean() < 0.05
