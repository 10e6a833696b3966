"""Fellegi–Sunter EM linkage (raylink/ops/fellegi.py).

Covers: EM parameter recovery on a planted mixture (the driver-side
numerics), blocked self-pair completeness vs brute force (the distributed
pair generator), LUT ↔ score consistency on the end-to-end pipeline, and
the frozen-LUT bit-exactness property the SQL gate rests on (integer
scores are lookups, so engine and oracle cannot diverge by float noise).
"""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from raylink.ops.fellegi import (
    Comparison,
    agreement_pattern,
    blocked_self_pairs,
    fellegi_sunter_link,
    fit_fs_em,
    pattern_histogram,
)


def _planted_counts(lam, m, u, n=1_000_000):
    K = len(m)
    bits = ((np.arange(1 << K)[:, None] >> np.arange(K)) & 1).astype(float)
    pm = np.prod(np.where(bits == 1, m, 1 - m), axis=1)
    pu = np.prod(np.where(bits == 1, u, 1 - u), axis=1)
    return np.rint(n * (lam * pm + (1 - lam) * pu)).astype(np.int64)


def test_em_recovers_planted_mixture():
    lam, m, u = 0.25, np.array([0.95, 0.85, 0.7]), np.array([0.2, 0.05, 0.3])
    mod = fit_fs_em(_planted_counts(lam, m, u))
    assert abs(mod.lam - lam) < 1e-3
    np.testing.assert_allclose(mod.m, m, atol=1e-3)
    np.testing.assert_allclose(mod.u, u, atol=1e-3)


def test_em_is_deterministic():
    counts = _planted_counts(0.1, np.array([0.9, 0.8]), np.array([0.1, 0.2]))
    a, b = fit_fs_em(counts), fit_fs_em(counts)
    assert a.lam == b.lam
    assert (a.m == b.m).all() and (a.u == b.u).all()
    assert a.lut().equals(b.lut())


def test_em_rejects_bad_input():
    with pytest.raises(ValueError):
        fit_fs_em(np.array([1, 2, 3]))  # not a power of two
    with pytest.raises(ValueError):
        fit_fs_em(np.zeros(4))  # empty histogram


def _toy_table(n=120, blocks=5, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "blk": rng.integers(0, blocks, n).astype(np.int64),
            "f1": rng.integers(0, 4, n).astype(np.int64),
            "f2": rng.integers(0, 1000, n).astype(np.int64),
        }
    )


def test_blocked_self_pairs_complete_and_unique(ray_session):
    df = _toy_table()
    ds = ray.data.from_pandas(df)
    got = blocked_self_pairs(ds, "blk", "id", ["f1", "f2"]).to_pandas()
    want = {
        (a, b)
        for _, g in df.groupby("blk")
        for a, b in itertools.combinations(sorted(g["id"]), 2)
    }
    got_pairs = list(zip(got["a_id"], got["b_id"]))
    assert len(got_pairs) == len(set(got_pairs)) == len(want)
    assert set(got_pairs) == want
    assert (got["a_id"] < got["b_id"]).all()
    # carried feature columns are the source rows' values
    f1 = df.set_index("id")["f1"]
    assert (got["a_f1"].to_numpy() == f1.loc[got["a_id"]].to_numpy()).all()


def test_pattern_and_histogram_match_brute_force(ray_session):
    df = _toy_table(n=80)
    ds = ray.data.from_pandas(df)
    comps = [Comparison("f1", "f1"), Comparison("f2", "f2", "within", 100)]
    pats = agreement_pattern(
        blocked_self_pairs(ds, "blk", "id", ["f1", "f2"]), comps
    ).to_pandas()
    brute = (pats["a_f1"] == pats["b_f1"]).astype(int) + 2 * (
        (pats["a_f2"] - pats["b_f2"]).abs() < 100
    ).astype(int)
    assert (pats["pattern"].to_numpy() == brute.to_numpy()).all()
    hist = pattern_histogram(
        agreement_pattern(blocked_self_pairs(ds, "blk", "id", ["f1", "f2"]), comps),
        2,
    )
    assert (hist == np.bincount(pats["pattern"], minlength=4)).all()
    assert hist.sum() == len(pats)


def test_end_to_end_scores_are_lut_lookups(ray_session):
    df = _toy_table(n=100)
    ds = ray.data.from_pandas(df)
    comps = [Comparison("f1", "f1"), Comparison("f2", "f2", "within", 200)]
    scored, model = fellegi_sunter_link(ds, "blk", "id", comps)
    out = scored.to_pandas()
    lut = model.lut().set_index("pattern")
    # every scored column is exactly the frozen LUT row for its pattern
    for col in ("score_e6", "posterior_e6", "is_match"):
        assert (
            out[col].to_numpy() == lut[col].loc[out["pattern"]].to_numpy()
        ).all()
    # LUT internal consistency: decision is the posterior threshold
    full = model.lut()
    assert (
        (full["is_match"] == 1) == (full["posterior_e6"] > 500_000)
    ).all() or (
        # posterior_e6 rounding can land exactly on 500000 only if the
        # float posterior was within 5e-7 of 0.5 — assert that didn't
        # happen rather than masking it
        (full["posterior_e6"] != 500_000).all()
    )


def test_empty_block_partitions_emit_typed_schema(ray_session):
    # single row ⇒ zero pairs; the pair generator must still emit the
    # pinned output schema (executor schema-hygiene contract)
    df = _toy_table(n=1)
    ds = ray.data.from_pandas(df)
    out = blocked_self_pairs(ds, "blk", "id", ["f1"])
    assert out.count() == 0
    sch = out.schema()
    assert set(sch.names) == {"blk", "a_id", "b_id", "a_f1", "b_f1"}
    assert all(pa.types.is_int64(pa_type) for pa_type in sch.types)
