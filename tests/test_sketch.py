"""Sketches (raylink/ops/sketch.py): exact bit_length kernel, HLL
accuracy and batching-invariance, CMS overestimate-only guarantee and
mergeability, heavy-hitter determinism."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from raylink.ops.sketch import (
    _bit_length_u64,
    cms_counters,
    cms_estimate,
    cms_heavy_hitters,
    hll_estimate,
    hll_registers,
)


def test_bit_length_exact():
    xs = np.array(
        [0, 1, 2, 3, 4, (1 << 51) - 1, 1 << 51, (1 << 62) + 5, (1 << 63) - 1],
        dtype=np.uint64,
    )
    got = _bit_length_u64(xs)
    want = np.array([int(x).bit_length() for x in xs], dtype=np.int64)
    assert (got == want).all()
    # the float-log2 trap this kernel exists for: 2^51 - 1 must be 51, not 52
    assert int(np.floor(np.log2(float((1 << 51) - 1)))) + 1 == 52  # float is wrong
    assert got[5] == 51  # we are right


def _ds_of(vals):
    return ray.data.from_pandas(pd.DataFrame({"v": np.asarray(vals, dtype=np.int64)}))


def test_hll_accuracy_and_batch_invariance(ray_session):
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 40_000, size=120_000)
    exact = len(np.unique(vals))
    regs1 = hll_registers(_ds_of(vals), "v", p=12).to_pandas()
    est = hll_estimate(regs1, p=12)
    assert abs(est - exact) / exact < 0.05  # 1.04/sqrt(4096) ≈ 1.6% σ
    # different partitioning → identical register table
    ds2 = _ds_of(vals).repartition(13)
    regs2 = hll_registers(ds2, "v", p=12).to_pandas()
    a = regs1.sort_values("reg").reset_index(drop=True)
    b = regs2.sort_values("reg").reset_index(drop=True)
    assert a.equals(b)


def test_hll_validation():
    with pytest.raises(ValueError):
        import ray.data as rd

        hll_registers(rd.from_pandas(pd.DataFrame({"v": [1]})), "v", p=2)


def test_cms_overestimates_only_and_merges(ray_session):
    rng = np.random.default_rng(1)
    vals = np.concatenate(
        [rng.integers(0, 500, size=20_000), np.full(5_000, 7), np.full(3_000, 13)]
    )
    ctr = cms_counters(_ds_of(vals), "v", depth=4, width=512).to_pandas()
    uniq, true = np.unique(vals, return_counts=True)
    est = cms_estimate(ctr, list(uniq), depth=4, width=512)
    assert (est >= true).all()
    # counters are exact sums: total mass per row equals N
    per_row = ctr.groupby("row")["cnt"].sum()
    assert (per_row == len(vals)).all()
    # batching invariance
    ctr2 = cms_counters(_ds_of(vals).repartition(9), "v", depth=4, width=512).to_pandas()
    k = ["row", "slot"]
    assert ctr.sort_values(k).reset_index(drop=True).equals(
        ctr2.sort_values(k).reset_index(drop=True)
    )


def test_cms_heavy_hitters_finds_planted(ray_session):
    rng = np.random.default_rng(2)
    vals = np.concatenate(
        [rng.integers(0, 2_000, size=10_000), np.full(4_000, 99), np.full(2_500, 42)]
    )
    hh = cms_heavy_hitters(_ds_of(vals), "v", k=5, depth=4, width=1024)
    assert list(hh["v"].iloc[:2]) == [99, 42]
    assert hh["est_cnt"].iloc[0] >= 4_000
    # local_topm candidate mode also surfaces the planted hitters
    hh2 = cms_heavy_hitters(
        _ds_of(vals), "v", k=5, depth=4, width=1024,
        candidates="local_topm", local_top=64,
    )
    assert 99 in set(hh2["v"]) and 42 in set(hh2["v"])
    with pytest.raises(ValueError):
        cms_heavy_hitters(_ds_of(vals), "v", candidates="bogus")


def test_grouped_hll_matches_per_group_global_sketch():
    """The grouped sketch must equal running the global sketch on each
    group's slice (merge = max is batching/partition independent), and
    its estimates must land within HLL error of the exact counts."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from raylink.ops.sketch import (
        grouped_hll_registers,
        hll_estimate,
        hll_registers,
    )

    rng = np.random.default_rng(7)
    groups = np.repeat(["a", "b", "c"], [4000, 1500, 10])
    vals = np.concatenate(
        [
            rng.integers(0, 2500, 4000),      # ~2060 distinct
            rng.integers(0, 800, 1500),       # ~680 distinct
            np.arange(10),                    # 10 distinct
        ]
    )
    tbl = pa.table(
        {
            "g": pa.array(groups, type=pa.string()),
            "v": pa.array(vals, type=pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl)
    got = grouped_hll_registers(ds, "g", "v", p=10).to_pandas()
    for g in ("a", "b", "c"):
        sub = got[got["g"] == g][["reg", "max_rank"]].reset_index(drop=True)
        ref = (
            hll_registers(
                ds.filter(expr=f"g == '{g}'"), "v", p=10
            )
            .to_pandas()
            .sort_values("reg")
            .reset_index(drop=True)
        )
        sub = sub.sort_values("reg").reset_index(drop=True)
        assert sub.equals(ref), f"group {g} registers diverge"
        exact = len(set(vals[groups == g]))
        est = hll_estimate(sub, p=10)
        assert abs(est - exact) / exact < 0.15, (g, est, exact)
