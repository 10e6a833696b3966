"""F4 voters fixture: multi-column blocking (city + birthyear) and
many-to-many join re-expansion (R/fuzzylink.R:475-480)."""

import pandas as pd
import ray.data as rd

import raylink
from raylink.synth import voters_tables


def test_voters_multicolumn_blocking():
    va, vb, labels, truth = voters_tables(n_a=150, n_b=120, seed=42)
    oracle = raylink.DeterministicOracle(labels)
    cfg = raylink.LinkConfig(
        by="full_name",
        blocking=["city", "birthyear"],
        seed=42,
        n_initial=100,
        al_batch_size=20,
    )
    res = raylink.fuzzylink(rd.from_arrow(va), rd.from_arrow(vb), oracle, cfg)
    linked = res.linked.to_pandas()

    # dfA-complete
    assert len(linked) >= va.num_rows
    assert set(linked["full_name"]) == set(va.column("full_name").to_pylist())

    # every truth pair within the composite block is recoverable only when
    # city AND birthyear agree; measure recall over the labeled truth
    tdf = truth.to_pandas()
    matched = linked[linked["key_b"].notna()]
    got = set(zip(matched["full_name"], matched["key_b"]))
    want = set(zip(tdf["key_a"], tdf["key_b"]))
    recall = len(got & want) / max(len(want), 1)
    assert recall >= 0.8, (recall, len(want))
