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


def test_voters_streaming_matches_driver_accepted():
    """Multi-column blocking (composite '\\x1f' block keys) through the
    STREAMING path: fused final pass + shuffle payload joins + distributed
    clustering must accept the same pairs the driver path does."""
    va, vb, labels, truth = voters_tables(n_a=150, n_b=120, seed=42)

    def _run(mode):
        oracle = raylink.DeterministicOracle(labels)
        cfg = raylink.LinkConfig(
            by="full_name", blocking=["city", "birthyear"], seed=42,
            n_initial=100, al_batch_size=20, loop_mode=mode,
        )
        return raylink.fuzzylink(
            rd.from_arrow(va), rd.from_arrow(vb), oracle, cfg
        )

    import ray.data as _rd

    res_s = _run("streaming")
    assert res_s.metrics["loop_mode"] == "streaming"
    acc_s = (
        res_s.accepted.select_columns(["block", "key_a", "key_b"])
        .to_pandas().sort_values(["block", "key_a", "key_b"]).reset_index(drop=True)
    )
    # streaming linked is dfA-complete and clusters is a Dataset
    linked = res_s.linked.to_pandas()
    assert set(linked["full_name"]) == set(va.column("full_name").to_pylist())
    assert isinstance(res_s.clusters, _rd.Dataset)
    # the fused accepted set reaches the same truth recall as driver mode
    tdf = truth.to_pandas()
    got = set(zip(acc_s["key_a"], acc_s["key_b"]))
    want = set(zip(tdf["key_a"], tdf["key_b"]))
    assert len(got & want) / max(len(want), 1) >= 0.8
