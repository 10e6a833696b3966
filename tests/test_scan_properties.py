"""Property tests for the scan/interval/rank family: the results must be
pure functions of the DATA — invariant to row order and block layout —
and agree with an in-memory reference on arbitrary inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from raylink.ops.pack import deterministic_shuffle, ordered_prefix_sum
from raylink.ops.sample import id_hash
from raylink.ops.window import range_join


def _as_blocks(df: pd.DataFrame, n_blocks: int) -> rd.Dataset:
    """Build a dataset from explicit arbitrary block cuts."""
    from raylink.util import from_arrow_blocks

    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return from_arrow_blocks(tbl, n_blocks=max(1, n_blocks))


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40),
        min_size=1,
        max_size=120,
        unique=True,
    ),
    st.integers(min_value=1, max_value=5),
    st.randoms(),
)
def test_prefix_sum_invariant_to_row_order_and_blocks(ids, nblocks, rnd):
    ids = np.array(ids, dtype=np.int64)
    w = (ids % 97 + 1).astype(np.int64)
    df = pd.DataFrame({"doc_id": ids, "w": w})
    shuffled = df.sample(frac=1.0, random_state=rnd.randint(0, 10**6))
    got = (
        ordered_prefix_sum(_as_blocks(shuffled, nblocks), "doc_id", "w")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values("doc_id").reset_index(drop=True)
    expect = np.cumsum(ref["w"].to_numpy()) - ref["w"].to_numpy()
    assert (got["doc_id"].to_numpy() == ref["doc_id"].to_numpy()).all()
    assert (got["start"].to_numpy() == expect).all()


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40),
        min_size=1,
        max_size=100,
        unique=True,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_shuffle_rank_is_exact_hash_order(ids, nblocks):
    ids = np.array(ids, dtype=np.int64)
    got = (
        deterministic_shuffle(
            _as_blocks(pd.DataFrame({"doc_id": ids}), nblocks)
        )
        .to_pandas()
        .set_index("doc_id")["shuffle_rank"]
        .to_dict()
    )
    order = sorted(ids.tolist(), key=lambda i: (int(id_hash(np.array([i]))[0]), i))
    for rank, i in enumerate(order):
        assert got[i] == rank


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.integers(min_value=0, max_value=500_000),  # ts ms
        ),
        min_size=2,
        max_size=80,
    ),
    st.integers(min_value=1, max_value=120),
)
def test_range_join_matches_brute_force(rows, win_s):
    ev = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows], unit="ms"),
        }
    )
    ds = rd.from_pandas(ev)
    got = range_join(ds, ds, "user_id", "ts", "ts", 0.0, float(win_s)).to_pandas()
    if got.empty:
        # Ray 2.49's to_pandas drops the (correct) Arrow schema for 0-row
        # datasets; the pairs set is simply empty
        got = pd.DataFrame(columns=["left_id", "user_id", "right_id", "dt_us"])
    m = ev.merge(ev, on="user_id", suffixes=("_a", "_b"))
    dt = m.ts_b - m.ts_a
    keep = m[(dt > pd.Timedelta(0)) & (dt <= pd.Timedelta(seconds=win_s))]
    want = set(zip(keep.event_id_a, keep.event_id_b))
    assert set(zip(got.left_id, got.right_id)) == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),  # group
            st.integers(min_value=-50, max_value=200),  # value (centi-units)
        ),
        min_size=1,
        max_size=100,
    ),
    st.integers(min_value=1, max_value=5),
    st.randoms(),
)
def test_top_p_select_invariant_and_matches_reference(rows, nblocks, rnd):
    from raylink.ops.sample import top_p_select

    df = pd.DataFrame(rows, columns=["g", "cv"])
    df["id"] = np.arange(len(df), dtype=np.int64)
    df["g"] = df["g"].astype(np.int64)
    df["val"] = df["cv"] / 100.0
    shuffled = df.sample(frac=1.0, random_state=rnd.randint(0, 10**6))
    got = top_p_select(
        _as_blocks(shuffled[["g", "id", "val"]], nblocks),
        "g", "val", "id", 7, 10,
    ).to_pandas()
    if got.empty:
        # Ray 2.49 to_pandas drops the schema on 0-row datasets; the
        # operator's Arrow schema is correct — just verify emptiness
        assert (np.round(df["val"] * 1e6) <= 0).all()
        return
    got = got.sort_values(["g", "id"]).reset_index(drop=True)
    q = df.copy()
    q["v6"] = np.round(q["val"] * 1e6).astype(np.int64)
    q = q[q.v6 > 0]
    kept = []
    for _, sub in q.groupby("g"):
        sub = sub.sort_values(["v6", "id"], ascending=[False, True])
        tgt = -(-sub.v6.sum() * 7 // 10)
        kept.append(sub[(sub.v6.cumsum() - sub.v6) < tgt][["g", "id", "v6"]])
    exp = (
        pd.concat(kept).sort_values(["g", "id"]).reset_index(drop=True)
        if kept
        else pd.DataFrame(columns=["g", "id", "v6"])
    )
    assert got["id"].tolist() == exp["id"].tolist()
    assert got["v6"].tolist() == exp["v6"].tolist()


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=15), min_size=0, max_size=40),
    st.lists(st.integers(min_value=0, max_value=15), min_size=0, max_size=40),
    st.integers(min_value=1, max_value=4),
    st.randoms(),
)
def test_full_outer_join_invariant_and_matches_pandas(lkeys, rkeys, nblocks, rnd):
    from raylink.ops.relational import full_outer_join

    left = pd.DataFrame(
        {"k": np.array(lkeys, dtype=np.int64),
         "lv": np.arange(len(lkeys), dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": np.array(rkeys, dtype=np.int64),
         "rv": np.arange(len(rkeys), dtype=np.int64) * 7}
    )
    if len(left) == 0 and len(right) == 0:
        return
    got = (
        full_outer_join(
            _as_blocks(left.sample(frac=1.0, random_state=rnd.randint(0, 10**6)), nblocks),
            _as_blocks(right.sample(frac=1.0, random_state=rnd.randint(0, 10**6)), nblocks),
            ["k"],
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, how="outer", on="k")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["lv"].fillna(-1).tolist() == exp["lv"].fillna(-1).tolist()
    assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist()
