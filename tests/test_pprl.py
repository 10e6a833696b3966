"""CLK Bloom-filter PPRL: encoding and Dice comparison properties."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from raylink.ops.pprl import _ClkMemo, clk_dice_pairs, clk_encode


def _ds(names):
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(len(names), dtype=np.int64)),
                "name": pa.array(names, type=pa.string()),
            }
        )
    )


def test_encode_deterministic_and_partition_invariant():
    names = [f"entity number {i % 7} variant {i}" for i in range(300)]
    a = clk_encode(_ds(names), "name", "id").to_pandas().sort_values("id")
    b = (
        clk_encode(_ds(names).repartition(5), "name", "id")
        .to_pandas()
        .sort_values("id")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # popcount column is consistent with the bitset
    for clk, nb in zip(a["clk"], a["n_bits"]):
        assert bin(int(clk) & ((1 << 63) - 1)).count("1") == nb


def test_identical_strings_dice_one():
    names = ["jonathan smith", "jonathan smith", "xyzzy quux"]
    clks = clk_encode(_ds(names), "name", "id")
    pairs = ray.data.from_arrow(
        pa.table({"ka": pa.array([0, 0], type=pa.int64()),
                  "kb": pa.array([1, 2], type=pa.int64())})
    )
    out = (
        clk_dice_pairs(pairs, clks, id_col="id")
        .to_pandas()
        .sort_values("kb")
        .reset_index(drop=True)
    )
    assert out.loc[0, "dice_e6"] == 1_000_000  # identical -> Dice 1
    assert out.loc[1, "dice_e6"] < 1_000_000   # disjoint-ish names


def test_dice_tracks_similarity():
    # a near-duplicate pair must outscore an unrelated pair
    names = ["margaret thatcher", "margaret thacher", "akira kurosawa"]
    clks = clk_encode(_ds(names), "name", "id")
    pairs = ray.data.from_arrow(
        pa.table({"ka": pa.array([0, 0], type=pa.int64()),
                  "kb": pa.array([1, 2], type=pa.int64())})
    )
    out = clk_dice_pairs(pairs, clks, id_col="id").to_pandas()
    near = int(out.loc[out["kb"] == 1, "dice_e6"].iloc[0])
    far = int(out.loc[out["kb"] == 2, "dice_e6"].iloc[0])
    assert near > far


def test_memo_matches_fresh_hash():
    m = _ClkMemo(63, 2)
    first = m.mask("ab")
    assert m.mask("ab") == first == _ClkMemo(63, 2).mask("ab")


def test_m_bound_raises():
    with pytest.raises(ValueError):
        clk_encode(_ds(["x"]), "name", "id", m=64)
