"""weighted_priority_sample: exact integer priority sampling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from raylink.ops.sample import id_hash, weighted_priority_sample


def _ds(ids, w, parts=1):
    t = pa.table(
        {"id": pa.array(ids, type=pa.int64()), "w": pa.array(w, type=pa.int64())}
    )
    d = ray.data.from_arrow(t)
    return d.repartition(parts) if parts > 1 else d


def _brute(ids, w, k):
    ids = np.asarray(ids, dtype=np.int64)
    w = np.asarray(w, dtype=np.int64)
    u = id_hash(ids).astype(np.int64) + 1
    q = (w * (np.int64(1) << np.int64(32))) // u
    order = np.lexsort((ids, -q))[:k]
    return pd.DataFrame({"id": ids[order], "w": w[order], "priority": q[order]})


def test_matches_brute_force_and_partition_invariant():
    rng = np.random.default_rng(5)
    ids = rng.permutation(5000)[:1200].astype(np.int64)
    w = rng.integers(1, 10_000, size=1200).astype(np.int64)
    want = _brute(ids, w, 50).sort_values("id").reset_index(drop=True)
    for parts in (1, 7):
        got = (
            weighted_priority_sample(_ds(ids, w, parts), "id", "w", 50)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_weight_bias():
    # one row with ~all the weight is (essentially) always in a small sample
    ids = np.arange(2000, dtype=np.int64)
    w = np.ones(2000, dtype=np.int64)
    w[1234] = 2**30
    got = weighted_priority_sample(_ds(ids, w), "id", "w", 10).to_pandas()
    assert 1234 in set(got["id"])


def test_contract_raises():
    with pytest.raises(ValueError):
        weighted_priority_sample(_ds([1], [0]), "id", "w", 5).to_pandas()
    with pytest.raises(Exception):
        d = ray.data.from_arrow(
            pa.table({"id": pa.array([1], type=pa.int64()),
                      "w": pa.array([0.5], type=pa.float64())})
        )
        weighted_priority_sample(d, "id", "w", 5).to_pandas()
