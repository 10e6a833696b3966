"""util.shuffle_merge — the hash-partitioned join primitive behind the
distributed payload join, label propagation and dedup verifiers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raylink.util import shuffle_merge


def _left_join(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
    return ldf.merge(rdf, how="left", on="k")


def test_shuffle_merge_left_join_matches_pandas():
    left = pd.DataFrame(
        {"k": [f"k{i % 7}" for i in range(50)], "x": np.arange(50, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": ["k0", "k1", "k2", "k99"], "payload": ["a", "b", "c", "d"]}
    )
    out_schema = pa.schema(
        [("k", pa.string()), ("x", pa.int64()), ("payload", pa.string())]
    )
    got = (
        shuffle_merge(
            rd.from_pandas(left),
            rd.from_pandas(right.rename(columns={"k": "rk"})),
            ["k"],
            ["rk"],
            lambda l, r: l.merge(
                r.rename(columns={"rk": "k"}), how="left", on="k"
            ),
            out_schema,
            num_partitions=5,
        )
        .to_pandas()
        .sort_values(["x"])
        .reset_index(drop=True)
    )
    want = left.merge(right, how="left", on="k").sort_values(["x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # int dtype preserved despite null-padded union columns
    assert got["x"].dtype == np.int64


def test_shuffle_merge_unmatched_rows_typed_nulls():
    """Partitions whose right side is empty must not drift schema: the
    pinned out_schema yields typed nulls for every payload column."""
    left = pd.DataFrame({"k": ["a", "b"], "n": [1, 2]})
    right = pd.DataFrame({"k": ["zzz"], "v": [9], "s": ["x"]})
    out_schema = pa.schema(
        [("k", pa.string()), ("n", pa.int64()), ("v", pa.int64()), ("s", pa.string())]
    )
    ds = shuffle_merge(
        rd.from_pandas(left), rd.from_pandas(right),
        ["k"], ["k"],
        lambda l, r: l.merge(r, how="left", on="k"),
        out_schema, num_partitions=3,
    )
    sch = dict(zip(ds.schema().names, ds.schema().types))
    assert sch["v"] == pa.int64()
    assert sch["s"] == pa.string()
    got = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["v"].isna().all() and got["s"].isna().all()
    assert len(got) == 2
