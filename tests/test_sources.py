"""Source/sink tests: format dispatch, column projection, partitioned
parquet round-trip."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from raylink.sources import (
    convert_to_parquet,
    read_table,
    write_partitioned_parquet,
)


@pytest.fixture()
def frame():
    return pd.DataFrame(
        {
            "k": [1, 2, 3, 4],
            "g": ["a", "a", "b", "b"],
            "v": [10.0, 20.0, 30.0, 40.0],
        }
    )


def test_read_table_parquet_prunes_columns(tmp_path, frame):
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.Table.from_pandas(frame), p)
    ds = read_table(p, columns=["k", "v"])
    out = ds.to_pandas()
    assert sorted(out.columns) == ["k", "v"]
    assert sorted(out["k"]) == [1, 2, 3, 4]


def test_read_table_csv_and_json(tmp_path, frame):
    c = str(tmp_path / "t.csv")
    frame.to_csv(c, index=False)
    out = read_table(c, columns=["k", "g"]).to_pandas().sort_values("k")
    assert list(out.columns) == ["k", "g"]
    assert list(out["g"]) == ["a", "a", "b", "b"]

    j = str(tmp_path / "t.json")
    frame.to_json(j, orient="records", lines=True)
    out = read_table(j).to_pandas().sort_values("k")
    assert sorted(out.columns) == ["g", "k", "v"]
    assert list(out["v"]) == [10.0, 20.0, 30.0, 40.0]


def test_read_table_unknown_extension_raises(tmp_path):
    p = str(tmp_path / "t.xyz")
    open(p, "w").write("x")
    with pytest.raises(ValueError, match="cannot infer"):
        read_table(p)


def test_write_partitioned_parquet_roundtrip(tmp_path, frame):
    out = str(tmp_path / "out")
    write_partitioned_parquet(rd.from_pandas(frame), out, partition_col="g")
    # hive layout: one directory per partition value -> a resumable run can
    # skip finished partitions by listing
    subdirs = sorted(d for d in os.listdir(out) if d.startswith("g="))
    assert subdirs == ["g=a", "g=b"]
    back = read_table(out).to_pandas()
    assert len(back) == 4
    assert sorted(back["k"]) == [1, 2, 3, 4]


def test_convert_to_parquet(tmp_path, frame):
    c = str(tmp_path / "t.csv")
    frame.to_csv(c, index=False)
    out = convert_to_parquet(c, str(tmp_path / "pq"), columns=["k", "v"])
    back = read_table(out).to_pandas().sort_values("k")
    assert sorted(back.columns) == ["k", "v"]
    assert list(back["v"]) == [10.0, 20.0, 30.0, 40.0]


def test_metadata_free_schema_strips_pandas_blob(tmp_path, frame):
    """pandas-written parquet embeds b'pandas' schema metadata; Arrow
    schemas carrying metadata are unhashable, which makes every Ray Data
    schema unification warn and skip its dedup fast path. read_table must
    deliver metadata-free blocks."""
    import pyarrow.parquet as pq

    from raylink.sources import metadata_free_schema

    p = str(tmp_path / "t.parquet")
    frame.to_parquet(p)
    assert pq.read_schema(p).metadata  # precondition: blob present
    sch = metadata_free_schema(p, ["k", "v"])
    assert sch.metadata is None
    hash(sch)  # hashable == Ray's set(schemas) dedup works
    got = read_table(p, columns=["k", "v"]).take_batch(4, batch_format="pyarrow")
    assert got.schema.metadata is None


def test_from_arrow_blocks_strips_metadata(ray_session, frame):
    import pyarrow as pa

    from raylink.util import from_arrow_blocks

    t = pa.Table.from_pandas(frame)  # carries b'pandas' metadata
    assert t.schema.metadata
    ds = from_arrow_blocks(t, n_blocks=2)
    got = ds.take_batch(2, batch_format="pyarrow")
    assert got.schema.metadata is None
