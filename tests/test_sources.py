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


def _make_tar(path, members):
    import io
    import tarfile

    with tarfile.open(path, "w") as tf:
        d = tarfile.TarInfo(name="subdir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        for name, data in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))


def test_read_binary_shards_rows_and_filter(ray_session, tmp_path):
    from raylink.sources import read_binary_shards

    p1 = str(tmp_path / "s1.tar")
    p2 = str(tmp_path / "s2.tar")
    _make_tar(p1, [("a.txt", b"hello"), ("a.bin", b"\x00\x01"), ("b.txt", b"x")])
    _make_tar(p2, [("dir/c.txt", b"deep")])
    got = (
        read_binary_shards([p1, p2])
        .to_pandas()
        .sort_values(["shard", "member"])
        .reset_index(drop=True)
    )
    assert got["member"].tolist() == ["a.bin", "a.txt", "b.txt", "dir/c.txt"]
    assert got["data"].tolist() == [b"\x00\x01", b"hello", b"x", b"deep"]
    only_txt = read_binary_shards([p1, p2], member_filter=".txt").to_pandas()
    assert sorted(only_txt["member"].tolist()) == ["a.txt", "b.txt", "dir/c.txt"]


def test_read_webdataset_groups_samples(ray_session, tmp_path):
    from raylink.sources import read_webdataset

    p = str(tmp_path / "wds.tar")
    _make_tar(
        p,
        [
            ("000.jpg", b"JPG0"),
            ("000.json", b"{}"),
            ("001.jpg", b"JPG1"),  # no .json for 001 -> null
            ("002.cls.txt", b"7"),  # key splits at FIRST dot
        ],
    )
    got = (
        read_webdataset([p], exts=["jpg", "json"])
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert got["key"].tolist() == ["000", "001", "002"]
    assert got["jpg"].tolist() == [b"JPG0", b"JPG1", None]
    assert got["json"].tolist() == [b"{}", None, None]


def test_tar_ingest_decode_parity(ray_session, tmp_path):
    """Decoding through the tar path must yield the SAME pixels as the
    direct-table path (the multimodal_decode_tar gate's parity claim)."""
    import io
    import tarfile

    from raylink.ops.multimodal import decode_images, fake_media_table
    from raylink.sources import read_binary_shards

    media = fake_media_table(24, seed=42)
    imgs = [r for r in media.to_pylist() if r["kind"] == "image"]
    p = str(tmp_path / "imgs.tar")
    with tarfile.open(p, "w") as tf:
        for r in imgs:
            info = tarfile.TarInfo(name=f"{r['media_id']:06d}.{r['format']}")
            info.size = len(r["payload"])
            info.mtime = 0
            tf.addfile(info, io.BytesIO(r["payload"]))

    def _to_media(batch):
        ids = [int(m.split(".")[0]) for m in batch.column("member").to_pylist()]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": batch.column("data"),
            }
        )

    via_tar = (
        decode_images(
            read_binary_shards([p]).map_batches(_to_media, batch_format="pyarrow"),
            dim=8,
            fake=False,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    direct = (
        decode_images(
            rd.from_arrow(media).filter(expr="kind == 'image'").select_columns(
                ["media_id", "payload"]
            ),
            dim=8,
            fake=False,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert via_tar["media_id"].tolist() == direct["media_id"].tolist()
    for a, b in zip(via_tar["feat"], direct["feat"]):
        assert (a == b).all()
