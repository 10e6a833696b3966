"""Source/sink helpers: one format-dispatching reader with column
pruning, and a partitioned parquet writer for resumable output.

The engine's canonical storage format is parquet (`ray.data.read_parquet`
with `columns=` so only needed columns leave storage); CSV and JSONL are
supported as ingest formats for interop. CSV/JSON readers cannot prune
columns at the storage layer (row-oriented formats), so `columns=` there
projects immediately after parse — the scan still reads whole rows, which
is the format's cost, not the engine's; the docstring-level advice is to
convert to parquet once (`convert_to_parquet`) and run pipelines off
that.
"""

from __future__ import annotations

import os

import ray
import ray.data


_EXT_FORMAT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
}


def _infer_format(path: str) -> str:
    base = path.rstrip("/")
    ext = os.path.splitext(base)[1].lower()
    if ext in _EXT_FORMAT:
        return _EXT_FORMAT[ext]
    if os.path.isdir(base):
        for entry in sorted(os.listdir(base)):
            e2 = os.path.splitext(entry)[1].lower()
            if e2 in _EXT_FORMAT:
                return _EXT_FORMAT[e2]
            # hive-partitioned layout: one level of key=value subdirs
            sub = os.path.join(base, entry)
            if "=" in entry and os.path.isdir(sub):
                for inner in sorted(os.listdir(sub)):
                    e3 = os.path.splitext(inner)[1].lower()
                    if e3 in _EXT_FORMAT:
                        return _EXT_FORMAT[e3]
    raise ValueError(
        f"cannot infer table format for {path!r}; pass format= explicitly"
    )


def metadata_free_schema(path: str, columns: list[str] | None = None):
    """A metadata-stripped Arrow schema for a parquet file/dir.

    Pandas-written parquet embeds a ``b'pandas'`` schema-metadata blob;
    pyarrow Schemas carrying metadata are UNHASHABLE, so every downstream
    Ray Data schema unification (sorts, unions) logs ``Failed to hash the
    schemas (for deduplication): unhashable type: 'dict'`` and skips its
    dedup fast path. Passing this as ``read_parquet(schema=...)`` strips
    the metadata at the storage layer, before any block exists. Returns
    None when the footer cannot be read (caller falls back to the raw
    read)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        sch = pq.ParquetDataset(path).schema
        names = columns if columns is not None else sch.names
        return pa.schema([sch.field(c).remove_metadata() for c in names])
    except Exception:
        return None


def read_table(
    path: str,
    format: str | None = None,
    columns: list[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Read a table as a Dataset, dispatching on extension (or explicit
    ``format``): parquet (column-pruned at the storage layer), csv, or
    json/jsonl. For csv/json, ``columns`` is applied as an immediate
    projection after parse (row formats cannot skip columns on read)."""
    fmt = format or _infer_format(path)
    if fmt == "parquet":
        if "schema" not in kwargs:
            sch = metadata_free_schema(path, columns)
            if sch is not None:
                kwargs["schema"] = sch
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    if fmt == "csv":
        ds = ray.data.read_csv(path, **kwargs)
    elif fmt == "json":
        ds = ray.data.read_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_binary_shards(
    paths: "str | list[str]",
    member_filter: "str | None" = None,
) -> ray.data.Dataset:
    """Tar-shard binary ingest (the webdataset storage convention): each
    ``.tar`` shard becomes ``(shard, member, data)`` rows feeding the
    decode actor pools (:mod:`raylink.ops.multimodal`).

    Scale shape: ``read_binary_files`` schedules ONE task per shard
    (shards are the parallelism unit — the webdataset contract sizes them
    ~100 MB–1 GB precisely so this is true), and the expansion map runs
    with ``batch_size=1`` so a task never holds more than one shard's
    payload plus its members; downstream stages see ordinary binary-column
    blocks that the streaming executor spills as usual. Members are
    expanded with the stdlib ``tarfile`` over an in-memory view — no
    temp-file extraction.

    ``member_filter``: optional suffix filter (e.g. ``".jpg"``) applied
    inside the expansion so non-matching payloads never leave the read
    task.
    """
    import pyarrow as pa

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def _expand(batch: pa.Table) -> pa.Table:
        shards: list[str] = []
        members: list[str] = []
        datas: list[bytes] = []
        for p, blob in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            for name, data in _iter_tar_members(blob, member_filter):
                shards.append(p)
                members.append(name)
                datas.append(data)
        return pa.table(
            {
                "shard": pa.array(shards, type=pa.string()),
                "member": pa.array(members, type=pa.string()),
                "data": pa.array(datas, type=pa.binary()),
            }
        )

    return ds.map_batches(_expand, batch_format="pyarrow", batch_size=1)


def _iter_tar_members(blob: bytes, member_filter: "str | None" = None):
    """Yield ``(name, data)`` for every regular file in an in-memory tar
    blob (stdlib tarfile, no temp-file extraction)."""
    import io
    import tarfile

    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        for m in tf.getmembers():
            if not m.isfile():
                continue
            if member_filter and not m.name.endswith(member_filter):
                continue
            f = tf.extractfile(m)
            yield m.name, (f.read() if f is not None else b"")


def read_webdataset(
    paths: "str | list[str]",
    exts: list[str],
) -> ray.data.Dataset:
    """Webdataset sample grouping over tar shards: members named
    ``<key>.<ext>`` (split at the FIRST dot, the webdataset rule) are
    pivoted into one row per sample with one binary column per requested
    extension (null when the sample lacks it). Samples never span shards
    (the webdataset contract), so grouping happens inside each shard's
    expansion task — zero shuffle. Emits ``(shard, key, *exts)``.
    """
    import pyarrow as pa

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def _expand_pivot(batch: pa.Table) -> pa.Table:
        # expansion AND grouping in ONE task per shard: a sample's members
        # are guaranteed co-located only within the shard, and composing
        # here means no downstream block slicing can split a sample
        samples: dict[tuple[str, str], dict[str, bytes]] = {}
        order: list[tuple[str, str]] = []
        for p, blob in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            for name, data in _iter_tar_members(blob):
                base = name.rsplit("/", 1)[-1]
                key, _, ext = base.partition(".")
                sk = (p, key)
                if sk not in samples:
                    samples[sk] = {}
                    order.append(sk)
                if ext in exts:
                    samples[sk][ext] = data
        cols: dict[str, pa.Array] = {
            "shard": pa.array([s for s, _ in order], type=pa.string()),
            "key": pa.array([k for _, k in order], type=pa.string()),
        }
        for e in exts:
            cols[e] = pa.array(
                [samples[sk].get(e) for sk in order], type=pa.binary()
            )
        return pa.table(cols)

    return ds.map_batches(_expand_pivot, batch_format="pyarrow", batch_size=1)


def write_partitioned_parquet(
    ds: ray.data.Dataset,
    path: str,
    partition_col: str | None = None,
    num_rows_per_file: int | None = None,
) -> str:
    """Resumable sink: write the Dataset as a parquet directory, optionally
    hive-partitioned by ``partition_col`` (one subdirectory per value — a
    failed run re-lists the directory and skips finished partitions) and
    bounded per-file row counts so no output file becomes a multi-GB
    straggler. Returns ``path``."""
    kwargs = {}
    if num_rows_per_file is not None:
        kwargs["num_rows_per_file"] = num_rows_per_file
    if partition_col is not None:
        kwargs["partition_cols"] = [partition_col]
    ds.write_parquet(path, **kwargs)
    return path


def convert_to_parquet(
    path: str,
    out_dir: str,
    format: str | None = None,
    columns: list[str] | None = None,
) -> str:
    """One-time ingest: read a csv/json table and land it as parquet so
    every later pipeline gets storage-level column pruning."""
    ds = read_table(path, format=format, columns=columns)
    ds.write_parquet(out_dir)
    return out_dir
