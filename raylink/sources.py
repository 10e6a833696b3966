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
