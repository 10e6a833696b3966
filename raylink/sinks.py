"""Resumable partitioned-parquet sink.

``CheckpointManager.stage`` (checkpoint.py) resumes at STAGE granularity —
all-or-nothing per stage. At 100 TB a killed job should not rewrite the
90% of output partitions that already finished, so this sink owns the
finer grain: one DIRECTORY per partition key, each written atomically
(tmp dir → fsync'd manifest → rename), so a partition either exists
complete-with-manifest or not at all. A re-run lists the finished keys,
broadcasts them, filters them out of the input with a stateless map, and
writes only the remainder — nothing corpus-scale touches the driver
(the finished-key set is #partitions-sized, the same order as the tile
plans the flagship already broadcasts).

Layout::

    root/
      <key>=<value>/           one dir per partition key value
        part-000.parquet
        _MANIFEST.json         {rows, bytes, files} — written LAST
      _tmp-<value>-<pid>/      crash leftovers; ignored by readers,
                               cleared by the next writer of that key

Each partition is written INSIDE the map task that owns it (the
sessionize/shuffle_merge exchange routes every key's rows to exactly one
task), so worker crashes can't interleave two writers on one directory —
the rename is the commit point. Skew bound: the hottest key's rows must
fit one task (the engine's standard sessionize contract).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

_MANIFEST = "_MANIFEST.json"


def _part_dir(root: str, by_col: str, value) -> str:
    return os.path.join(root, f"{by_col}={value}")


def finished_keys(root: str, by_col: str) -> list[str]:
    """Partition key values (as strings) with a committed manifest."""
    if not os.path.isdir(root):
        return []
    out = []
    prefix = f"{by_col}="
    for d in sorted(os.listdir(root)):
        if d.startswith(prefix) and os.path.exists(
            os.path.join(root, d, _MANIFEST)
        ):
            out.append(d[len(prefix):])
    return out


def write_partitioned(
    ds: ray.data.Dataset,
    root: str,
    by_col: str,
    skip_finished: bool = True,
    num_partitions: int | None = None,
) -> dict:
    """Write ``ds`` as one atomically-committed parquet directory per
    distinct ``by_col`` value; return ``{"written": [...], "skipped":
    [...], "rows_written": n}``. With ``skip_finished`` (default), keys
    that already carry a committed ``_MANIFEST.json`` under ``root`` are
    filtered out of the INPUT (broadcast set + stateless map — no
    exchange spent on rows that won't be written), which makes a killed
    run safely re-runnable: finished partitions are skipped byte-for-byte
    untouched, partial tmp dirs are overwritten by their key's new owner
    task. Keys are stringified for directory names (hive-style
    ``by=value``); the column itself still rides inside the files.
    """
    from raylink.util import pa_type, sorted_partition_apply

    os.makedirs(root, exist_ok=True)
    done = set(finished_keys(root, by_col)) if skip_finished else set()
    done_ref = ray.put(np.array(sorted(done), dtype=object))

    schema = ds.schema()
    in_schema = pa.schema(
        [(n, pa_type(t)) for n, t in zip(schema.names, schema.types)]
    )

    def _drop_done(batch: pa.Table) -> pa.Table:
        dn = ray.get(done_ref)
        if len(dn) == 0:
            return batch
        keys = np.asarray(
            [str(v) for v in batch.column(by_col).to_pylist()], dtype=object
        )
        return batch.filter(pa.array(~np.isin(keys, dn)))

    if done:
        ds = ds.map_batches(_drop_done, batch_format="pyarrow")

    # route all rows of a key to ONE task (hash exchange), then each task
    # writes its keys' directories atomically and emits receipt rows
    from raylink.ops.dedup import _default_partitions, _mix64

    nparts = num_partitions or _default_partitions()
    P = np.uint64(1 << 31)

    def _tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_pid", pa.array([], pa.int64()))
        keys = np.asarray(
            [str(v) for v in batch.column(by_col).to_pylist()], dtype=object
        )
        # deterministic cross-process key hash (Python's hash() is
        # per-process salted): md5 once per DISTINCT key, scattered back
        import hashlib

        uniq, inv = np.unique(keys, return_inverse=True)
        hu = np.array(
            [
                int.from_bytes(
                    hashlib.md5(k.encode()).digest()[:8], "little"
                )
                for k in uniq
            ],
            dtype=np.uint64,
        )
        pid = (_mix64(hu[inv]) % P).astype(np.int64)
        return batch.append_column("_pid", pa.array(pid)).replace_schema_metadata(None)

    receipt_schema = pa.schema(
        [("key", pa.string()), ("rows", pa.int64()), ("bytes", pa.int64())]
    )

    def _write_part(part: pa.Table) -> pa.Table:
        tbl = part.drop_columns(["_pid"])
        keys = np.asarray(
            [str(v) for v in tbl.column(by_col).to_pylist()], dtype=object
        )
        out_keys, out_rows, out_bytes = [], [], []
        for val in np.unique(keys):
            sub = tbl.filter(pa.array(keys == val))
            pdir = _part_dir(root, by_col, val)
            tmp = os.path.join(root, f"_tmp-{val}-{os.getpid()}")
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp)
            fpath = os.path.join(tmp, "part-000.parquet")
            pq.write_table(sub, fpath)
            man = {
                "rows": sub.num_rows,
                "bytes": os.path.getsize(fpath),
                "files": ["part-000.parquet"],
            }
            with open(os.path.join(tmp, _MANIFEST), "w") as f:
                json.dump(man, f)
                f.flush()
                os.fsync(f.fileno())
            if os.path.isdir(pdir):  # stale partial from a killed run
                shutil.rmtree(pdir)
            os.replace(tmp, pdir)  # commit point
            out_keys.append(str(val))
            out_rows.append(sub.num_rows)
            out_bytes.append(man["bytes"])
        return pa.table(
            {
                "key": pa.array(out_keys, pa.string()),
                "rows": pa.array(out_rows, pa.int64()),
                "bytes": pa.array(out_bytes, pa.int64()),
            }
        )

    tagged_schema = pa.schema(list(in_schema) + [pa.field("_pid", pa.int64())])
    _ = tagged_schema  # routing schema documented; receipts carry results
    receipts = sorted_partition_apply(
        ds.map_batches(_tag, batch_format="pyarrow").repartition(nparts),
        "_pid",
        _write_part,
        receipt_schema,
    ).to_pandas()
    return {
        "written": sorted(receipts["key"].tolist()),
        "skipped": sorted(done),
        "rows_written": int(receipts["rows"].sum()),
    }


def read_partitioned(root: str, by_col: str) -> ray.data.Dataset:
    """Read back only the COMMITTED partitions (manifest present)."""
    files = []
    for k in finished_keys(root, by_col):
        pdir = os.path.join(root, f"{by_col}={k}")
        man = json.load(open(os.path.join(pdir, _MANIFEST)))
        files += [os.path.join(pdir, f) for f in man["files"]]
    if not files:
        raise FileNotFoundError(f"no committed partitions under {root}")
    return ray.data.read_parquet(files)
