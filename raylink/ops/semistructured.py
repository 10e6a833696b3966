"""Semi-structured & incremental-snapshot operators.

Real event streams carry JSON property bags (`events.props` in the test
tables) and real corpora arrive as daily snapshots whose delta — added /
removed / changed rows — drives incremental reprocessing (the incremental
dedup and shard-skip machinery elsewhere in this repo). Both operators are
stateless vectorized map / single-exchange shapes.

* :func:`json_extract` — pull typed fields out of a JSON-string column.
  One stateless map pass; the parser is CPython's C ``json.loads`` per
  row (there is no pyarrow JSON-path kernel), the same
  loop-over-C-kernel shape as BM25's term counter. Missing keys, nulls
  and malformed documents yield typed nulls — never an exception — so
  the DuckDB replay (``props ->> 'k'``) matches bit-for-bit.
* :func:`snapshot_diff` — key-level delta between two table snapshots:
  ``(key, change)`` with ``change ∈ {added, removed, changed}`` decided
  by equality of the compared columns. ONE hash exchange of both
  snapshots (``util.shuffle_merge``); unchanged rows — the overwhelming
  bulk of a daily snapshot — are dropped inside the merge kernel, so
  only the delta ever leaves a partition. SQL replay is a FULL OUTER
  JOIN with a CASE.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


_CASTS = {
    "int64": (pa.int64(), lambda v: int(v)),
    "float64": (pa.float64(), lambda v: float(v)),
    "string": (pa.string(), lambda v: v if isinstance(v, str) else json.dumps(v)),
    "bool": (pa.bool_(), lambda v: bool(v)),
}


def json_extract(
    ds: ray.data.Dataset,
    json_col: str,
    fields: dict[str, tuple[str, str]],
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Extract typed top-level fields from a JSON-string column.

    ``fields`` maps output column name → ``(json_key, type)`` with type
    one of ``int64 | float64 | string | bool``. Missing key / null row /
    malformed JSON → typed null (DuckDB ``->>`` semantics). ``keep_cols``
    are passed through (default: every non-JSON input column).
    """
    for name, (_, typ) in fields.items():
        if typ not in _CASTS:
            raise ValueError(f"unsupported type {typ!r} for field {name!r}")

    keep = keep_cols
    spec = list(fields.items())

    def _extract(batch: pa.Table) -> pa.Table:
        cols = {
            c: batch.column(c)
            for c in (keep if keep is not None else
                      [c for c in batch.column_names if c != json_col])
        }
        raw = batch.column(json_col).to_pylist()
        parsed = []
        for r in raw:
            if r is None:
                parsed.append(None)
                continue
            try:
                d = json.loads(r)
                parsed.append(d if isinstance(d, dict) else None)
            except (ValueError, TypeError):
                parsed.append(None)
        for name, (key, typ) in spec:
            patype, cast = _CASTS[typ]
            vals = []
            for d in parsed:
                v = None if d is None else d.get(key)
                vals.append(None if v is None else cast(v))
            cols[name] = pa.array(vals, type=patype)
        return pa.table(cols)

    cols_needed = (
        list(dict.fromkeys((keep or []) + [json_col]))
        if keep is not None
        else None
    )
    src = ds.select_columns(cols_needed) if cols_needed else ds
    return src.map_batches(_extract, batch_format="pyarrow")


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    id_col: str,
    compare_cols: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Delta between two snapshots keyed by ``id_col``:
    ``(id_col, change)`` rows with ``change`` = ``'added'`` (key only in
    ``new``), ``'removed'`` (only in ``old``), ``'changed'`` (present in
    both, any compared column differs). Equal rows emit nothing — the
    output is delta-sized, not snapshot-sized.

    Shape: ONE hash-of-key exchange of both snapshots; the comparison
    and the drop-equal filter run vectorized inside each partition's
    merge kernel. Keys must be unique per snapshot (the usual snapshot
    contract; duplicate keys raise in the kernel rather than silently
    mispairing).
    """
    from raylink.util import pa_type, shuffle_merge

    schema = old.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))
    cols = [id_col] + list(compare_cols)
    out_schema = pa.schema([(id_col, types[id_col]), ("change", pa.string())])

    def _diff(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        for side, df in (("old", ldf), ("new", rdf)):
            if df[id_col].duplicated().any():
                raise ValueError(
                    f"snapshot_diff: duplicate {id_col} in {side} snapshot"
                )
        m = ldf.merge(
            rdf, on=id_col, how="outer", suffixes=("_o", "_n"),
            indicator="_which",
        )
        change = np.where(
            m["_which"] == "left_only",
            "removed",
            np.where(m["_which"] == "right_only", "added", "changed"),
        ).astype(object)
        both = (m["_which"] == "both").to_numpy()
        same = np.ones(len(m), dtype=bool)
        for c in compare_cols:
            a, b = m[f"{c}_o"], m[f"{c}_n"]
            eq = (a == b) | (a.isna() & b.isna())
            same &= eq.to_numpy()
        keep = ~(both & same)
        out = pd.DataFrame(
            {id_col: m[id_col].to_numpy(), "change": change}
        )[keep]
        return out

    return shuffle_merge(
        old.select_columns(cols),
        new.select_columns(cols),
        [id_col],
        [id_col],
        _diff,
        out_schema,
        num_partitions=num_partitions,
        left_schema=pa.schema([(c, types[c]) for c in cols]),
        right_schema=pa.schema([(c, types[c]) for c in cols]),
    )
