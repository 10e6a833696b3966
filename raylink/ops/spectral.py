"""Distributed spectral analytics over embedding columns.

Power iteration computes the dominant eigenvector of the Gram matrix
XᵀX — the first principal direction of the (uncentered) embedding cloud,
the standard one-vector summary a curation pipeline uses to detect a
degenerate embedding space (one direction swallowing the variance) or to
whiten/deduplicate against the dominant axis (Mu et al. 2018,
"All-but-the-Top").

Exactness contract (the repo-wide device: integers end-to-end so the
DuckDB replay is bit-exact):

* Components quantize once to e6 micro-units (float32 → float64 → round,
  the same rule as ``grouped_vector_mean``).
* Each iteration is two exact integer mat-vecs with a TRUNCATING
  rescale between them — ``tdiv(a, b) = sign(a)·(|a| // |b|)`` — chosen
  because DuckDB's integer ``//`` truncates toward zero while Python's
  floors; the truncating form is the one both engines can state
  identically (Ray: ``np.sign(s)·(|s| // scale)``, SQL: ``s // scale``).
* The normalization divides by ``max|t|`` in arbitrary-precision driver
  ints (d values), so ``t·10⁶`` never overflows int64 on the Ray side
  and the SQL side casts through HUGEINT for the same product.

Scale shape: each iteration is ONE stateless map-only pass over the
corpus (X6·v then X6ᵀ·s' per batch, d int64 partials out) followed by a
d-row aggregate — the vector table never shuffles, the driver holds d
integers. k iterations re-read the input k times, which is the
checkpoint-friendly streaming shape (at 100 TB you either accept k scans
or persist the quantized matrix once with ``write_parquet`` and scan
that).

Overflow contract (stated, not silently truncated): with ``m = max|x6|``
per-batch partials need ``B·m·(d·m)`` < 2⁶³ and the global sum needs
``n·m·(d·m)`` < 2⁶³ — unit-norm-ish embeddings at e6 (m ≈ 10⁶, d = 64)
cap n at ~10⁵ rows per call; larger corpora pass ``scale=1000`` (e3),
which caps n at ~10¹¹. The rescale-by-``scale`` between half-steps is
what keeps the bound linear in n rather than quadratic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    from raylink.ops.kmeans import _to_matrix as _m

    return _m(col)


def power_iteration(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    iters: int = 3,
    scale: int = 1_000_000,
) -> pd.DataFrame:
    """Dominant eigenvector of XᵀX by ``iters`` rounds of exact-integer
    power iteration; returns a d-row DataFrame ``(dim, v_e6)`` with the
    direction in e6 fixed point, ``max|v_e6| = 10⁶``, 1-based dims.

    Start vector is all-ones at e6 (deterministic; sign of the output
    follows the start vector, the usual power-iteration convention).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    scale = int(scale)
    from ray.data.aggregate import Sum

    first = ds.limit(1).to_pandas()
    if len(first) == 0:
        raise ValueError("power_iteration requires a non-empty dataset")
    d = len(first[vec_col].iloc[0])
    dims = np.arange(1, d + 1, dtype=np.int64)
    v = np.full(d, scale, dtype=np.int64)

    src = ds.select_columns([vec_col])
    for _ in range(iters):
        v_ref = ray.put(v)

        def _partial(batch: pa.Table, _vr=v_ref) -> pa.Table:
            mat = _to_matrix(batch.column(vec_col)).astype(np.float64)
            x6 = np.round(mat * scale).astype(np.int64)
            vv: np.ndarray = ray.get(_vr)
            s = x6 @ vv
            sp = np.sign(s) * (np.abs(s) // scale)  # tdiv: matches SQL //
            t = x6.T @ sp
            return pa.table({"dim": pa.array(dims), "t": pa.array(t)})

        tdf = (
            src.map_batches(_partial, batch_format="pyarrow")
            .groupby("dim")
            .aggregate(Sum("t", alias_name="t"))
            .to_pandas()
            .sort_values("dim")
        )
        t = [int(x) for x in tdf["t"].to_numpy()]
        m = max(abs(x) for x in t)
        if m == 0:
            raise ValueError("power iteration collapsed to the zero vector")
        # driver-side exact normalization in Python ints (d values): the
        # t·scale product is the one quantity that can exceed int64
        v = np.array(
            [(1 if x >= 0 else -1) * ((abs(x) * scale) // m) for x in t],
            dtype=np.int64,
        )

    return pd.DataFrame({"dim": dims, "v_e6": v})


def power_iteration_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    iters: int = 3,
    scale: int = 1_000_000,
) -> str:
    """The DuckDB replay of :func:`power_iteration` — one CTE chain per
    iteration (join long-form components with the previous vector, two
    integer mat-vecs, truncating rescale, HUGEINT normalization)."""
    s = int(scale)
    parts = [
        f"""lt AS (
            SELECT vec_id,
                   generate_subscripts({vec_col}, 1)::BIGINT AS dim,
                   CAST(ROUND(unnest({vec_col})::DOUBLE * {s}) AS BIGINT) AS x6
            FROM {table}
        )""",
        f"v0 AS (SELECT DISTINCT dim, {s}::BIGINT AS v FROM lt)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""s{k} AS (
                SELECT lt.vec_id,
                       SUM(lt.x6 * v{k - 1}.v)::BIGINT // {s} AS sp
                FROM lt JOIN v{k - 1} USING (dim) GROUP BY lt.vec_id
            )"""
        )
        parts.append(
            f"""t{k} AS (
                SELECT lt.dim, SUM(lt.x6 * s{k}.sp)::BIGINT AS t
                FROM lt JOIN s{k} USING (vec_id) GROUP BY lt.dim
            )"""
        )
        parts.append(
            f"""v{k} AS (
                SELECT dim,
                       ((t::HUGEINT * {s}) //
                        (SELECT MAX(ABS(t)) FROM t{k}))::BIGINT AS v
                FROM t{k}
            )"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT dim, v AS v_e6 FROM v{iters} ORDER BY dim"
    )
