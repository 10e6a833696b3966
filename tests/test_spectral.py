"""power_iteration: exact-integer dominant eigenvector of XᵀX.

Three checks: (1) the integer result points along the true float
eigenvector on a matrix with a well-separated spectrum, (2) the DuckDB
CTE replay is bit-exact on random float32 vectors, (3) batch-split
invariance (the partial-sum exchange is order/partition free).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from raylink.ops.spectral import power_iteration, power_iteration_sql


def _table(mat: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array(
                [row for row in mat.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
        }
    )


def test_power_iteration_matches_float_eigenvector():
    rng = np.random.default_rng(7)
    # planted dominant direction: x_i = a_i * u + small noise
    d = 8
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    mat = np.outer(rng.normal(size=200), u) + 0.01 * rng.normal(size=(200, d))
    out = power_iteration(
        ray.data.from_arrow(_table(mat)), iters=6
    )
    v = out["v_e6"].to_numpy().astype(np.float64)
    v /= np.linalg.norm(v)
    # true dominant eigenvector of X^T X
    w, vecs = np.linalg.eigh(mat.T @ mat)
    top = vecs[:, -1]
    assert abs(float(np.dot(v, top))) > 0.9999


def test_power_iteration_sql_replay_bit_exact():
    rng = np.random.default_rng(11)
    mat = rng.normal(scale=0.3, size=(150, 12))
    t = _table(mat)
    got = power_iteration(
        ray.data.from_arrow(t), iters=3
    ).reset_index(drop=True)
    con = duckdb.connect()
    con.register("embeddings", t)
    want = (
        con.execute(power_iteration_sql(iters=3))
        .df()
        .astype({"dim": "int64", "v_e6": "int64"})
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["v_e6"].abs().max() == 1_000_000


def test_power_iteration_partition_invariant():
    rng = np.random.default_rng(3)
    mat = rng.normal(scale=0.3, size=(120, 6))
    a = power_iteration(ray.data.from_arrow(_table(mat)), iters=2)
    b = power_iteration(
        ray.data.from_arrow(_table(mat)).repartition(7), iters=2
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
