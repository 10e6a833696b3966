"""Mergeable streaming sketches: HyperLogLog distinct counting and
Count-Min heavy hitters.

Both sketches are chosen for the property Ray Data actually needs:
ORDER-INDEPENDENCE. A sketch whose state depends on stream order
(Misra–Gries / SpaceSaving) gives different answers under Ray's
nondeterministic batch boundaries; HLL registers are per-register MAXes
and CMS counters are per-slot SUMs, so any batching/partitioning yields
bit-identical sketch state — which is also what makes them SQL-gateable.

Scale shape (the whole point of a sketch): per-batch partial state
(≤2^p rows for HLL, ≤depth×width rows for CMS) → ONE tiny groupby
exchange of partials → fixed-size state to the driver. The corpus is
touched in one streaming pass; nothing value-cardinality-sized ever
moves. Hashes are DuckDB's ``md5_number_lower`` masked to 63 bits (the
``ops/dedup.py`` replay convention) so the correctness gate recomputes
every register and counter bit-exactly.

The reference has no sketch surface; this extends the
training-data-pipeline toolkit (corpus stats at 10¹²-row scale: distinct
url/user counts, hot-key discovery for salting decisions).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

__all__ = [
    "hll_registers",
    "hll_estimate",
    "cms_counters",
    "cms_estimate",
    "cms_heavy_hitters",
]

_MASK63 = (1 << 63) - 1


def _md5_hash63(values, prefix: str = "") -> np.ndarray:
    """63-bit md5 hash of ``str(v)`` (optionally ``f"{prefix}|{v}"``),
    matching DuckDB ``md5_number_lower(CAST(v AS VARCHAR)) & (2^63-1)``
    (or with ``CAST(i AS VARCHAR) || '|' || ...``). The per-row loop wraps
    hashlib's C md5 — the replayability requirement pins the hash, and
    sketch inputs are one pass over a projected single column."""
    pre = f"{prefix}|" if prefix else ""
    out = np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(f"{pre}{v}".encode()).digest()[8:16], "little"
            )
            & _MASK63
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )
    return out


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (branchless CLZ by halving
    shifts) — float ``log2`` is NOT exact here: log2(2^51 - 1) rounds to
    51.0 in float64, off-by-one at every near-power boundary."""
    x = x.astype(np.uint64)
    bl = np.zeros(len(x), dtype=np.int64)
    cur = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = cur >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        cur[big] >>= np.uint64(shift)
    bl[x > 0] += 1
    return bl


def hll_registers(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> ray.data.Dataset:
    """HyperLogLog register table ``(reg, max_rank)`` over ``col`` with
    ``m = 2^p`` registers: reg = top p bits of the 63-bit hash, rank =
    leading zeros of the remaining ``w = 63-p`` bits + 1. Only populated
    registers are emitted. Per-batch partial max → one ≤m-row groupby
    max; merge = MAX, so the table is independent of batching and
    partitioning."""
    if not (4 <= p <= 18):
        raise ValueError("p must be in [4, 18]")
    w = 63 - p

    def _partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        if not vals:
            return pa.table(
                {"reg": pa.array([], type=pa.int64()),
                 "max_rank": pa.array([], type=pa.int64())}
            )
        h = _md5_hash63(vals)
        reg = (h >> np.uint64(w)).astype(np.int64)
        rem = h & np.uint64((1 << w) - 1)
        rank = w - _bit_length_u64(rem) + 1
        df = pd.DataFrame({"reg": reg, "max_rank": rank})
        out = df.groupby("reg", as_index=False, sort=False)["max_rank"].max()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Max

    return (
        ds.select_columns([col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("max_rank", alias_name="max_rank"))
    )


def hll_estimate(registers: "pd.DataFrame", p: int = 12) -> float:
    """Standard HLL estimate (Flajolet et al. 2007) from the populated
    register table, with the small-range linear-counting correction.
    Driver-side arithmetic over ≤2^p integers."""
    m = 1 << p
    ranks = np.zeros(m, dtype=np.int64)
    ranks[registers["reg"].to_numpy()] = registers["max_rank"].to_numpy()
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / np.sum(np.exp2(-ranks.astype(np.float64)))
    zeros = int(np.count_nonzero(ranks == 0))
    if raw <= 2.5 * m and zeros > 0:
        return float(m * np.log(m / zeros))
    return float(raw)


def cms_counters(
    ds: ray.data.Dataset, col: str, depth: int = 4, width: int = 1024
) -> ray.data.Dataset:
    """Count-Min counter table ``(row, slot, cnt)``: row i's hash is
    ``md5("{i}|{v}")`` mod width. Per-batch partial counters → one
    ≤depth×width-row groupby sum; merge = SUM, so counters are exact sums
    of per-value frequencies regardless of batching."""

    def _partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        rows_, slots_, cnts_ = [], [], []
        for i in range(depth):
            if vals:
                h = _md5_hash63(vals, prefix=str(i)) % np.uint64(width)
                c = np.bincount(h.astype(np.int64), minlength=width)
                nz = np.flatnonzero(c)
            else:
                c = np.zeros(width, dtype=np.int64)
                nz = np.array([], dtype=np.int64)
            rows_.append(np.full(len(nz), i, dtype=np.int64))
            slots_.append(nz.astype(np.int64))
            cnts_.append(c[nz].astype(np.int64))
        return pa.table(
            {
                "row": pa.array(np.concatenate(rows_)),
                "slot": pa.array(np.concatenate(slots_)),
                "cnt": pa.array(np.concatenate(cnts_)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.select_columns([col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(["row", "slot"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def cms_estimate(
    counters: "pd.DataFrame", values, depth: int = 4, width: int = 1024
) -> np.ndarray:
    """Point-query estimates (min over rows) for ``values`` against a
    collected counter table. Overestimates only: est ≥ true, with the
    usual ε = e/width bound on the excess."""
    table = np.zeros((depth, width), dtype=np.int64)
    table[counters["row"].to_numpy(), counters["slot"].to_numpy()] = (
        counters["cnt"].to_numpy()
    )
    vals = list(values)
    ests = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(depth):
        h = (_md5_hash63(vals, prefix=str(i)) % np.uint64(width)).astype(np.int64)
        ests = np.minimum(ests, table[i, h])
    return ests


def cms_heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    candidates: str = "exact_distinct",
    local_top: int = 256,
) -> "pd.DataFrame":
    """Top-k values by CMS-estimated count, ties to the smaller value —
    deterministic given the data.

    ``candidates="exact_distinct"`` enumerates the distinct values with a
    groupby (deterministic — the gated mode; fine while distinct
    cardinality is shuffle-safe). ``candidates="local_topm"`` is the
    sketch-scale path: each batch nominates its ``local_top`` most
    frequent values, the union is estimated against the sketch — a
    value can only be missed if it is outside every batch's local top,
    impossible for any value with frequency > 1/local_top of some batch;
    the candidate set (not the counts) depends on batching, which is why
    the gate pins the exact_distinct mode."""
    ctr = cms_counters(ds, col, depth=depth, width=width).to_pandas()
    if candidates == "exact_distinct":
        cand = ds.select_columns([col]).groupby(col).count().to_pandas()[col]
        cand = list(cand)
    elif candidates == "local_topm":
        def _top(batch: pa.Table) -> pa.Table:
            s = pd.Series(batch.column(col).to_pylist()).value_counts()
            return pa.table({col: pa.array(list(s.index[:local_top]))})

        cand = list(
            pd.unique(
                ds.select_columns([col])
                .map_batches(_top, batch_format="pyarrow")
                .to_pandas()[col]
            )
        )
    else:  # pragma: no cover - spec error
        raise ValueError(f"unknown candidates mode {candidates!r}")
    est = cms_estimate(ctr, cand, depth=depth, width=width)
    out = pd.DataFrame({col: cand, "est_cnt": est.astype(np.int64)})
    out = out.sort_values(
        ["est_cnt", col], ascending=[False, True], kind="stable"
    ).head(k)
    return out.reset_index(drop=True)


def grouped_hll_registers(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    p: int = 12,
) -> ray.data.Dataset:
    """Per-GROUP HyperLogLog register table
    ``(group_col, reg, max_rank)`` — the mergeable approximate-distinct
    sketch :func:`raylink.ops.relational.grouped_nunique` and
    ``column_profile`` name as their corpus-scale fallback, made real.
    Same 63-bit md5 device as :func:`hll_registers` (so the DuckDB
    replay is bit-exact on the REGISTERS), partial-maxed per batch and
    merged with one ``groupby(group, reg).max`` — the exchange moves at
    most ``groups × 2^p`` partial rows per batch, never values.
    Feed the per-group slices to :func:`hll_estimate` for the counts.
    """
    if not (4 <= p <= 18):
        raise ValueError("p must be in [4, 18]")
    w = 63 - p

    def _partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_pylist()
        if not vals:
            return pa.table(
                {
                    group_col: pa.array([], type=batch.column(group_col).type),
                    "reg": pa.array([], type=pa.int64()),
                    "max_rank": pa.array([], type=pa.int64()),
                }
            )
        h = _md5_hash63(vals)
        reg = (h >> np.uint64(w)).astype(np.int64)
        rem = h & np.uint64((1 << w) - 1)
        rank = w - _bit_length_u64(rem) + 1
        df = pd.DataFrame(
            {
                group_col: batch.column(group_col).to_pandas(),
                "reg": reg,
                "max_rank": rank,
            }
        )
        out = df.groupby([group_col, "reg"], as_index=False, sort=False)[
            "max_rank"
        ].max()
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    from ray.data.aggregate import Max

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby([group_col, "reg"])
        .aggregate(Max("max_rank", alias_name="max_rank"))
    )
