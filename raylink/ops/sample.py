"""Distributed selection and sampling primitives for training-data curation.

Three operators a 100-TB pipeline needs that the reference has no analogue
for (they extend the LLM-data-ops suite alongside ``ops/dedup.py`` /
``ops/text.py``):

  - :func:`select_kth` — exact k-th smallest of an integer column via
    iterated bucket histograms: O(log_B(range)) streaming passes, the
    driver holds only a B-bucket count array per pass, nothing sorts and
    nothing shuffles.  This is the scale path for "give me the exact
    90th-percentile quality score over 10^12 documents" — a global
    ``sort`` would be an all-to-all exchange of the full table; this is a
    handful of map-only passes with a 512 KiB driver footprint.
  - :func:`quantile_filter` — keep rows at/above the p-quantile of a score
    column (threshold-by-VALUE, so ties are kept deterministically and
    the output is independent of partitioning).
  - :func:`stratified_sample` — deterministic per-group uniform sample
    without replacement: the n rows with the smallest multiplicative hash
    of their id per group.  Hash-ordered selection makes the sample a pure
    function of the data (resumable, oracle-replayable in SQL) and the
    per-batch partial top-n bounds the shuffle to <= n rows per group per
    batch.

The hash is Knuth multiplicative (mod 2^32) with one xor-fold — chosen
over a stronger mixer because DuckDB can replay it exactly with HUGEINT
arithmetic (see ``__ray_entry__.oracle_sql``'s ``stratified_sample``
entry), keeping the operator inside the bit-exact correctness gate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(0xFFFFFFFF)


def id_hash(ids: np.ndarray) -> np.ndarray:
    """h = fold16(Knuth32(id)): uint64 in [0, 2^32), SQL-replayable as
    ``xor((id::HUGEINT * 2654435761) % 4294967296, (...) >> 16)``."""
    h = (ids.astype(np.uint64) * _KNUTH) & _M32
    return h ^ (h >> np.uint64(16))


def _column_i64(batch: pa.Table, col: str) -> np.ndarray:
    return batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)


def select_kth(
    ds: ray.data.Dataset,
    value_col: str,
    k: int,
    num_buckets: int = 1 << 16,
) -> int:
    """Exact k-th smallest (1-indexed) value of an int64 column.

    One aggregate pass for (count, min, max), then bucket-histogram
    bisection: each pass maps the column to ``num_buckets`` equal-width
    buckets over the current [lo, hi] range, emits per-batch SPARSE
    (bucket, count) partial rows (the ``histogram_pass`` pattern,
    ``active_streaming.py:340``), sums them on the driver, and recurses
    into the bucket containing rank k.  Converges in
    ceil(log_B(hi - lo + 1)) passes — 1 pass for any range <= 2^16,
    4 passes for the full int64 domain.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    stats = ds.aggregate(
        Count(), Min(value_col, alias_name="lo"), Max(value_col, alias_name="hi")
    )
    n, lo, hi = int(stats["count()"]), int(stats["lo"]), int(stats["hi"])
    if k > n:
        raise ValueError(f"k={k} exceeds row count {n}")
    _BIAS = 1 << 63  # two's-complement bias: int64 x <-> uint64 x + 2^63
    while hi > lo:
        span = hi - lo + 1  # Python int: exact even when hi-lo spans > int64
        width = max(1, -(-span // num_buckets))  # ceil
        nb = -(-span // width)
        clo, chi = lo, hi  # bind loop state for the closure
        # offsets computed in uint64 (biased) — a plain int64 (v - clo)
        # wraps when the column span exceeds the int64 range, yielding
        # negative bucket indices (ADVICE r3)
        uclo = np.uint64(clo + _BIAS)
        ucw = np.uint64(width)

        def _hist(batch: pa.Table) -> pa.Table:
            v = _column_i64(batch, value_col)
            v = v[(v >= clo) & (v <= chi)]
            if len(v) == 0:
                return pa.table(
                    {"b": pa.array([], type=pa.int64()), "c": pa.array([], type=pa.int64())}
                )
            u = v.astype(np.uint64) + np.uint64(_BIAS)  # wraps negatives up
            idx = ((u - uclo) // ucw).astype(np.int64)
            counts = np.bincount(idx, minlength=nb)
            nz = np.flatnonzero(counts)
            return pa.table(
                {"b": pa.array(nz.astype(np.int64)), "c": pa.array(counts[nz].astype(np.int64))}
            )

        parts = ds.map_batches(_hist, batch_format="pyarrow").to_pandas()
        agg = parts.groupby("b")["c"].sum().sort_index()
        cum = agg.cumsum()
        pos = int(np.searchsorted(cum.to_numpy(), k, side="left"))
        bucket = int(cum.index[pos])
        k -= int(cum.iloc[pos - 1]) if pos > 0 else 0
        lo, hi = lo + bucket * width, min(hi, lo + (bucket + 1) * width - 1)
    return lo


def quantile_filter(
    ds: ray.data.Dataset,
    value_col: str,
    p: float,
    num_buckets: int = 1 << 16,
) -> tuple[int, ray.data.Dataset]:
    """Keep rows with ``value_col`` >= the p-quantile (threshold = the
    ceil(p*n)-th smallest VALUE, so ties at the threshold all survive and
    the result is partitioning-independent).  Returns (threshold, ds)."""
    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0, 1], got {p}")
    n = ds.count()
    # ceil(p*n) with a float-noise guard: 0.9*500 is 450.000000000000006
    # in binary, which would ceil to 451 while SQL's DECIMAL 0.9*500
    # ceils to 450 — the epsilon keeps both sides on the same integer.
    k = max(1, int(math.ceil(p * n - 1e-9)))
    thr = select_kth(ds, value_col, k, num_buckets=num_buckets)

    def _keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column(value_col), pa.scalar(thr)))

    return thr, ds.map_batches(_keep, batch_format="pyarrow")


def stratified_sample(
    ds: ray.data.Dataset,
    group_col: str,
    id_col: str,
    n_per_group: int,
) -> ray.data.Dataset:
    """Deterministic per-group uniform sample: the ``n_per_group`` rows
    with the smallest (id_hash(id), id) per group.

    Map side appends the hash and pre-truncates each batch to its own
    per-group top-n (vectorized pandas groupby-head), so the single
    groupby exchange moves <= n rows per group per batch instead of the
    full table; the reduce side takes the global per-group top-n."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = id_hash(df[id_col].to_numpy()).astype(np.int64)
        df = df.sort_values(["_h", id_col], kind="stable")
        return df.groupby(group_col, sort=False).head(n_per_group)

    def _final(group: pd.DataFrame) -> pa.Table:
        out = group.sort_values(["_h", id_col], kind="stable").head(n_per_group)
        return pa.Table.from_pandas(out.drop(columns=["_h"]), preserve_index=False).replace_schema_metadata(None)

    partials = ds.map_batches(_partial, batch_format="pandas")
    return partials.groupby(group_col).map_groups(_final, batch_format="pandas")


def temperature_sample(
    ds: ray.data.Dataset,
    group_col: str,
    id_col: str,
    target_rows: int,
    alpha: float = 0.5,
) -> ray.data.Dataset:
    """Temperature-weighted multi-source mixing — the data-mixture sampler
    LLM pipelines run before training (sample source s with probability
    ∝ n_s^alpha; alpha < 1 up-weights small sources, the multilingual-
    sampling trick from mBERT/XLM-R and the Pile's source weighting).

    Per-source acceptance rates are derived from ONE tiny groupby
    (``|sources|`` rows to the driver): rate_s = min(1, target_rows ·
    n_s^alpha / Σ_t n_t^alpha / n_s), frozen to an integer e6 threshold.
    Rows are then kept by a pure hash rule — ``id_hash(id) % 1e6 <
    thr_s`` — which is a stateless map: no shuffle, no RNG state, stable
    under repartitioning/resume, coordination-free on any cluster slice
    (the split_by_hash scale argument).

    The expected sample size is target_rows (each source contributes
    ~n_s·rate_s); the realized count is binomial around it, as with any
    hash sampler. SQL parity: at alpha=0.5 the weights go through IEEE
    sqrt (correctly rounded, so numpy == DuckDB bit-exactly); other
    alphas ride pow's ~1-ulp agreement, absorbed by the e6 threshold
    rounding. Threshold arithmetic is documented in the oracle."""
    import math

    # per-batch partial counts -> driver fold: <= |groups| rows per batch
    # reach the driver, and no low-cardinality groupby exchange (Ray's
    # sort-based Aggregate emits schema-less empty partitions when group
    # cardinality < partition count — the executor-warning class)
    def _partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[group_col].value_counts()
        return pd.DataFrame({group_col: vc.index, "n": vc.to_numpy()})

    parts = ds.map_batches(_partial_counts, batch_format="pandas").to_pandas()
    folded = parts.groupby(group_col)["n"].sum()
    # deterministic accumulation order (sorted by group name); the oracle's
    # SUM order may differ — a ~1e-16 relative wobble the e6 threshold
    # rounding absorbs
    rows = sorted(zip(folded.index, folded.to_numpy()))
    weights = {g: float(n) ** alpha for g, n in rows}
    total_w = sum(w for _, w in sorted(weights.items()))
    thr = {
        g: int(math.floor(min(1.0, target_rows * weights[g] / total_w / n) * 1e6 + 0.5))
        for g, n in rows
    }

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        hv = id_hash(df[id_col].to_numpy()) % np.uint64(1_000_000)
        t = df[group_col].map(thr).to_numpy(dtype=np.int64)
        return df[hv.astype(np.int64) < t]

    return ds.map_batches(_keep, batch_format="pandas")


def split_by_hash(
    ds: ray.data.Dataset,
    id_col: str,
    test_pct: int = 10,
) -> ray.data.Dataset:
    """Deterministic train/test split: ``'test'`` iff
    ``id_hash(id) % 100 < test_pct``, else ``'train'``.

    A pure map stage — no shuffle, no RNG state: the assignment is a pure
    function of the row id, so it is stable under repartitioning, resume,
    and re-runs, and any slice of the corpus can be split independently on
    a 256-node cluster with zero coordination. SQL-replayable with the same
    HUGEINT expression as :func:`stratified_sample`'s oracle.
    """
    if not (0 <= test_pct <= 100):
        raise ValueError(f"test_pct must be in [0, 100], got {test_pct}")

    def _assign(batch: pa.Table) -> pa.Table:
        ids = _column_i64(batch, id_col)
        h = id_hash(ids) % np.uint64(100)
        split = np.where(h < np.uint64(test_pct), "test", "train")
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def group_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: dict[str, float],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact per-group discrete quantiles: for each group, the ELEMENT at
    0-based index ``ceil(q·n) − 1`` of the group's sorted values (DuckDB
    ``quantile_disc`` semantics, so the oracle replays it verbatim).
    ``qs`` maps output column name → q, e.g. ``{"p50": 0.5, "p90": 0.9}``.
    Returns one row per group: ``(group_col, n, *qs)``.

    Shape: rows route through ONE hash exchange on the group key (the
    sessionize ``_pid`` pattern — high-cardinality pid space keeps the
    range exchange's sampled boundaries collision-free), then each
    partition answers ALL its groups with one sort + factorize +
    vectorized fancy-index — no per-group Python loop, no global sort.
    Skew bound is the hottest group, same contract as sessionize. Exact
    element selection (not interpolation) keeps doubles bit-identical to
    the input, so the gate hashes them safely.
    """
    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import pa_type, sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    schema = ds.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(group_col).to_numpy(zero_copy_only=False)
        pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                group_col: batch.column(group_col),
                value_col: batch.column(value_col),
            }
        )

    names = list(qs)
    qvals = np.array([qs[c] for c in names], dtype=np.float64)

    def _quant(part: pa.Table) -> pa.Table:
        g = part.column(group_col).to_numpy(zero_copy_only=False)
        v = part.column(value_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((v, g))
        g, v = g[order], v[order]
        codes, uniq = pd.factorize(g, sort=False)  # sorted input: contiguous
        counts = np.bincount(codes)
        starts = np.cumsum(counts) - counts
        cols = {group_col: pa.array(uniq, type=types[group_col]),
                "n": pa.array(counts.astype(np.int64))}
        for name, q in zip(names, qvals):
            idx = np.maximum(np.ceil(q * counts).astype(np.int64) - 1, 0)
            cols[name] = pa.array(v[starts + idx], type=types[value_col])
        return pa.table(cols)

    out_schema = pa.schema(
        [(group_col, types[group_col]), ("n", pa.int64())]
        + [(name, types[value_col]) for name in names]
    )
    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    return sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _quant, out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def top_p_select(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    p_num: int,
    p_den: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Nucleus (top-p) selection per group: keep, per group, the minimal
    prefix of rows — ordered by score descending, id ascending — whose
    cumulative score reaches fraction ``p = p_num/p_den`` of the group's
    total score.  The data-mixing shape: "keep the highest-quality
    documents carrying 90% of each source's quality mass".

    Exactness contract: scores quantize to e6 micro-units per row BEFORE
    any summation (``v6 = llround(value·1e6)``, the ``rolling_sum``
    pattern), rows with ``v6 <= 0`` are dropped (mass must be positive),
    ``p`` is a RATIONAL so the per-group target ``ceil(tot·p_num/p_den)``
    is exact integer arithmetic, and the (v6 DESC, id ASC) tie order is
    total — the kept set is therefore partitioning- and order-independent
    and the SQL replay is bit-exact: ``cum - v6 < (tot*p_num + p_den - 1)
    // p_den`` under ``SUM(v6) OVER (PARTITION BY g ORDER BY v6 DESC,
    id)``.

    Shape: rows route through ONE hash exchange on the group key (the
    sessionize ``_pid`` pattern); each partition answers ALL its groups
    with one lexsort + factorize + cumsum — no per-group loop. Skew bound
    is the hottest group. Emits ``(group_col, id_col, v6)``.
    """
    if p_num < 1 or p_den < 1 or p_num > p_den:
        raise ValueError(f"need 0 < p_num/p_den <= 1, got {p_num}/{p_den}")
    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import pa_type, sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    schema = ds.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        v6 = np.round(v * 1e6).astype(np.int64)
        keep = v6 > 0
        pid = (_mix64(keys[keep].astype(np.uint64)) % P).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                group_col: pa.array(keys[keep], type=types[group_col]),
                id_col: batch.column(id_col).filter(pa.array(keep)),
                "v6": pa.array(v6[keep]),
            }
        )

    out_schema = pa.schema(
        [
            (group_col, types[group_col]),
            (id_col, types[id_col]),
            ("v6", pa.int64()),
        ]
    )

    def _select(part: pa.Table) -> pa.Table:
        g = part.column(group_col).to_numpy(zero_copy_only=False)
        v6 = part.column("v6").to_numpy(zero_copy_only=False)
        ids = part.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -v6, g))
        g, v6, ids = g[order], v6[order], ids[order]
        codes, _ = pd.factorize(g, sort=False)  # sorted: contiguous groups
        counts = np.bincount(codes)
        starts = np.cumsum(counts) - counts
        cum = np.cumsum(v6)
        base = np.concatenate(([0], cum[starts[1:] - 1])) if len(counts) > 1 else np.zeros(1, dtype=np.int64)
        cum = cum - base[codes]  # per-group inclusive cumulative, exact int64
        tot = cum[starts + counts - 1]
        # ceil(tot * p_num / p_den) in exact integer arithmetic; object
        # dtype guards the tot*p_num product against int64 overflow for
        # extreme group masses
        tgt = (tot.astype(object) * p_num + p_den - 1) // p_den
        target = np.array([int(t) for t in tgt], dtype=np.int64)
        keep = (cum - v6) < target[codes]
        return pa.table(
            {
                group_col: pa.array(g[keep], type=types[group_col]),
                id_col: pa.array(ids[keep], type=types[id_col]),
                "v6": pa.array(v6[keep]),
            }
        )

    tagged = ds.select_columns([group_col, id_col, value_col]).map_batches(
        _tag, batch_format="pyarrow"
    )
    return sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _select, out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def winsorize(
    ds: ray.data.Dataset,
    value_col: str,
    p_lo: float,
    p_hi: float,
    id_col: str,
    num_buckets: int = 1 << 16,
) -> tuple[int, int, ray.data.Dataset]:
    """Winsorize an e6-quantized column at its EXACT [p_lo, p_hi] quantile
    values: thresholds are the ceil(p·n)-th smallest v6 (the element, not
    an interpolation — :func:`select_kth`), then a stateless clip map.
    Returns ``(lo6, hi6, dataset)`` with rows ``(id_col, v6_w)``.

    Scale shape: two histogram-bisection threshold searches (O(log_B
    range) map-only passes each, 512 KiB driver footprint — the
    :func:`select_kth` contract) plus ONE clip map; no sort, no shuffle.
    The input lineage re-executes per pass, so feed it a cheap projection
    (a parquet read of two columns), not an expensive upstream pipeline.
    """
    if not (0.0 < p_lo <= p_hi <= 1.0):
        raise ValueError(f"need 0 < p_lo <= p_hi <= 1, got {p_lo}, {p_hi}")

    def _q6(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "v6": pa.array(np.round(v * 1e6).astype(np.int64)),
            }
        )

    q6 = ds.select_columns([id_col, value_col]).map_batches(
        _q6, batch_format="pyarrow"
    )
    n = q6.count()
    # float-noise epsilon: same device as quantile_filter (0.9*500 is
    # 450.000000000000006 in binary)
    k_lo = max(1, int(math.ceil(p_lo * n - 1e-9)))
    k_hi = max(1, int(math.ceil(p_hi * n - 1e-9)))
    lo6 = select_kth(q6, "v6", k_lo, num_buckets=num_buckets)
    hi6 = select_kth(q6, "v6", k_hi, num_buckets=num_buckets)

    def _clip(batch: pa.Table) -> pa.Table:
        v = batch.column("v6").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "v6_w": pa.array(np.clip(v, lo6, hi6)),
            }
        )

    return lo6, hi6, q6.map_batches(_clip, batch_format="pyarrow")


def negative_pairs(
    left: ray.data.Dataset,
    right_keys: np.ndarray,
    positives: ray.data.Dataset,
    left_col: str,
    right_col: str,
    n_neg: int = 3,
    n_trials: int | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Deterministic hash-based NEGATIVE sampling for match-model
    training: for every left key, up to ``n_neg`` right keys that are NOT
    among its true matches, chosen by a replayable integer hash (the
    stratified_sample Knuth-mix device) — no RNG state, so the sample is
    identical across runs, resumes, and the SQL oracle.

    Semantics (all integer, replayed bit-exactly by the ``negative_pairs``
    gate): trial ``t ∈ [0, n_trials)`` proposes
    ``idx = ((a·2654435761 + t·2246822519) mod 2³²) mod |R|``, i.e. right
    key ``sorted(right_keys)[idx]``; duplicate ``(a, b)`` proposals keep
    the MIN trial; true positives are removed by a distributed anti-join;
    the first ``n_neg`` survivors per ``a`` (by trial order) win. A left
    key whose trials collide more than ``n_trials − n_neg`` times yields
    fewer than ``n_neg`` rows — deterministic on both sides. ``left``
    must be key-distinct (duplicate left rows would double-count trials).

    Scale contract: ``right_keys`` is the BROADCAST small side (the
    right-key directory rides ``ray.put`` once, read per task — ~8 MB per
    million keys); positives and candidates flow through one anti-join
    exchange plus one per-``a`` ranking exchange. Keys must fit int64
    below 2³¹ so the uint64 hash cannot overflow (checked loudly).
    Returns ``(left_col, trial, right_col, rn)`` rows.
    """
    from raylink.ops.relational import anti_join
    from raylink.ops.window import windowed_rank

    R = np.sort(np.unique(np.asarray(right_keys, dtype=np.int64)))
    if len(R) == 0:
        raise ValueError("negative_pairs: empty right-key universe")
    m = n_trials if n_trials is not None else n_neg + 4
    nR = np.uint64(len(R))
    R_ref = ray.put(R)

    def _cand(batch: pa.Table) -> pa.Table:
        import ray as _ray

        Rk = _ray.get(R_ref)
        a = batch.column(left_col).to_numpy(zero_copy_only=False)
        if len(a) and (a.min() < 0 or a.max() >= 1 << 31):
            raise ValueError("negative_pairs: left keys must be in [0, 2^31)")
        aa = np.repeat(a.astype(np.uint64), m)
        tt = np.tile(np.arange(m, dtype=np.uint64), len(a))
        hv = (aa * np.uint64(2654435761) + tt * np.uint64(2246822519)) % np.uint64(
            1 << 32
        )
        b = Rk[(hv % nR).astype(np.int64)]
        df = pd.DataFrame(
            {left_col: aa.astype(np.int64), "trial": tt.astype(np.int64),
             right_col: b}
        )
        # same-(a,b) proposals keep the min trial — all of a's trials are
        # generated here, so this dedup is complete locally
        df = df.groupby([left_col, right_col], as_index=False)["trial"].min()
        return pa.Table.from_pandas(
            df[[left_col, "trial", right_col]], preserve_index=False
        )

    cands = left.select_columns([left_col]).map_batches(
        _cand, batch_format="pyarrow"
    )
    survivors = anti_join(
        cands,
        positives,
        [left_col, right_col],
        num_partitions=num_partitions,
    )
    ranked = windowed_rank(
        survivors, left_col, ["trial", right_col], out_col="rn",
        num_partitions=num_partitions,
    )
    return ranked.map_batches(
        lambda t: t.filter(pc.less_equal(t.column("rn"), pa.scalar(n_neg))),
        batch_format="pyarrow",
    )


def mad_outliers(
    ds: ray.data.Dataset,
    value_col: str,
    id_col: str,
    c: int = 3,
    num_buckets: int = 1 << 16,
) -> tuple[int, int, ray.data.Dataset]:
    """Robust (median/MAD) outlier flags, integer-exact: median = the
    ``(n+1)//2``-th smallest e6-quantized value (lower median — an
    element, never an interpolation), MAD = the same order statistic of
    ``|v6 − median|``, and a row is an outlier iff
    ``|v6 − median| > c · MAD``. Every comparison is int64, so the flags
    replay bit-exactly in SQL (the ``mad_outliers`` gate).

    Scale shape: exactly like :func:`winsorize` — two
    :func:`select_kth` histogram-bisection searches (map-only passes,
    512 KiB driver footprint) plus one stateless flag map; no sort, no
    shuffle. The robust alternative to mean/std filters: a contaminated
    tail moves the MAD by at most one order statistic, where a variance
    filter chases its own outliers.

    Returns ``(med6, mad6, dataset)`` with rows
    ``(id_col, v6, dev6, is_outlier)``.
    """

    def _q6(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "v6": pa.array(np.round(v * 1e6).astype(np.int64)),
            }
        )

    q6 = ds.select_columns([id_col, value_col]).map_batches(
        _q6, batch_format="pyarrow"
    )
    n = q6.count()
    if n == 0:
        raise ValueError("mad_outliers: empty input")
    k = (n + 1) // 2
    med6 = select_kth(q6, "v6", k, num_buckets=num_buckets)

    def _dev(batch: pa.Table) -> pa.Table:
        v = batch.column("v6").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "v6": batch.column("v6"),
                "dev6": pa.array(np.abs(v - med6)),
            }
        )

    dev = q6.map_batches(_dev, batch_format="pyarrow")
    mad6 = select_kth(dev, "dev6", k, num_buckets=num_buckets)

    def _flag(batch: pa.Table) -> pa.Table:
        d = batch.column("dev6").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "v6": batch.column("v6"),
                "dev6": batch.column("dev6"),
                "is_outlier": pa.array((d > c * mad6).astype(np.int64)),
            }
        )

    return med6, mad6, dev.map_batches(_flag, batch_format="pyarrow")


def exact_percentiles(
    ds: ray.data.Dataset,
    value_col: str,
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    num_buckets: int = 1 << 16,
) -> pd.DataFrame:
    """Exact percentile summary of an e6-quantized column — the
    ``describe()`` a curation run prints before picking thresholds. Each
    percentile is the ``ceil(p·n)``-th smallest VALUE (an element of the
    data, :func:`select_kth`'s contract — no interpolation, so the result
    is an exact integer and SQL-replayable). One count pass + one
    histogram-bisection search per percentile, all map-only; no sort.
    Returns a small DataFrame ``(p_e6, k, v6)``.
    """

    def _q6(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        return pa.table({"v6": pa.array(np.round(v * 1e6).astype(np.int64))})

    q6 = ds.select_columns([value_col]).map_batches(_q6, batch_format="pyarrow")
    n = q6.count()
    if n == 0:
        raise ValueError("exact_percentiles: empty input")
    rows = []
    for p in ps:
        k = max(1, int(math.ceil(p * n - 1e-9)))
        rows.append(
            {
                "p_e6": int(round(p * 1e6)),
                "k": k,
                "v6": select_kth(q6, "v6", k, num_buckets=num_buckets),
            }
        )
    return pd.DataFrame(rows).astype(np.int64)


def uniform_sample_k(
    ds: ray.data.Dataset,
    id_col: str,
    k: int,
    num_buckets: int = 1 << 16,
) -> ray.data.Dataset:
    """Global EXACT-k uniform sample without replacement — the distributed
    equivalent of reservoir sampling, as a pure function of the data
    (resumable, partitioning-independent, SQL-replayable): the k rows with
    the smallest ``(id_hash(id), id)`` key.

    Scale shape (the reason this isn't ``sort().limit(k)`` or a
    single-group top-k): NOTHING shuffles. The k-th smallest hash value is
    found by :func:`select_kth`'s bucket-histogram bisection over the
    32-bit hash space (map-only passes, a B-bucket count array on the
    driver), survivors pass a stateless ``filter``, and only the expected-
    O(n/2^32)-row hash-tie stratum AT the threshold is collected to the
    driver to resolve the boundary by id. Total data movement = the k
    output rows; a naive top-k ``groupby`` over one global group would
    funnel every batch's partial through a single reducer.

    Requires unique ids (like :func:`stratified_sample`): the selection
    key (hash, id) must be a total order for the boundary to be
    deterministic.

    Known cosmetic edge: when k is smaller than the input block count,
    whole tasks yield zero rows and Ray 2.49 mints one schema-less
    RefBundle per such task (the executor warning documented in
    ``util.skip_empty``) — harmless, and absent at any realistic k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        hv = id_hash(ids).astype(np.int64)
        return batch.append_column("_h", pa.array(hv, type=pa.int64()))

    hds = ds.map_batches(_attach, batch_format="pyarrow")
    thr = select_kth(hds, "_h", k, num_buckets=num_buckets)

    # rows strictly below the threshold hash are unconditionally in; the
    # tie stratum (hash == thr) is ranked by id on the driver. With a
    # 32-bit hash the stratum is ~n/2^32 rows per distinct value — O(1).
    # ONE pass returns both the below-threshold count and the O(1)-row tie
    # stratum (hash == thr) as a list column — always exactly one output
    # row per batch, so no task ever emits a 0-row block (Ray 2.49 wraps
    # those schema-less regardless of typing — the executor-warning class;
    # a separate tie filter or union would mint one per empty task).
    def _below_and_ties(batch: pa.Table) -> pa.Table:
        hv = batch.column("_h").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c": pa.array([int((hv < thr).sum())], type=pa.int64()),
                "ties": pa.array(
                    [ids[hv == thr].tolist()], type=pa.list_(pa.int64())
                ),
            }
        )

    parts = hds.map_batches(_below_and_ties, batch_format="pyarrow").to_pandas()
    below = int(parts["c"].sum())
    need = k - below

    from raylink.util import skip_empty

    tie_ids = np.empty(0, dtype=np.int64)
    if need > 0:
        all_ties = np.sort(
            np.concatenate([np.asarray(t, dtype=np.int64) for t in parts["ties"]])
        )
        tie_ids = all_ties[:need]

    def _keep(batch: pa.Table) -> pa.Table:
        hv = batch.column("_h").to_numpy(zero_copy_only=False)
        mask = hv < thr
        if len(tie_ids):
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            mask |= np.isin(ids, tie_ids)
        return batch.filter(pa.array(mask)).drop_columns(["_h"])

    # terminal typed anchor (the _hash_dedup idiom): tasks whose whole
    # block misses the sample emit nothing under skip_empty, and a bare
    # consumer (count/take) would see schema-less bundles — the executor
    # warning class this file's r5 fold removed from the tie pass
    from raylink.util import pa_type

    schema = ds.schema()
    out_schema = pa.schema(
        [(n, pa_type(t)) for n, t in zip(schema.names, schema.types)]
    )
    return hds.map_batches(skip_empty(_keep), batch_format="pyarrow").union(
        ray.data.from_arrow(out_schema.empty_table())
    )


def _skyline_2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean survivor mask of the 2-D maximal (Pareto) front.

    Dominance: row j dominates row i iff x_j >= x_i and y_j >= y_i with
    at least one strict. Exact duplicates dominate nothing and survive
    together (matching the SQL ``NOT EXISTS`` dominance replay).
    Vectorized: one lexsort (x desc, y desc), per-x-group max y, and a
    running strict-x max — O(n log n), no Python loop over rows."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    # group starts: first row of each distinct x (y desc inside a group)
    new_x = np.empty(n, dtype=bool)
    new_x[0] = True
    new_x[1:] = xs[1:] != xs[:-1]
    group_id = np.cumsum(new_x) - 1
    group_max_y = ys[new_x]  # first row per group has the group's max y
    # best y among groups with STRICTLY larger x
    best_prev = np.empty(len(group_max_y), dtype=np.int64)
    best_prev[0] = np.iinfo(np.int64).min
    if len(group_max_y) > 1:
        best_prev[1:] = np.maximum.accumulate(group_max_y[:-1])
    keep_sorted = (ys == group_max_y[group_id]) & (ys > best_prev[group_id])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def pareto_front(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    maximize: bool = True,
) -> ray.data.Dataset:
    """Pareto-front (skyline) pruning over two integer criteria — the
    multi-objective curation shape ("keep documents not dominated on
    quality AND length" — single-quantile filters can't express the
    trade-off). Keeps every row not dominated by another row; exact
    duplicates all survive; ``maximize=False`` minimizes both.

    Scale shape: per-batch local skyline (vectorized lexsort kernel —
    a point dominated within its batch is dominated globally, so local
    pruning is lossless), then the union of local fronts collapses to
    one partition for the final skyline — correct because
    skyline(union of local skylines) = skyline(all). The exchange is
    FRONT-sized, not data-sized. Contract: the global front must fit one
    task (fronts are ~O(log n) for independent criteria; adversarially
    anti-correlated data degenerates to the full set — profile with
    ``column_profile`` first, or pre-bucket one axis)."""

    def _local(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch.column(x_col).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        y = np.asarray(batch.column(y_col).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        if not maximize:
            x, y = -x, -y
        return batch.filter(pa.array(_skyline_2d(x, y)))

    from raylink.util import skip_empty

    local = ds.map_batches(skip_empty(_local), batch_format="pyarrow")
    return local.repartition(1).map_batches(
        skip_empty(_local), batch_format="pyarrow", batch_size=None
    )


def weighted_priority_sample(
    ds: ray.data.Dataset,
    id_col: str,
    weight_col: str,
    k: int,
) -> ray.data.Dataset:
    """Weighted sample WITHOUT replacement by priority sampling (Duffield,
    Lund & Thorup 2007): each row gets priority ``q_i = w_i / u_i`` with
    ``u_i`` uniform on (0,1], and the k highest-priority rows are the
    sample — inclusion probability ≈ proportional to weight, and the
    scheme supports unbiased subset-sum estimation via the (k+1)-st
    priority as the threshold.

    Exactness device: ``u_i`` is the deterministic 32-bit ``id_hash`` plus
    one (never zero), and the priority is the INTEGER key
    ``q_i = (w_i · 2³²) // u_i`` — truncating division, identical in
    numpy and DuckDB (``//``), with ties broken by id ascending; the
    sample is a pure function of the data (resumable, partitioning-free)
    and the SQL replay is bit-exact. Weights must be positive int64
    < 2³¹ (quantize currency/score floats to integer units first — the
    repo-wide convention); violations raise, never truncate silently.

    Scale shape: per-batch vectorized local top-k (a row outside its
    batch's top k can never be in the global top k), then the k-per-batch
    survivors collapse to one final top-k task — the exchange is
    O(k · batches), never data-sized. Same lossless-local-prune argument
    as :func:`pareto_front`; the heavy lifting (hash, divide, argpartition)
    is map-only.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    SHIFT = np.int64(1) << np.int64(32)

    def _local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False)
        if not np.issubdtype(w.dtype, np.integer):
            raise TypeError(
                f"weighted_priority_sample needs integer weights "
                f"(got {w.dtype}); quantize to integer units first"
            )
        w = w.astype(np.int64)
        if len(w) and (w.min() <= 0 or w.max() >= (1 << 31)):
            raise ValueError("weights must be in [1, 2^31) — exact-key contract")
        u = id_hash(ids).astype(np.int64) + 1  # (0, 2^32]: never zero
        q = (w * SHIFT) // u  # both operands positive: trunc == floor == SQL //
        if len(q) > k:
            # argpartition on the composite (q desc, id asc) order
            order = np.lexsort((ids, -q))[:k]
            batch, q = batch.take(pa.array(order)), q[order]
        return batch.append_column("priority", pa.array(q, type=pa.int64()))

    from raylink.util import skip_empty

    local = ds.map_batches(skip_empty(_local), batch_format="pyarrow")

    def _final(batch: pa.Table) -> pa.Table:
        q = batch.column("priority").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -q))[:k]
        return batch.take(pa.array(order))

    return local.repartition(1).map_batches(
        skip_empty(_final), batch_format="pyarrow", batch_size=None
    )
