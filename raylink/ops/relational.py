"""Relational primitives exercised as standalone engine operators
(SURVEY.md §2 operator inventory: M2/M3 maps & filters, J1 semi-join,
J7 payload join, A1/A2 distincts, K1 grouped top-k, sorts/limits,
pre-aggregated groupbys). Each has a DuckDB-checkable contract — the
``queries()``/``oracle_sql()`` entries in ``__ray_entry__.py`` wire them to
the driver's correctness gate.

Patterns: vectorized Arrow ``map_batches`` for maps/filters, broadcast sets
for semi-joins, per-batch partial aggregation before the small groupby,
rank-with-ties grouped top-k (``slice_max`` semantics, R/fuzzylink.R:203-211).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum


def lower_distinct(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """M3 + A1: lowercase projection then distinct (shuffle on the value)."""
    lowered = ds.map_batches(
        lambda t: pa.table({col: pc.utf8_lower(t.column(col))}),
        batch_format="pyarrow",
    )
    return (
        lowered.groupby(col).aggregate(Count()).select_columns([col]).sort(col)
    )


def union_distinct(
    ds1: ray.data.Dataset, col1: str, ds2: ray.data.Dataset, col2: str,
    out_col: str = "key",
) -> ray.data.Dataset:
    """A2 (R/fuzzylink.R:93): distinct union of two key columns."""
    a = ds1.select_columns([col1]).rename_columns({col1: out_col})
    b = ds2.select_columns([col2]).rename_columns({col2: out_col})
    return (
        a.union(b).groupby(out_col).aggregate(Count()).select_columns([out_col]).sort(out_col)
    )


def semi_join(
    ds: ray.data.Dataset,
    key_col: str,
    keys: set,
) -> ray.data.Dataset:
    """J1: broadcast key-set semi-join (no shuffle of the big side).

    The key set is converted to an Arrow array ONCE on the driver and
    broadcast; each task runs the vectorized ``pc.is_in`` kernel against the
    zero-copy shared value set instead of a per-row Python membership loop."""
    ref = ray.put(pa.array(sorted(keys)))

    def _filter(batch: pa.Table) -> pa.Table:
        value_set = ray.get(ref)
        return batch.filter(pc.is_in(batch.column(key_col), value_set=value_set))

    return ds.map_batches(_filter, batch_format="pyarrow")


def anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_keys: list[str],
    right_keys: list[str] | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed anti-join: left rows whose key appears nowhere in
    ``right``. Both sides go through ONE hash-partitioned exchange
    (``shuffle_merge``) and each partition does a vectorized pandas
    left-only merge — unlike :func:`semi_join` this never collects or
    broadcasts the right side, so it holds when the exclusion set is
    corpus-sized (e.g. dropping every non-survivor of a dedup pass)."""
    from raylink.util import shuffle_merge

    rk = right_keys or left_keys
    lschema = left.schema()
    out_schema = pa.schema(
        [(n, t) for n, t in zip(lschema.names, lschema.types)]
    )
    lcols = list(lschema.names)
    # right keys share the left keys' types (join compatibility), so the
    # right schema is derivable WITHOUT Dataset.schema() — which on a lazy
    # groupby-rooted right side would execute its whole lineage just to
    # learn dtypes
    ltype = dict(zip(lschema.names, lschema.types))
    right_schema = pa.schema(
        [(rn, ltype[ln]) for ln, rn in zip(left_keys, rk)]
    )

    def _anti(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if len(ldf) == 0 or len(rdf) == 0:
            return ldf[lcols]
        m = ldf.merge(
            rdf[rk].drop_duplicates(),
            how="left",
            left_on=left_keys,
            right_on=rk,
            indicator="__in_right__",
        )
        return m[m["__in_right__"] == "left_only"][lcols]

    return shuffle_merge(
        left,
        right.select_columns(rk),
        left_keys,
        rk,
        _anti,
        out_schema,
        num_partitions=num_partitions,
        left_schema=out_schema,
        right_schema=right_schema,
    )


def broadcast_left_join(
    big: ray.data.Dataset,
    small_df: pd.DataFrame,
    left_on: list[str],
    right_on: list[str],
) -> ray.data.Dataset:
    """J7 pattern: small side broadcast via ray.put, pandas merge map-side."""
    ref = ray.put(small_df)

    def _join(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(ref)
        return batch.merge(small, how="left", left_on=left_on, right_on=right_on)

    return big.map_batches(_join, batch_format="pandas")


def grouped_topk(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    k: int,
    tiebreak: list[str] | None = None,
) -> ray.data.Dataset:
    """K1 (R/fuzzylink.R:203-211): per-group top-k by value, keeping ties —
    ``slice_max`` semantics = rows with rank() <= k under descending value."""

    def _topk(group: pd.DataFrame) -> pa.Table:
        ranks = group[value_col].rank(method="min", ascending=False)
        out = group[ranks <= k]
        if tiebreak:
            out = out.sort_values(tiebreak, kind="stable")
        # arrow out: keeps block types homogeneous for downstream shuffles
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return ds.groupby(group_col).map_groups(_topk, batch_format="pandas")


def preagg_sum_count(
    ds: ray.data.Dataset,
    group_cols: list[str],
    sum_cols: dict[str, str],
    final_partitions: int | None = None,
) -> ray.data.Dataset:
    """Pre-aggregated grouped sums: per-batch pandas partial aggregation
    (one row per group per batch) before the global groupby — the
    shuffle moves partials, not rows (SURVEY.md §4 / ray_guide).

    ``final_partitions``: when the group-key cardinality is KNOWN to be
    small (e.g. a roll-up to a handful of status flags), pass a matching
    small count — the final groupby's sort otherwise partitions the tiny
    partial table to the input block count and emits one schema-less empty
    block per surplus partition (Ray 2.49 executor warnings). Leave None
    for high-cardinality groups: the partial table is (blocks × groups)
    rows and needs the parallel sort."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(group_cols, as_index=False, sort=False).agg(
            **{out: (src, "sum") for src, out in sum_cols.items()},
            _n=(group_cols[0], "size"),
        )
        return g

    partials = ds.map_batches(_partial, batch_format="pandas")
    if final_partitions is not None:
        partials = partials.repartition(final_partitions)
    aggs = [Sum(out, alias_name=out) for out in sum_cols.values()]
    aggs.append(Sum("_n", alias_name="n"))
    return partials.groupby(group_cols).aggregate(*aggs)


# ---------------------------------------------------------------------------
# Bloom-filtered anti-join
# ---------------------------------------------------------------------------

_BLOOM_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant schedule);
    uint64 in/out, wrapping arithmetic."""
    z = x + _BLOOM_GOLD
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bloom_positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions for int64 keys via double hashing
    h1 + i*h2 (Kirsch–Mitzenmacher): two splitmix64 draws stand in for a
    family of k independent hashes."""
    x = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(x)
    h2 = _splitmix64(x ^ _BLOOM_GOLD) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(
        np.uint64
    )


def build_bloom(
    right: ray.data.Dataset,
    key_col: str,
    bits_per_key: int = 10,
    build_partitions: int | None = None,
) -> tuple["ray.ObjectRef", int, int, int]:
    """Distributed Bloom-filter build over an int64 key column.

    Shape: the key column is repartitioned to a handful of blocks, each
    block folds its keys into ONE m-bit bitmap (vectorized bit sets, no
    per-row Python), and the driver ORs the per-block bitmaps
    *streamingly* (``iter_batches``: peak driver memory is 2 bitmaps, not
    blocks × bitmap). Returns ``(ray.put(bitmap), m, k, n_right)``.

    Scale contract: the bitmap is ``n_right × bits_per_key / 8`` bytes and
    is broadcast ONCE via the object store — 10⁹ exclusion keys at 10
    bits/key is a 1.25 GB shared read-only block, the standard trade for
    never shuffling the probe side. Past object-store size, partition the
    bloom by key hash and route probes (not implemented here; the exact
    ``anti_join`` fallback always remains correct).
    """
    n_right = int(right.count())
    n = max(n_right, 1)
    m = ((n * bits_per_key + 63) // 64) * 64
    k = max(1, int(round(bits_per_key * 0.6931471805599453)))
    words = m // 64

    def _fold(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        bits = np.zeros(words, dtype=np.uint64)
        if len(keys):
            pos = _bloom_positions(np.asarray(keys), m, k).ravel()
            np.bitwise_or.at(
                bits, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    parts = build_partitions or min(32, max(1, n // 65536) or 1)
    folded = (
        right.select_columns([key_col])
        .repartition(parts)
        .map_batches(_fold, batch_format="pyarrow", batch_size=None)
    )
    acc = np.zeros(words, dtype=np.uint64)
    for b in folded.iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in b.column("bits").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint64)
    return ray.put(acc), m, k, n_right


def bloom_anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str | None = None,
    bits_per_key: int = 10,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Anti-join with a broadcast Bloom pre-filter: bit-exact output,
    Bloom-sized shuffle.

    Semantics are EXACTLY :func:`anti_join` (left rows whose key appears
    nowhere in ``right``); the bloom is pure routing. Left rows that miss
    the bloom are *definite* non-members and stream straight to the
    output with no exchange at all; only the pass-the-bloom residue
    (true members + the ~0.8%-at-10-bits false positives) enters the
    exact hash-partitioned :func:`anti_join`, whose verify kills every
    false positive. At 100 TB this turns "shuffle the whole probe side"
    into "shuffle ~|members| rows": the big side's exchange shrinks by
    the non-member fraction, the exclusion side ships once as an
    ``n·bits_per_key``-bit block.

    Keys must be int64 (hash family is over the raw 64-bit pattern);
    hash wider types to int64 upstream.
    """
    rk = right_key or left_key
    ref, m, k, n_right = build_bloom(right, rk, bits_per_key=bits_per_key)
    if n_right == 0:
        return left

    def _split(maybe: bool):
        def _f(batch: pa.Table) -> pa.Table:
            keys = batch.column(left_key).to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                return batch
            bloom = ray.get(ref)
            pos = _bloom_positions(np.asarray(keys), m, k)
            hit = (
                (bloom[(pos >> np.uint64(6)).astype(np.int64)]
                 >> (pos & np.uint64(63))) & np.uint64(1)
            ).all(axis=1)
            return batch.filter(pa.array(hit if maybe else ~hit))

        return _f

    definite_out = left.map_batches(_split(False), batch_format="pyarrow")
    maybe = left.map_batches(_split(True), batch_format="pyarrow")
    verified = anti_join(
        maybe, right.select_columns([rk]), [left_key], [rk],
        num_partitions=num_partitions,
    )
    return definite_out.union(verified)


def rollup_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_cols: dict[str, str],
    final_partitions: int | None = None,
) -> ray.data.Dataset:
    """Hierarchical ROLLUP aggregate: one row per prefix level of
    ``keys`` — level len(keys) is the finest grouping, level 0 the grand
    total; rolled-up key columns are NULL. Emits ``(lvl, *keys, *sums,
    n)`` with integer sums (feed micro-unit int columns, the repo's
    convention).

    Shape: the INPUT is aggregated exactly once (per-batch pandas
    partials, then one groupby of partial rows — ``preagg_sum_count``);
    every coarser level re-aggregates the PREVIOUS level's
    result-cardinality table, so levels cost a chain of tiny exchanges,
    never a second pass over the data. Nothing result-scale touches the
    driver.
    """
    out_sums = list(sum_cols.values())
    finest = preagg_sum_count(ds, keys, sum_cols, final_partitions)
    from raylink.util import pa_type

    fschema = finest.schema()
    ktypes = {
        k: pa_type(t) for k, t in zip(fschema.names, fschema.types) if k in keys
    }

    def _pad(lvl: int):
        def _f(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {"lvl": pa.array(np.full(n, lvl, dtype=np.int64))}
            for i, k in enumerate(keys):
                cols[k] = t.column(k) if i < lvl else pa.nulls(n, type=ktypes[k])
            for c in out_sums:
                cols[c] = t.column(c)
            cols["n"] = t.column("n")
            return pa.table(cols)

        return _f

    levels = [finest.map_batches(_pad(len(keys)), batch_format="pyarrow")]
    cur = finest
    for lvl in range(len(keys) - 1, -1, -1):
        aggs = [Sum(c, alias_name=c) for c in out_sums] + [
            Sum("n", alias_name="n")
        ]
        if lvl > 0:
            # previous level is result-cardinality-sized: collapse to one
            # partition so the groupby's sort can't emit schema-less
            # empty blocks for surplus partitions
            cur = cur.repartition(1).groupby(keys[:lvl]).aggregate(*aggs)
            levels.append(cur.map_batches(_pad(lvl), batch_format="pyarrow"))
        else:
            grand = cur.map_batches(
                lambda t: t.append_column(
                    "_one", pa.array(np.zeros(len(t), dtype=np.int64))
                ),
                batch_format="pyarrow",
            ).repartition(1).groupby("_one").aggregate(*aggs)
            levels.append(
                grand.drop_columns(["_one"]).map_batches(
                    _pad(0), batch_format="pyarrow"
                )
            )
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def interval_lookup(
    points: ray.data.Dataset,
    intervals: pd.DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    label_col: str = "label",
    out_col: str = "label",
) -> ray.data.Dataset:
    """Broadcast interval join: attach to every point row the label of
    the half-open interval ``[lo, hi)`` containing ``value_col`` (NULL
    when none). The classic dimension-lookup shape (IP→geo ranges,
    value→bucket tiers): the interval table is validated non-overlapping,
    sorted ONCE on the driver and broadcast via ``ray.put``; every task
    answers its batch with one vectorized ``np.searchsorted`` — zero
    shuffle, zero per-row Python.

    Scale contract: the interval table is dimension-sized (fits the
    object store); the fact side streams map-only."""
    iv = intervals[[lo_col, hi_col, label_col]].sort_values(lo_col)
    lo = iv[lo_col].to_numpy()
    hi = iv[hi_col].to_numpy()
    if (hi <= lo).any() or (lo[1:] < hi[:-1]).any():
        raise ValueError("intervals must be non-empty and non-overlapping")
    labels = iv[label_col].to_numpy()
    ref = ray.put((lo, hi, labels))

    def _lookup(batch: pa.Table) -> pa.Table:
        lo_, hi_, lab_ = ray.get(ref)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lo_, v, side="right") - 1
        ok = (idx >= 0) & (v < hi_[np.clip(idx, 0, len(hi_) - 1)])
        out = np.where(ok, lab_[np.clip(idx, 0, len(lab_) - 1)], None)
        return batch.append_column(
            out_col, pa.array(out.tolist(), type=pa.string())
        )

    return points.map_batches(_lookup, batch_format="pyarrow")


def grouped_mode(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Most-frequent value per group with a DETERMINISTIC tie rule
    (highest count, then smallest value) — SQL ``mode()`` leaves ties
    unspecified, so this is the replayable variant. Emits
    ``(group_col, mode, n_mode)``.

    Shape: per-batch pandas partial (group, value, count) rows — the
    exchange moves partials, never rows — then one hash route by group
    and a vectorized all-groups argmax per partition (sort by
    (group, -count, value), take group firsts)."""
    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import pa_type, sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    schema = ds.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([group_col, value_col], sort=False).size()
        out = g.reset_index(name="cnt")
        return out

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(group_col).to_numpy(zero_copy_only=False)
        pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        return batch.append_column(
            "_pid", pa.array(pid)
        ).replace_schema_metadata(None)

    def _argmax(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        # partials for the same (group, value) may arrive from many
        # batches: fold first, then rank
        df = df.groupby([group_col, value_col], as_index=False)["cnt"].sum()
        df = df.sort_values(
            [group_col, "cnt", value_col],
            ascending=[True, False, True],
            kind="stable",
        )
        firsts = df.groupby(group_col, as_index=False, sort=False).first()
        return pa.table(
            {
                group_col: pa.array(
                    firsts[group_col].to_numpy(), type=types[group_col]
                ),
                "mode": pa.array(
                    firsts[value_col].to_numpy(), type=types[value_col]
                ),
                "n_mode": pa.array(firsts["cnt"].to_numpy().astype(np.int64)),
            }
        )

    out_schema = pa.schema(
        [
            (group_col, types[group_col]),
            ("mode", types[value_col]),
            ("n_mode", pa.int64()),
        ]
    )
    partials = ds.select_columns([group_col, value_col]).map_batches(
        _partial, batch_format="pandas"
    )
    tagged = partials.map_batches(_tag, batch_format="pyarrow")
    return sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _argmax, out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def grouped_nunique(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact distinct-value count per group — ``COUNT(DISTINCT v)``.
    Per-batch (group, value) dedup shrinks the exchange to distinct
    pairs per batch; one hash route by group, then a vectorized
    drop_duplicates + value_counts per partition answers all its groups.
    (The mergeable-sketch alternative at corpus scale is
    ``ops/sketch.hll_registers`` — this is the exact path.)"""
    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import pa_type, sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    schema = ds.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))

    def _pair_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates([group_col, value_col])

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(group_col).to_numpy(zero_copy_only=False)
        pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        return batch.append_column(
            "_pid", pa.array(pid)
        ).replace_schema_metadata(None)

    def _count(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates([group_col, value_col])
        vc = df[group_col].value_counts().sort_index()
        return pa.table(
            {
                group_col: pa.array(
                    vc.index.to_numpy(), type=types[group_col]
                ),
                "n_distinct": pa.array(vc.to_numpy().astype(np.int64)),
            }
        )

    out_schema = pa.schema(
        [(group_col, types[group_col]), ("n_distinct", pa.int64())]
    )
    deduped = ds.select_columns([group_col, value_col]).map_batches(
        _pair_dedup, batch_format="pandas"
    )
    return sorted_partition_apply(
        deduped.map_batches(_tag, batch_format="pyarrow").repartition(nparts),
        "_pid",
        _count,
        out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def pivot_counts(
    ds: ray.data.Dataset,
    group_col: str,
    cat_col: str,
    prefix: str = "cnt_",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Long→wide pivot of category counts: one row per group with a
    ``prefix<category>`` int64 column per distinct category (the
    feature-table shape model trainers consume). The category domain is
    discovered in one tiny distinct pass (contract: dimension-small —
    columns are schema, not data), then per-batch (group, cat) partial
    counts route through ONE hash exchange and each partition emits its
    groups' wide rows vectorized.
    """
    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import pa_type, sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    schema = ds.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))
    cats = sorted(
        ds.select_columns([cat_col])
        .groupby(cat_col)
        .aggregate(Count())
        .to_pandas()[cat_col]
        .tolist()
    )
    cat_idx = {c: i for i, c in enumerate(cats)}
    cref = ray.put(cat_idx)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([group_col, cat_col], sort=False).size()
        return g.reset_index(name="cnt")

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(group_col).to_numpy(zero_copy_only=False)
        pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        return batch.append_column(
            "_pid", pa.array(pid)
        ).replace_schema_metadata(None)

    def _widen(part: pa.Table) -> pa.Table:
        idx = ray.get(cref)
        df = part.to_pandas()
        gcodes, guniq = pd.factorize(
            df[group_col].to_numpy(), sort=True
        )
        ccodes = df[cat_col].map(idx).to_numpy()
        mat = np.zeros((len(guniq), len(idx)), dtype=np.int64)
        np.add.at(mat, (gcodes, ccodes), df["cnt"].to_numpy())
        cols = {group_col: pa.array(guniq, type=types[group_col])}
        for c, i in idx.items():
            cols[prefix + c] = pa.array(mat[:, i])
        return pa.table(cols)

    out_schema = pa.schema(
        [(group_col, types[group_col])]
        + [(prefix + c, pa.int64()) for c in cats]
    )
    partials = ds.select_columns([group_col, cat_col]).map_batches(
        _partial, batch_format="pandas"
    )
    return sorted_partition_apply(
        partials.map_batches(_tag, batch_format="pyarrow").repartition(nparts),
        "_pid",
        _widen,
        out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def full_outer_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_keys: list[str],
    right_keys: list[str] | None = None,
    num_partitions: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Distributed FULL OUTER hash join (the one join shape the engine's
    semi/anti/left toolkit didn't cover; Ray 2.49's built-in ``Dataset.join``
    crashes on sparse partitions, see ``util.hash_join``).

    Semantics (DuckDB ``FULL OUTER JOIN`` + ``COALESCE`` on the keys):
    matched rows carry both payloads; unmatched rows from EITHER side
    survive null-padded on the other side's payload. Key columns are
    coalesced into the LEFT key names. Right payload columns that collide
    with a left column name come back suffixed ``_r``. Rows with NULL join
    keys are DROPPED by a vectorized filter (the engine-wide M2 rule,
    ``schema.drop_missing``) — a documented deviation from SQL FULL OUTER,
    which keeps them null-padded; it also sidesteps pandas' NaN-matches-NaN
    merge semantics, which would silently join NULL keys to each other.

    Scale contract: ONE all-to-all exchange of both sides via
    ``shuffle_merge`` (equal keys co-locate, so per-partition pandas outer
    merges compose to the global join); per-partition memory is bounded by
    (|L|+|R|)/P plus the hottest key's match group.
    """
    from raylink.util import shuffle_merge

    rk = right_keys or left_keys
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    l_names = list(lschema.names)
    r_names = list(rschema.names)
    l_set = set(l_names)
    # right key columns are consumed by the coalesce; right payload columns
    # keep their name unless it collides with a left column
    r_payload = [n for n in r_names if n not in rk]
    r_out = {n: (n + "_r" if n in l_set else n) for n in r_payload}
    rtype = dict(zip(rschema.names, rschema.types))
    out_schema = pa.schema(
        [(n, t) for n, t in zip(lschema.names, lschema.types)]
        + [(r_out[n], rtype[n]) for n in r_payload]
    )
    out_cols = list(out_schema.names)
    tmp = [f"__rk{i}__" for i in range(len(rk))]

    def _outer(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        rdf = rdf.rename(columns=dict(zip(rk, tmp)))
        m = ldf.merge(
            rdf, how="outer", left_on=left_keys, right_on=tmp,
            suffixes=("", "_r"),
        )
        for lc, tc in zip(left_keys, tmp):
            m[lc] = m[lc].where(m[lc].notna(), m[tc])
        return m[out_cols]

    def _notnull(keys: list[str]):
        def _f(batch: pa.Table) -> pa.Table:
            mask = None
            for k in keys:
                v = pc.is_valid(batch.column(k))
                mask = v if mask is None else pc.and_(mask, v)
            return batch.filter(mask)

        return _f

    return shuffle_merge(
        left.map_batches(_notnull(left_keys), batch_format="pyarrow"),
        right.map_batches(_notnull(rk), batch_format="pyarrow"),
        left_keys,
        rk,
        _outer,
        out_schema,
        num_partitions=num_partitions,
        left_schema=lschema,
        right_schema=rschema,
    )


def grouped_moments(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    final_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact distributed first/second moments per group: emits
    ``(group_col, n, sum_e6, sumsq_e12)`` where values quantize to e6
    micro-units per row first (the ``rolling_sum`` device), so BOTH sums
    are exact int64 and summation-order-free — mean and variance are then
    pure driver/consumer arithmetic with no float seam, and the SQL replay
    (``SUM(v6)``, ``SUM(v6*v6)``) is bit-exact.

    The moments shape, not the groupby shape: per-batch partial (n, Σv,
    Σv²) rows — one row per group per batch — move through the exchange,
    never the value rows (``preagg_sum_count`` contract). Overflow bound:
    |v|·1e6 must stay under ~3e9 for sumsq room (Σv² per group under
    2^63), i.e. values in ±3000 with 1e12 rows per group — stated, not
    silently truncated."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        v6 = np.round(batch[value_col].to_numpy() * 1e6).astype(np.int64)
        g = pd.DataFrame({group_col: batch[group_col], "_v": v6, "_v2": v6 * v6})
        return g.groupby(group_col, as_index=False, sort=False).agg(
            sum_e6=("_v", "sum"), sumsq_e12=("_v2", "sum"), _n=("_v", "size")
        )

    partials = ds.select_columns([group_col, value_col]).map_batches(
        _partial, batch_format="pandas"
    )
    if final_partitions is not None:
        partials = partials.repartition(final_partitions)
    return partials.groupby(group_col).aggregate(
        Sum("_n", alias_name="n"),
        Sum("sum_e6", alias_name="sum_e6"),
        Sum("sumsq_e12", alias_name="sumsq_e12"),
    )


def set_op_distinct(
    ds1: ray.data.Dataset,
    ds2: ray.data.Dataset,
    cols: list[str],
    op: str,
) -> ray.data.Dataset:
    """SQL ``INTERSECT`` / ``EXCEPT`` (distinct set semantics) over
    arbitrary key-column tuples, in ONE exchange: both sides are tagged
    with a presence bit, unioned, and a single
    ``groupby(cols).max(side bits)`` decides membership — no join, no
    second shuffle, no driver collection. ``op``: ``"intersect"`` keeps
    tuples present in BOTH inputs, ``"except"`` keeps distinct tuples of
    ``ds1`` absent from ``ds2``."""
    if op not in ("intersect", "except"):
        raise ValueError(f"set_op_distinct: unknown op {op!r}")
    from ray.data.aggregate import Max

    def _tag(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            out = {c: batch.column(c) for c in cols}
            n = batch.num_rows
            out["_s1"] = pa.array(
                np.full(n, 1 if side == 1 else 0, dtype=np.int64)
            )
            out["_s2"] = pa.array(
                np.full(n, 1 if side == 2 else 0, dtype=np.int64)
            )
            return pa.table(out)

        return _t

    both = ds1.select_columns(cols).map_batches(
        _tag(1), batch_format="pyarrow"
    ).union(
        ds2.select_columns(cols).map_batches(_tag(2), batch_format="pyarrow")
    )
    agg = both.groupby(cols).aggregate(
        Max("_s1", alias_name="_s1"), Max("_s2", alias_name="_s2")
    )

    def _keep(batch: pa.Table) -> pa.Table:
        s1 = batch.column("_s1").to_numpy(zero_copy_only=False)
        s2 = batch.column("_s2").to_numpy(zero_copy_only=False)
        mask = (s1 == 1) & ((s2 == 1) if op == "intersect" else (s2 == 0))
        return batch.filter(pa.array(mask)).select(cols)

    return agg.map_batches(_keep, batch_format="pyarrow")


def mutual_best(
    pairs: ray.data.Dataset,
    a_col: str,
    b_col: str,
    score_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """RECIPROCAL best match over a scored pair table: keep ``(a, b)``
    iff ``b`` is ``a``'s single best partner AND ``a`` is ``b``'s — the
    standard high-precision decision rule for 1:1 entity resolution
    (symmetric argmax), fully deterministic via the total tie order
    ``(score DESC, partner ASC)``.

    Shape: two :func:`raylink.ops.window.windowed_rank` exchanges over
    the pair table (rank within ``a``, then rank within ``b`` with the
    first rank riding along as a carried column) and a stateless filter —
    no joins, no driver collection; the skew bound is the hottest key's
    pair list, same as the rank operator's.

    Score contract: integer scores rank exactly; FLOAT scores are
    quantized to e6 micro-units for the rank key (the repo-wide
    similarity convention) — differences below 1e-6 tie and fall to the
    deterministic partner-id tie-break. A bare int64 cast of a float
    column would truncate every similarity in (0, 1) to zero and let the
    id tie-break silently decide "best"; non-numeric scores raise.
    """
    from raylink.ops.window import windowed_rank

    def _neg(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(s.dtype, np.integer) or s.dtype == np.bool_:
            ns = -s.astype(np.int64)
        elif np.issubdtype(s.dtype, np.floating):
            ns = -np.round(s * 1e6).astype(np.int64)
        else:
            raise TypeError(
                f"mutual_best score column {score_col!r} must be numeric "
                f"(got {s.dtype}); integer scores rank exactly, floats at "
                "e6 resolution"
            )
        return pa.table(
            {
                a_col: batch.column(a_col),
                b_col: batch.column(b_col),
                score_col: batch.column(score_col),
                "_ns": pa.array(ns),
            }
        )

    t = pairs.map_batches(_neg, batch_format="pyarrow")
    # rank of each pair within its a (1 = best); b rides in the order
    # tuple as the deterministic tie-break
    t = windowed_rank(
        t, a_col, ["_ns", b_col, score_col], out_col="rn_a",
        num_partitions=num_partitions,
    )
    # second exchange: rank within b; rn_a is carried as a trailing order
    # column (inert — the prefix (_ns, a) is already a total order)
    t = windowed_rank(
        t, b_col, ["_ns", a_col, score_col, "rn_a"], out_col="rn_b",
        num_partitions=num_partitions,
    )

    def _keep(batch: pa.Table) -> pa.Table:
        ra = batch.column("rn_a").to_numpy(zero_copy_only=False)
        rb = batch.column("rn_b").to_numpy(zero_copy_only=False)
        keep = (ra == 1) & (rb == 1)
        return batch.filter(pa.array(keep)).select([a_col, b_col, score_col])

    return t.map_batches(_keep, batch_format="pyarrow")


_ARGMAX_B = np.int64(1) << np.int64(31)


def grouped_argmax(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    arg_col: str,
) -> ray.data.Dataset:
    """Per-group argmax with the deterministic tie rule "largest value,
    then largest arg" — as ONE built-in ``Max`` aggregate, no rank
    exchange and no map_groups: the ``(value, arg)`` tuple is bit-packed
    into a single int64 (``(value + 2³¹)·2³¹ + arg``) whose integer order
    equals the tuple's lexicographic order, so Ray's map-side combining
    Max does all the work and the exchange moves one packed row per group
    per batch. Contract (checked loudly): ``value ∈ [−2³⁰, 2³⁰)``,
    ``arg ∈ [0, 2³¹)``, both int64 — quantize wider domains first. The
    SQL oracle replays the same packing with BIGINT arithmetic.
    Returns ``(group_col, value_col, arg_col)`` rows."""
    from ray.data.aggregate import Max

    def _pack(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        a = batch.column(arg_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and (
            v.min() < -(1 << 30) or v.max() >= (1 << 30)
            or a.min() < 0 or a.max() >= (1 << 31)
        ):
            raise ValueError(
                "grouped_argmax: value must be in [-2^30, 2^30) and arg in "
                "[0, 2^31) for the int64 bit-packing — quantize first"
            )
        return pa.table(
            {
                group_col: batch.column(group_col),
                "_packed": pa.array((v + _ARGMAX_B) * _ARGMAX_B + a),
            }
        )

    packed = (
        ds.map_batches(_pack, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Max("_packed", alias_name="_packed"))
    )

    def _unpack(batch: pa.Table) -> pa.Table:
        p = batch.column("_packed").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                group_col: batch.column(group_col),
                value_col: pa.array(p // _ARGMAX_B - _ARGMAX_B),
                arg_col: pa.array(p % _ARGMAX_B),
            }
        )

    return packed.map_batches(_unpack, batch_format="pyarrow")


def grouped_corr_parts(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    x_scale: int = 1_000_000,
    y_scale: int = 1_000_000,
    final_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact per-group CORRELATION sufficient statistics:
    ``(group_col, n, sx, sy, sxx, syy, sxy)`` with both columns quantized
    to integer units per row first (``round(x · x_scale)``), so every sum
    is exact int64 and order-free — Pearson r, covariance, and the
    OLS slope/intercept are then pure consumer arithmetic with no float
    seam, and the SQL replay (``SUM(xq)``, ``SUM(xq*yq)``, …) is
    bit-exact. The :func:`grouped_moments` shape extended with the cross
    term: per-batch partial rows move through the exchange, never the
    value rows.

    Overflow contract (stated, not silently truncated): per group,
    ``Σ xq²``, ``Σ yq²`` and ``Σ|xq·yq|`` must stay under 2⁶³ — pick
    scales so ``max|x|·x_scale`` and ``max|y|·y_scale`` squared times the
    hottest group's row count fit (e.g. values ±3000 at e6 with ≤10⁶
    rows per group, or price-cents ≤10⁸ with ≤900 rows per group)."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        xq = np.round(batch[x_col].to_numpy() * x_scale).astype(np.int64)
        yq = np.round(batch[y_col].to_numpy() * y_scale).astype(np.int64)
        g = pd.DataFrame(
            {
                group_col: batch[group_col],
                "_x": xq,
                "_y": yq,
                "_xx": xq * xq,
                "_yy": yq * yq,
                "_xy": xq * yq,
            }
        )
        return g.groupby(group_col, as_index=False, sort=False).agg(
            sx=("_x", "sum"), sy=("_y", "sum"), sxx=("_xx", "sum"),
            syy=("_yy", "sum"), sxy=("_xy", "sum"), _n=("_x", "size"),
        )

    partials = ds.select_columns([group_col, x_col, y_col]).map_batches(
        _partial, batch_format="pandas"
    )
    if final_partitions is not None:
        partials = partials.repartition(final_partitions)
    return partials.groupby(group_col).aggregate(
        Sum("_n", alias_name="n"),
        Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"),
        Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"),
        Sum("sxy", alias_name="sxy"),
    )


def merge_sum_aggregates(
    prev: ray.data.Dataset,
    delta: ray.data.Dataset,
    keys: list[str],
    sum_cols: list[str],
    final_partitions: int | None = None,
) -> ray.data.Dataset:
    """Incremental materialized-view maintenance for SUM/COUNT
    aggregates: fold a new increment's PRE-AGGREGATED ``(keys, sums)``
    table into yesterday's aggregate — union + one groupby over two
    group-cardinality-sized tables, so refreshing a daily view costs
    aggregate-scale work, never a rescan of the accumulated corpus.
    Associativity of SUM is the whole trick (the same property
    map-side combiners rely on); AVG-style views store (sum, count)
    pairs and divide at read time.
    """
    from ray.data.aggregate import Sum

    merged = prev.select_columns(keys + sum_cols).union(
        delta.select_columns(keys + sum_cols)
    )
    if final_partitions is not None:
        merged = merged.repartition(final_partitions)
    return merged.groupby(keys).aggregate(
        *[Sum(c, alias_name=c) for c in sum_cols]
    )


def melt(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> ray.data.Dataset:
    """Wide→long unpivot (the inverse shape of :func:`pivot_counts`): one
    output row per input row per ``value_cols`` entry, with the source
    column's name in ``var_name`` and its value in ``value_name`` — the
    long form feature stores and plotting/aggregation layers consume.

    Pure stateless map, zero-copy on the value side: each batch emits one
    concatenated table whose value column is the Arrow arrays stacked
    per source column (no Python per-row work) and whose id columns ride
    an index take. All ``value_cols`` must share one castable Arrow type
    (cast to the first column's type; int→float widening is the common
    case). SQL-replayable as a UNION ALL of per-column selects.
    """
    if not value_cols:
        raise ValueError("melt requires at least one value column")

    def _melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        vtype = batch.column(value_cols[0]).type
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), len(value_cols)))
        cols = {c: batch.column(c).take(idx) for c in id_cols}
        cols[var_name] = pa.array(
            np.repeat(np.asarray(value_cols, dtype=object), n),
            type=pa.string(),
        )
        cols[value_name] = pa.concat_arrays(
            [
                (
                    batch.column(c).cast(vtype)
                    if batch.column(c).type != vtype
                    else batch.column(c)
                ).combine_chunks()
                for c in value_cols
            ]
        )
        return pa.table(cols)

    return ds.select_columns(list(id_cols) + list(value_cols)).map_batches(
        _melt, batch_format="pyarrow"
    )


def explode_list(
    ds: ray.data.Dataset,
    id_col: str,
    list_col: str,
    pos_col: str = "pos",
    value_col: str = "val",
) -> ray.data.Dataset:
    """List-column UNNEST WITH ORDINALITY: one output row per list
    element, carrying the parent's ``id_col``, the element's 0-based
    position and its value — the long form that feeds per-dimension
    aggregates over embedding columns (`ops/kmeans.py` builds the same
    shape inline; this is the standalone operator).

    Pure stateless Arrow-kernel map — ``list_flatten`` +
    ``list_parent_indices`` + an offset subtraction — so a 100-TB
    embedding table explodes at memcpy speed with no Python per-row work
    and no shuffle. Values pass through untouched (zero arithmetic), so
    float columns stay bit-identical to the input."""

    def _explode(batch: pa.Table) -> pa.Table:
        lc = batch.column(list_col)
        if isinstance(lc, pa.ChunkedArray):
            lc = lc.combine_chunks()
        flat = pc.list_flatten(lc)
        parents = pc.list_parent_indices(lc).to_numpy(zero_copy_only=False)
        # element index within its own list = global flat index minus the
        # parent list's start offset
        offsets = np.asarray(lc.offsets)
        pos = np.arange(len(flat), dtype=np.int64) - offsets[parents].astype(
            np.int64
        )
        return pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(parents)),
                pos_col: pa.array(pos),
                value_col: flat,
            }
        )

    return ds.select_columns([id_col, list_col]).map_batches(
        _explode, batch_format="pyarrow"
    )


def grouping_sets_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    sets: list[list[str]],
    sum_cols: dict[str, str],
    final_partitions: int | None = None,
) -> ray.data.Dataset:
    """GROUP BY GROUPING SETS — the arbitrary-subset generalization of
    :func:`rollup_agg` (prefix chain) and :func:`cube_agg` (full
    lattice): one result stratum per requested subset of ``keys``, with
    rolled-up key columns NULL and ``g_mask`` the DuckDB
    ``GROUPING(k0)*2^(k-1) + ...`` bitmask.

    Same scale shape as cube_agg: the INPUT aggregates exactly once at
    the finest requested grain (``preagg_sum_count`` — per-batch partials,
    one groupby), and every requested set re-aggregates that
    result-cardinality table; with s sets that is s-1 tiny exchanges over
    |distinct(keys)|-sized tables, never a second data pass. Sums must
    be integer micro-units per the repo convention."""
    sets_t = [tuple(s) for s in sets]
    if len(set(sets_t)) != len(sets_t):
        raise ValueError("duplicate grouping sets")
    for s in sets_t:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} not a subset of keys")
    out_sums = list(sum_cols.values())
    finest = preagg_sum_count(ds, keys, sum_cols, final_partitions)
    from ray.data.aggregate import Sum

    from raylink.util import pa_type

    fschema = finest.schema()
    ktypes = {
        k: pa_type(t) for k, t in zip(fschema.names, fschema.types) if k in keys
    }

    def _pad(mask: int):
        def _f(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {"g_mask": pa.array(np.full(n, mask, dtype=np.int64))}
            for i, k in enumerate(keys):
                rolled = mask & (1 << (len(keys) - 1 - i))
                cols[k] = pa.nulls(n, type=ktypes[k]) if rolled else t.column(k)
            for c in out_sums:
                cols[c] = t.column(c)
            cols["n"] = t.column("n")
            return pa.table(cols)

        return _f

    aggs = [Sum(c, alias_name=c) for c in out_sums] + [Sum("n", alias_name="n")]
    levels = []
    for s in sets_t:
        mask = 0
        for i, k in enumerate(keys):
            if k not in s:
                mask |= 1 << (len(keys) - 1 - i)
        if mask == 0:
            levels.append(finest.map_batches(_pad(0), batch_format="pyarrow"))
        elif s:
            cur = finest.repartition(1).groupby(list(s)).aggregate(*aggs)
            levels.append(cur.map_batches(_pad(mask), batch_format="pyarrow"))
        else:
            cur = (
                finest.map_batches(
                    lambda t: t.append_column(
                        "_one", pa.array(np.zeros(len(t), dtype=np.int64))
                    ),
                    batch_format="pyarrow",
                )
                .repartition(1)
                .groupby("_one")
                .aggregate(*aggs)
                .drop_columns(["_one"])
            )
            levels.append(cur.map_batches(_pad(mask), batch_format="pyarrow"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cube_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_cols: dict[str, str],
    final_partitions: int | None = None,
) -> ray.data.Dataset:
    """CUBE aggregate: one row per grouping SET (every subset of
    ``keys``, 2^k sets), with absent key columns NULL and ``g_mask`` the
    DuckDB ``GROUPING(k0)*2^(k-1) + ... + GROUPING(k_last)`` bitmask
    (bit set = key rolled up). The lattice :func:`rollup_agg` only walks
    the prefix chain of; CUBE covers the off-chain sets ("by priority
    regardless of status") a profiling pass wants in one plan.

    Shape: the INPUT aggregates exactly once (``preagg_sum_count``);
    every other grouping set re-aggregates the FINEST level's
    result-cardinality table — 2^k - 1 tiny exchanges over
    |distinct(keys)|-sized tables, never a second data pass. Practical
    for the small k (2-3) a CUBE is for; sums must be integer
    micro-units per the repo convention."""
    if len(keys) > 4:
        raise ValueError("cube_agg supports at most 4 keys (2^k sets)")
    out_sums = list(sum_cols.values())
    finest = preagg_sum_count(ds, keys, sum_cols, final_partitions)
    from raylink.util import pa_type

    fschema = finest.schema()
    ktypes = {
        k: pa_type(t) for k, t in zip(fschema.names, fschema.types) if k in keys
    }

    def _pad(mask: int):
        def _f(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {"g_mask": pa.array(np.full(n, mask, dtype=np.int64))}
            for i, k in enumerate(keys):
                rolled = mask & (1 << (len(keys) - 1 - i))
                cols[k] = pa.nulls(n, type=ktypes[k]) if rolled else t.column(k)
            for c in out_sums:
                cols[c] = t.column(c)
            cols["n"] = t.column("n")
            return pa.table(cols)

        return _f

    levels = [finest.map_batches(_pad(0), batch_format="pyarrow")]
    aggs = [Sum(c, alias_name=c) for c in out_sums] + [Sum("n", alias_name="n")]
    for mask in range(1, 1 << len(keys)):
        kept = [
            k for i, k in enumerate(keys)
            if not (mask & (1 << (len(keys) - 1 - i)))
        ]
        # the finest table is result-cardinality-sized: collapse to one
        # partition so the groupby's sort can't emit schema-less empties
        if kept:
            cur = finest.repartition(1).groupby(kept).aggregate(*aggs)
        else:
            cur = (
                finest.map_batches(
                    lambda t: t.append_column(
                        "_one", pa.array(np.zeros(len(t), dtype=np.int64))
                    ),
                    batch_format="pyarrow",
                )
                .repartition(1)
                .groupby("_one")
                .aggregate(*aggs)
                .drop_columns(["_one"])
            )
        levels.append(cur.map_batches(_pad(mask), batch_format="pyarrow"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out
