"""Time-ordered operators over event streams: gap-based sessionization,
tumbling-window aggregation, and a distributed as-of join.

Ray Data has no native window/as-of primitives; these are built from the
repo's shuffle toolkit (``_tag_pid`` partition routing, ``shuffle_merge``)
with the per-partition kernel vectorized in pandas:

* :func:`sessionize` — ONE all-to-all keyed on a hash of the entity key;
  each partition sessionizes ALL of its users in a single vectorized
  sort + cumsum (no per-user Python loop). Partitioning assumption: one
  entity's events fit one partition (skew bound = the hottest entity).
* :func:`window_aggregate` — tumbling windows are just a derived integer
  key, so this is map-side partial aggregation (per-batch pandas groupby)
  followed by a SMALL global groupby over (window, type) — the classic
  combiner shape: the all-to-all moves pre-reduced partials, never rows.
* :func:`asof_join` — hash-partition both sides on the join key (one
  exchange via ``shuffle_merge``), then ``pandas.merge_asof`` per
  partition. Deterministic tie rule: among equal right timestamps the row
  greatest in ``(right_ts, *tie_cols)`` sort order wins. Partitioning
  assumption: co-partitioning by key makes per-partition time-sorting
  local (no global sort barrier).

The reference engine (fuzzylink) has no analogue for any of these; they
belong to the training-data-pipeline extension surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from raylink.ops.dedup import _default_partitions, _mix64


def _epoch_us(col: "pa.ChunkedArray | pa.Array") -> "np.ndarray":
    """Epoch MICROSECONDS regardless of the column's timestamp unit —
    a raw int64 cast of timestamp[ns] silently yields nanoseconds (the
    test tables are [us], which masked this; pandas-born data is [ns]).
    Sub-microsecond components are FLOORED first: pyarrow's default
    safe cast raises ArrowInvalid on any nonzero-ns value, and truncating
    to the µs grid cannot change second-scale window assignment."""
    t = col.type
    if pa.types.is_timestamp(t) and t.unit != "us":
        import pyarrow.compute as pc

        col = pc.floor_temporal(col, unit="microsecond").cast(
            pa.timestamp("us", tz=t.tz)
        )
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def sessionize(
    events: ray.data.Dataset,
    gap_seconds: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Assign gap-based session ids: a new session starts when the time
    since the entity's previous event exceeds ``gap_seconds`` (strict
    ``>``, ordered by ``(ts, id)``). ``session_id`` is the MIN ``id_col``
    within the session — deterministic and SQL-replayable with window
    functions. Returns ``(id_col, key_col, session_id)`` rows.
    """
    from raylink.util import sorted_partition_apply, uniform_pid_bounds

    # 2^31 pid values, not num_partitions: high cardinality keeps the range
    # exchange's sampled boundaries collision-free so no empty (schema-less)
    # sort partitions are emitted — see util.sorted_partition_apply
    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    gap = pd.Timedelta(seconds=gap_seconds)

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                id_col: batch.column(id_col),
                key_col: batch.column(key_col),
                ts_col: batch.column(ts_col),
            }
        )

    def _sess(part: pa.Table) -> pa.Table:
        # all users of this partition at once: sort, then one vectorized
        # break/cumsum — no per-user loop
        df = part.to_pandas()
        df = df.sort_values([key_col, ts_col, id_col], kind="stable")
        new_user = df[key_col].ne(df[key_col].shift())
        brk = new_user | (df[ts_col].diff() > gap)
        sgrp = brk.cumsum()
        sess = df.groupby(sgrp, sort=False)[id_col].transform("min")
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy()),
                key_col: pa.array(df[key_col].to_numpy()),
                "session_id": pa.array(sess.to_numpy()),
            }
        )

    from raylink.util import pa_type

    eschema = events.schema()
    etype = dict(zip(eschema.names, (pa_type(t) for t in eschema.types)))
    out_schema = pa.schema(
        [(id_col, etype[id_col]), (key_col, etype[key_col]),
         ("session_id", etype[id_col])]
    )
    tagged = events.map_batches(_tag, batch_format="pyarrow")
    return sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _sess, out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def session_stats(
    events: ray.data.Dataset,
    gap_seconds: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-entity session statistics in ONE exchange.

    Same gap rule as :func:`sessionize` (new session when the gap since the
    entity's previous event is strictly greater than ``gap_seconds``,
    ordered by ``(ts, id)``), but instead of emitting per-event session
    ids it aggregates inside the same partition kernel: all of an entity's
    events are routed to one partition, so sessions never cross partitions
    and BOTH the per-session and the per-entity roll-ups happen without a
    second shuffle. Returns
    ``(key_col, n_sessions, n_events, total_duration_us, max_session_events)``
    — all aggregates int64 (durations in integer µs), SQL-replayable with
    window functions.
    """
    from raylink.util import pa_type, sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    gap_us = int(round(gap_seconds * 1_000_000))

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                key_col: batch.column(key_col),
                id_col: batch.column(id_col),
                "_t": pa.array(_epoch_us(batch.column(ts_col))),
            }
        )

    def _stats(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(
            [key_col, "_t", id_col], kind="stable"
        )
        new_user = df[key_col].ne(df[key_col].shift())
        brk = new_user | (df["_t"].diff() > gap_us)
        sgrp = brk.cumsum()
        per = df.groupby(sgrp, sort=False).agg(
            _k=(key_col, "first"), _ne=(id_col, "size"),
            _lo=("_t", "min"), _hi=("_t", "max"),
        )
        per["_dur"] = per["_hi"] - per["_lo"]
        out = (
            per.groupby("_k", sort=False)
            .agg(
                n_sessions=("_ne", "size"),
                n_events=("_ne", "sum"),
                total_duration_us=("_dur", "sum"),
                max_session_events=("_ne", "max"),
            )
            .reset_index()
            .rename(columns={"_k": key_col})
        )
        return pa.table(
            {
                key_col: pa.array(out[key_col].to_numpy()),
                "n_sessions": pa.array(
                    out["n_sessions"].to_numpy().astype(np.int64)
                ),
                "n_events": pa.array(
                    out["n_events"].to_numpy().astype(np.int64)
                ),
                "total_duration_us": pa.array(
                    out["total_duration_us"].to_numpy().astype(np.int64)
                ),
                "max_session_events": pa.array(
                    out["max_session_events"].to_numpy().astype(np.int64)
                ),
            }
        )

    eschema = events.schema()
    etype = dict(zip(eschema.names, (pa_type(t) for t in eschema.types)))
    out_schema = pa.schema(
        [
            (key_col, etype[key_col]),
            ("n_sessions", pa.int64()),
            ("n_events", pa.int64()),
            ("total_duration_us", pa.int64()),
            ("max_session_events", pa.int64()),
        ]
    )
    tagged = events.map_batches(_tag, batch_format="pyarrow")
    return sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _stats, out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def windowed_rank(
    events: ray.data.Dataset,
    key_col: str,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """``ROW_NUMBER() OVER (PARTITION BY key_col ORDER BY order_cols)`` —
    1-based rank per key. ONE all-to-all keyed on a hash of ``key_col``;
    each partition ranks ALL of its keys with a single vectorized sort +
    groupby-cumcount, so there is no per-key Python kernel call (the r3
    verdict's fix for the per-user ``map_groups`` gate query — wrong shape
    at 10⁹ users). Include a unique column last in ``order_cols`` for a
    total order. Returns ``(key_col, *order_cols, out_col)`` rows.

    Partitioning assumption: the hottest key's rows fit one partition
    (same skew bound as :func:`sessionize`).
    """
    from raylink.util import sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(keys.dtype, np.integer):
            pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        else:
            pid = (pd.util.hash_array(keys.astype(object)) % P).astype(np.int64)
        cols = {"_pid": pa.array(pid), key_col: batch.column(key_col)}
        for c in order_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def _rank(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        df = df.sort_values([key_col, *order_cols], kind="stable")
        rn = df.groupby(key_col, sort=False).cumcount().to_numpy() + 1
        cols = {key_col: pa.array(df[key_col].to_numpy())}
        for c in order_cols:
            cols[c] = pa.array(df[c].to_numpy())
        cols[out_col] = pa.array(rn.astype(np.int64))
        return pa.table(cols)

    from raylink.util import pa_type

    eschema = events.schema()
    etype = dict(zip(eschema.names, (pa_type(t) for t in eschema.types)))
    out_schema = pa.schema(
        [(key_col, etype[key_col])]
        + [(c, etype[c]) for c in order_cols]
        + [(out_col, pa.int64())]
    )
    tagged = events.map_batches(_tag, batch_format="pyarrow")
    return sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _rank, out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def percent_rank(
    events: ray.data.Dataset,
    key_col: str,
    order_cols: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """``PERCENT_RANK()`` and ``CUME_DIST()`` per key as e6 fixed point
    with DuckDB's trunc-toward-zero ``//`` convention (both quantities
    are nonnegative, so trunc == floor here):

    * ``pr_e6 = (rn - 1) * 10^6 // (n - 1)`` (0 when the key has one row)
    * ``cd_e6 = rn * 10^6 // n``

    Callers must make ``order_cols`` a TOTAL order (unique column last)
    so ``RANK == ROW_NUMBER`` and the integer replay is exact — the same
    contract as :func:`windowed_rank`, and the same ONE-exchange shape:
    hash the key, rank every key of a partition with one vectorized
    sort + cumcount + transform('size'). Returns
    ``(key_col, *order_cols, rn, pr_e6, cd_e6)``.
    """
    from raylink.util import pa_type, sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(keys.dtype, np.integer):
            pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        else:
            pid = (pd.util.hash_array(keys.astype(object)) % P).astype(np.int64)
        cols = {"_pid": pa.array(pid), key_col: batch.column(key_col)}
        for c in order_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def _rank(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        df = df.sort_values([key_col, *order_cols], kind="stable")
        g = df.groupby(key_col, sort=False)
        rn = g.cumcount().to_numpy().astype(np.int64) + 1
        n = g[key_col].transform("size").to_numpy().astype(np.int64)
        pr = np.where(n > 1, ((rn - 1) * 1_000_000) // np.maximum(n - 1, 1), 0)
        cd = (rn * 1_000_000) // n
        cols = {key_col: pa.array(df[key_col].to_numpy())}
        for c in order_cols:
            cols[c] = pa.array(df[c].to_numpy())
        cols["rn"] = pa.array(rn)
        cols["pr_e6"] = pa.array(pr.astype(np.int64))
        cols["cd_e6"] = pa.array(cd.astype(np.int64))
        return pa.table(cols)

    eschema = events.schema()
    etype = dict(zip(eschema.names, (pa_type(t) for t in eschema.types)))
    out_schema = pa.schema(
        [(key_col, etype[key_col])]
        + [(c, etype[c]) for c in order_cols]
        + [("rn", pa.int64()), ("pr_e6", pa.int64()), ("cd_e6", pa.int64())]
    )
    tagged = events.map_batches(_tag, batch_format="pyarrow")
    return sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _rank, out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def lead_lag(
    events: ray.data.Dataset,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    lags: tuple[int, ...] = (1,),
    leads: tuple[int, ...] = (1,),
    ntile_n: int | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """``LAG/LEAD(value_col, k) OVER (PARTITION BY key_col ORDER BY
    order_cols)`` (+ optional ``NTILE(ntile_n)``) in one pass: the same
    single hash-of-key all-to-all as :func:`windowed_rank`, with every
    key of a partition handled by ONE vectorized groupby-shift (pandas'
    C groupby kernel — no per-key Python). Out-of-window offsets are NULL,
    exactly the SQL default. NTILE uses the SQL split (the first
    ``count % n`` buckets get the extra row), computed vectorized from the
    0-based row number and per-key group size.

    Output columns: ``(key_col, *order_cols, value_col, lag_<k>...,
    lead_<k>..., [ntile])``. Partitioning assumption: the hottest key's
    rows fit one partition (same skew bound as :func:`sessionize`).
    """
    from raylink.util import pa_type, sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    keep = [key_col, *order_cols]
    if value_col not in keep:
        keep.append(value_col)

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(keys.dtype, np.integer):
            pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        else:
            pid = (pd.util.hash_array(keys.astype(object)) % P).astype(np.int64)
        cols = {"_pid": pa.array(pid)}
        for c in keep:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def _shift(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        df = df.sort_values([key_col, *order_cols], kind="stable")
        g = df.groupby(key_col, sort=False)
        cols = {c: pa.array(df[c]) for c in keep}
        vt = pa_type(part.schema.field(value_col).type)
        for k in lags:
            cols[f"lag_{k}"] = pa.array(g[value_col].shift(k), type=vt, from_pandas=True)
        for k in leads:
            cols[f"lead_{k}"] = pa.array(g[value_col].shift(-k), type=vt, from_pandas=True)
        if ntile_n:
            rn0 = g.cumcount().to_numpy()
            cnt = g[value_col].transform("size").to_numpy()
            q, r = cnt // ntile_n, cnt % ntile_n
            big = r * (q + 1)  # rows covered by the (q+1)-sized buckets
            tile = np.where(
                rn0 < big,
                rn0 // np.maximum(q + 1, 1),
                r + (rn0 - big) // np.maximum(q, 1),
            )
            cols["ntile"] = pa.array((tile + 1).astype(np.int64))
        return pa.table(cols)

    eschema = events.schema()
    etype = dict(zip(eschema.names, (pa_type(t) for t in eschema.types)))
    fields = [(c, etype[c]) for c in keep]
    fields += [(f"lag_{k}", etype[value_col]) for k in lags]
    fields += [(f"lead_{k}", etype[value_col]) for k in leads]
    if ntile_n:
        fields.append(("ntile", pa.int64()))
    out_schema = pa.schema(fields)
    tagged = events.map_batches(_tag, batch_format="pyarrow")
    return sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _shift, out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def window_aggregate(
    events: ray.data.Dataset,
    width_seconds: int,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Tumbling-window aggregate: count and integer-cents value sum per
    ``(window_id, event_type)`` where ``window_id = floor(epoch_us /
    width)``. Map-side combiner: each batch pre-reduces to one partial row
    per (window, type), so the all-to-all ships partials, not events; the
    global groupby key cardinality is windows × types (small by
    construction). Value sums are ``llround(value · 100)`` int64 — exact
    under reordering, unlike float sums."""
    width_us = int(width_seconds) * 1_000_000

    def _partial(batch: pa.Table) -> pa.Table:
        us = _epoch_us(batch.column(ts_col))
        df = pd.DataFrame(
            {
                "window_id": us // width_us,
                type_col: batch.column(type_col).to_numpy(zero_copy_only=False),
                "n_events": np.int64(1),
                "value_cents": np.rint(
                    batch.column(value_col).to_numpy(zero_copy_only=False) * 100.0
                ).astype(np.int64),
            }
        )
        out = df.groupby(["window_id", type_col], as_index=False, sort=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    return (
        events.map_batches(_partial, batch_format="pyarrow")
        .groupby(["window_id", type_col])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tie_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed as-of join: for every left row, attach the right row of
    the same ``key_col`` whose ``right_ts`` is the latest ≤ ``left_ts``
    (``direction='backward'``; ``'forward'`` mirrors; strict inequality
    when ``allow_exact_matches=False``). ``right_cols`` maps right-side
    column → output name; unmatched left rows carry nulls.

    One all-to-all (both sides hash-partitioned on ``key_col`` through
    ``shuffle_merge``), then a vectorized ``pandas.merge_asof`` per
    partition over its time-sorted slices — there is never a global time
    sort. Ambiguity rule, stated not silent: among right rows with equal
    ``right_ts``, the one greatest under ``(right_ts, *tie_cols)``
    ascending sort wins (pandas picks the last such row)."""
    from raylink.util import shuffle_merge

    tie = list(tie_cols or [])
    lschema = left.schema()
    rschema = right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    out_fields = [(n, ltypes[n]) for n in lschema.names]
    out_fields += [(o, rtypes[c]) for c, o in right_cols.items()]
    out_schema = pa.schema(out_fields)
    lcols = list(lschema.names)
    rneed = sorted({key_col, right_ts, *right_cols, *tie})

    def _merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if len(ldf) == 0:
            return pd.DataFrame({n: [] for n in out_schema.names})
        if len(rdf) == 0:
            out = ldf[lcols].copy()
            for _, o in right_cols.items():
                out[o] = None
            return out
        r = rdf[rneed].sort_values([right_ts] + tie, kind="stable")
        ren = dict(right_cols)
        if right_ts not in right_cols:
            ren[right_ts] = "__rts__"
        r = r.rename(columns=ren)
        m = pd.merge_asof(
            ldf.sort_values(left_ts, kind="stable"),
            r,
            left_on=left_ts,
            right_on=ren[right_ts],
            by=key_col,
            direction=direction,
            allow_exact_matches=allow_exact_matches,
        )
        keep = lcols + list(right_cols.values())
        out = m[keep]
        # merged int columns become float64 when any row missed: restore
        # nullable integers so the pinned Arrow schema holds
        for c, o in right_cols.items():
            if pa.types.is_integer(rtypes[c]):
                out = out.assign(**{o: out[o].astype("Int64")})
        return out

    return shuffle_merge(
        left,
        right.select_columns(rneed),
        [key_col],
        [key_col],
        _merge,
        out_schema,
        num_partitions=num_partitions,
        left_schema=pa.schema([(n, ltypes[n]) for n in lcols]),
        right_schema=pa.schema([(n, rtypes[n]) for n in rneed]),
    )


def hopping_window_aggregate(
    events: ray.data.Dataset,
    width_seconds: int,
    hop_seconds: int,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Hopping (sliding) window aggregate: count and integer-cents value
    sum per ``(window_id, event_type)`` where window ``w`` covers
    ``[w·hop, w·hop + width)`` — each event belongs to up to
    ``ceil(width/hop)`` overlapping windows.

    Scale shape mirrors :func:`window_aggregate`: the membership explosion
    is pure integer arithmetic inside the map task (``np.repeat`` over the
    per-event window ranges, never a Python loop) and each batch
    pre-reduces to one partial row per (window, type), so the all-to-all
    ships partials whose cardinality is windows × types — independent of
    the event count. ``width % hop == 0`` is required so every event's
    window set is a dense integer range (the standard streaming-engine
    restriction; arbitrary offsets need an interval join instead).
    """
    if width_seconds % hop_seconds != 0:
        raise ValueError(
            f"width ({width_seconds}s) must be a multiple of hop "
            f"({hop_seconds}s) for dense hopping windows"
        )
    width_us = int(width_seconds) * 1_000_000
    hop_us = int(hop_seconds) * 1_000_000

    def _partial(batch: pa.Table) -> pa.Table:
        us = _epoch_us(batch.column(ts_col))
        # window w contains t iff w·hop <= t < w·hop + width:
        # w in ( (t - width) / hop , t / hop ] — integer range
        w_hi = us // hop_us  # last window containing t
        w_lo = (us - width_us) // hop_us + 1  # first window containing t
        rep = (w_hi - w_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(us), dtype=np.int64), rep)
        ends = np.cumsum(rep)
        offs = np.arange(int(ends[-1]) if len(us) else 0, dtype=np.int64) - np.repeat(
            ends - rep, rep
        )
        win = np.repeat(w_lo, rep) + offs
        cents = np.rint(
            batch.column(value_col).to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "window_id": win,
                type_col: batch.column(type_col)
                .to_numpy(zero_copy_only=False)[idx],
                "n_events": np.int64(1),
                "value_cents": cents[idx],
            }
        )
        out = df.groupby(["window_id", type_col], as_index=False, sort=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    return (
        events.map_batches(_partial, batch_format="pyarrow")
        .groupby(["window_id", type_col])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    left_id: str = "event_id",
    right_id: str = "event_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Banded interval join: all pairs of same-key rows whose time delta
    ``right_ts − left_ts`` lies in ``(lower, upper]`` seconds (lower
    exclusive, upper inclusive). Emits ``(left_id, key, right_id,
    dt_us)``.

    Unlike :func:`asof_join` (one match per left row) and a key-only
    exchange (whole entities co-located, hot entities unsplittable), the
    exchange key here is ``(key, time-band)`` with band width W = upper −
    lower: each right row lands in exactly ONE band, each left row is
    replicated to the ≤2 consecutive bands its acceptance window can
    touch, so a hot entity's history is sliced across partitions by time
    and the skew bound is rows-per-(entity × W window), not
    rows-per-entity. No duplicate pairs by construction (a right row
    exists in one band only).

    Per-partition kernel is loop-free: (gid, relative-time) packed into
    one int64 key, right side sorted once, both interval ends answered by
    ``np.searchsorted``, and the [lo, hi) ranges exploded with the
    cumsum/repeat trick. Pack contract: ``G × (W_us + 2)`` must fit
    int64 — raised loudly, not wrapped.
    """
    lower_us = int(round(lower_seconds * 1_000_000))
    upper_us = int(round(upper_seconds * 1_000_000))
    w = upper_us - lower_us
    if w <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")
    from raylink.util import pa_type, shuffle_merge

    lschema = left.schema()
    rschema = right.schema()
    ltypes = dict(zip(lschema.names, (pa_type(t) for t in lschema.types)))
    rtypes = dict(zip(rschema.names, (pa_type(t) for t in rschema.types)))
    out_schema = pa.schema(
        [
            ("left_id", ltypes[left_id]),
            (key_col, ltypes[key_col]),
            ("right_id", rtypes[right_id]),
            ("dt_us", pa.int64()),
        ]
    )

    def _expand_left(batch: pa.Table) -> pa.Table:
        ts = _epoch_us(batch.column(left_ts))
        b0 = (ts + lower_us) // w
        b1 = (ts + upper_us) // w
        two = b1 != b0
        idx = np.concatenate([np.arange(len(ts)), np.flatnonzero(two)])
        band = np.concatenate([b0, b1[two]])
        return pa.table(
            {
                "lid": batch.column(left_id).take(pa.array(idx)),
                key_col: batch.column(key_col).take(pa.array(idx)),
                "lts": pa.array(ts[idx], type=pa.int64()),
                "band": pa.array(band, type=pa.int64()),
            }
        )

    def _band_right(batch: pa.Table) -> pa.Table:
        ts = _epoch_us(batch.column(right_ts))
        return pa.table(
            {
                "rid": batch.column(right_id),
                key_col: batch.column(key_col),
                "rts": pa.array(ts, type=pa.int64()),
                "band": pa.array(ts // w, type=pa.int64()),
            }
        )

    stride = w + 2

    def _merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "left_id": pd.array([], dtype="int64"),
                key_col: pd.array([], dtype="int64"),
                "right_id": pd.array([], dtype="int64"),
                "dt_us": pd.array([], dtype="int64"),
            }
        )
        if len(ldf) == 0 or len(rdf) == 0:
            return empty
        # exact (key, band) group codes: factorize each level then the
        # collision-free combination — a 64-bit row-hash factorize could
        # merge distinct groups on a hash collision
        keys_all = np.concatenate(
            [ldf[key_col].to_numpy(), rdf[key_col].to_numpy()]
        )
        bands_all = np.concatenate(
            [ldf["band"].to_numpy(), rdf["band"].to_numpy()]
        )
        ck, _ = pd.factorize(keys_all, sort=False)
        cb, _ = pd.factorize(bands_all, sort=False)
        nb = np.int64(cb.max() + 1)
        codes, _ = pd.factorize(ck.astype(np.int64) * nb + cb, sort=False)
        g = np.int64(codes.max() + 1)
        if g * np.float64(stride) >= 2**63:
            raise ValueError(
                "range_join pack overflow: groups x band width exceeds int64"
            )
        lg = codes[: len(ldf)].astype(np.int64)
        rg = codes[len(ldf) :].astype(np.int64)
        rts = rdf["rts"].to_numpy()
        rrel = rts - rdf["band"].to_numpy() * w
        rkey = rg * stride + rrel + 1
        order = np.argsort(rkey, kind="stable")
        rkey = rkey[order]
        rid_sorted = rdf["rid"].to_numpy()[order]
        rts_sorted = rts[order]

        lts = ldf["lts"].to_numpy()
        lband = ldf["band"].to_numpy()
        rel_lo = np.clip(lts + lower_us - lband * w, -1, w)
        rel_hi = np.clip(lts + upper_us - lband * w, -1, w)
        lo = np.searchsorted(rkey, lg * stride + rel_lo + 1, side="right")
        hi = np.searchsorted(rkey, lg * stride + rel_hi + 1, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        starts = np.cumsum(counts) - counts
        take = (
            np.arange(total)
            - np.repeat(starts, counts)
            + np.repeat(lo, counts)
        )
        lsel = np.repeat(np.arange(len(ldf)), counts)
        return pd.DataFrame(
            {
                "left_id": ldf["lid"].to_numpy()[lsel],
                key_col: ldf[key_col].to_numpy()[lsel],
                "right_id": rid_sorted[take],
                "dt_us": rts_sorted[take] - lts[lsel],
            }
        )

    lexp = left.map_batches(_expand_left, batch_format="pyarrow")
    rexp = right.map_batches(_band_right, batch_format="pyarrow")
    return shuffle_merge(
        lexp,
        rexp,
        [key_col, "band"],
        [key_col, "band"],
        _merge,
        out_schema,
        num_partitions=num_partitions,
        left_schema=pa.schema(
            [
                ("lid", ltypes[left_id]),
                (key_col, ltypes[key_col]),
                ("lts", pa.int64()),
                ("band", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [
                ("rid", rtypes[right_id]),
                (key_col, rtypes[key_col]),
                ("rts", pa.int64()),
                ("band", pa.int64()),
            ]
        ),
    )


def sequence_agg(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "event_id",
    sep: str = ",",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-entity ordered sequence assembly: one row per key with the
    entity's ``value_col`` values joined by ``sep`` in ``order_cols``
    order (include a tiebreaker column for a total order — the default
    ``(ts, event_id)`` is one). This is the training-sequence shape: a
    user's event history as a single delimited string ready for
    tokenization. Emits ``(key_col, n, seq)``.

    One hash exchange on the key (the sessionize ``_pid`` pattern); each
    partition sorts once and assembles ALL its groups with a pandas
    grouped join — the only per-row Python is the inherent string
    concatenation. Skew bound: the hottest entity's history must fit a
    partition (same stated contract as sessionize; pre-chunk ultra-hot
    keys upstream if an entity's history outgrows a worker)."""
    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import pa_type, sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    schema = events.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))
    need = [key_col, value_col, *[c for c in order_cols if c != value_col]]

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        cols = {"_pid": pa.array(pid)}
        for c in need:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def _assemble(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(
            [key_col, *order_cols], kind="stable"
        )
        vals = df[value_col].astype(str)
        g = df.groupby(key_col, sort=True)
        seq = g[value_col].agg(lambda s: sep.join(map(str, s)))
        # bulk string join: pandas' grouped agg calls the lambda per
        # group, but each call is one C-level str.join over the group
        n = g.size()
        return pa.table(
            {
                key_col: pa.array(seq.index.to_numpy(), type=types[key_col]),
                "n": pa.array(n.to_numpy().astype(np.int64)),
                "seq": pa.array(seq.to_numpy(), type=pa.string()),
            }
        )

    out_schema = pa.schema(
        [(key_col, types[key_col]), ("n", pa.int64()), ("seq", pa.string())]
    )
    tagged = events.map_batches(_tag, batch_format="pyarrow")
    return sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _assemble, out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def rolling_sum(
    events: ray.data.Dataset,
    k: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-entity trailing window sum: for each event, the sum of its own
    and the previous ``k−1`` events' values (fewer at the head), ordered
    by ``(ts, id)`` within the entity — ``SUM(v) OVER (PARTITION BY key
    ORDER BY ts, id ROWS k-1 PRECEDING)``. Values are quantized to e6
    micro-units per row BEFORE summing, so the rolling sums are exact
    int64 and the SQL replay is order-free. Emits
    ``(id, key, n_window, roll_sum_e6)``.

    One hash exchange (the sessionize shape); each partition answers all
    its entities with one sort + cumsum-difference — no per-entity loop,
    no per-window loop."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import pa_type, sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    schema = events.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_pid": pa.array(pid),
                id_col: batch.column(id_col),
                key_col: batch.column(key_col),
                "_t": pa.array(_epoch_us(batch.column(ts_col))),
                "_v6": pa.array(np.round(v * 1e6).astype(np.int64)),
            }
        )

    def _roll(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(
            [key_col, "_t", id_col], kind="stable"
        )
        keys = df[key_col].to_numpy()
        v6 = df["_v6"].to_numpy()
        n = len(df)
        pos = np.arange(n, dtype=np.int64)
        first = np.flatnonzero(
            np.concatenate([[True], keys[1:] != keys[:-1]])
        )
        base = np.repeat(pos[first], np.diff(np.append(first, n)))
        within = pos - base  # 0-based index inside the entity
        cs = np.cumsum(v6)
        cs0 = np.concatenate([[0], cs[:-1]])  # exclusive
        # window start index (global): max(base, pos - k + 1)
        wstart = np.maximum(base, pos - k + 1)
        roll = cs - cs0[wstart]
        nwin = pos - wstart + 1
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy()),
                key_col: pa.array(keys, type=types[key_col]),
                "n_window": pa.array(nwin.astype(np.int64)),
                "roll_sum_e6": pa.array(roll.astype(np.int64)),
            }
        )

    out_schema = pa.schema(
        [
            (id_col, types[id_col]),
            (key_col, types[key_col]),
            ("n_window", pa.int64()),
            ("roll_sum_e6", pa.int64()),
        ]
    )
    tagged = events.map_batches(_tag, batch_format="pyarrow")
    return sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _roll, out_schema,
        boundaries=uniform_pid_bounds(nparts),
    )


def basket_pairs(
    events: ray.data.Dataset,
    gap_seconds: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    item_col: str = "event_type",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Within-session item co-occurrence counts (market-basket support):
    sessionize each entity with the gap rule (same semantics as
    :func:`sessionize`), reduce each session to its DISTINCT item set, and
    count, over all sessions, every unordered item pair ``(item_a <
    item_b)`` that co-occurred. Emits ``(item_a, item_b, n_sessions)``.

    Shape: ONE hash exchange on the entity key (sessions never straddle
    partitions), then each partition handles ALL its sessions at once —
    sort, vectorized session breaks, ``drop_duplicates`` to (session,
    item), and a closed-form index-arithmetic expansion of all
    within-session pairs (``np.repeat`` + exclusive-cumsum ranks — no
    per-session Python loop). Pair counts pre-aggregate per partition, so
    the second exchange moves one row per distinct pair per partition —
    at corpus scale the item domain, not the event count, bounds it.
    Skew bound: the hottest session's distinct-item count m costs
    m(m-1)/2 emitted pairs; cap upstream if items-per-session is unbounded.
    """
    from ray.data.aggregate import Sum

    from raylink.util import sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    gap = pd.Timedelta(seconds=gap_seconds)

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                id_col: batch.column(id_col),
                key_col: batch.column(key_col),
                ts_col: batch.column(ts_col),
                item_col: batch.column(item_col),
            }
        )

    pair_schema = pa.schema(
        [("item_a", pa.string()), ("item_b", pa.string()), ("n", pa.int64())]
    )

    def _pairs(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        df = df.sort_values([key_col, ts_col, id_col], kind="stable")
        new_user = df[key_col].ne(df[key_col].shift())
        brk = new_user | (df[ts_col].diff() > gap)
        df["_sess"] = brk.cumsum()
        s = df[["_sess", item_col]].drop_duplicates().sort_values(
            ["_sess", item_col], kind="stable"
        )
        items = s[item_col].to_numpy()
        sizes = s.groupby("_sess", sort=False).size().to_numpy()
        m = np.repeat(sizes, sizes)
        starts = np.cumsum(sizes) - sizes
        idx_in = np.arange(len(s)) - np.repeat(starts, sizes)
        rep = (m - idx_in - 1).astype(np.int64)
        total = int(rep.sum())
        if total == 0:
            return pair_schema.empty_table()
        a_idx = np.repeat(np.arange(len(s)), rep)
        excl = np.cumsum(rep) - rep
        rank = np.arange(total) - np.repeat(excl, rep)
        b_idx = a_idx + 1 + rank
        pairs = pd.DataFrame({"item_a": items[a_idx], "item_b": items[b_idx]})
        cnt = pairs.groupby(["item_a", "item_b"], as_index=False).size()
        return pa.table(
            {
                "item_a": pa.array(cnt["item_a"], type=pa.string()),
                "item_b": pa.array(cnt["item_b"], type=pa.string()),
                "n": pa.array(cnt["size"].to_numpy().astype(np.int64)),
            }
        )

    tagged = events.select_columns(
        [id_col, key_col, ts_col, item_col]
    ).map_batches(_tag, batch_format="pyarrow")
    partials = sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _pairs, pair_schema,
        boundaries=uniform_pid_bounds(nparts),
    )
    return (
        partials.groupby(["item_a", "item_b"])
        .aggregate(Sum("n", alias_name="n_sessions"))
    )


def cohort_counts(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_us: int = 604_800_000_000,  # one week
    num_partitions: int | None = None,
    final_partitions: int | None = 2,
) -> ray.data.Dataset:
    """Cohort retention table: users bucketed by their FIRST-activity
    period (cohort), counted in every period they were active —
    ``(cohort_week, event_week, n_users)``. Buckets are integer floors of
    epoch microseconds (``epoch_us // bucket_us``), so the table is
    integer-exact and SQL-replayable.

    Shape: ONE hash-of-user exchange; each partition holds all of a
    user's events, so per-user min-bucket (the cohort) AND the distinct
    activity buckets are both local, and only pre-counted
    ``(cohort, bucket, n)`` partials enter the final small groupby sum.
    The skew bound is the hottest user's event list.

    ``final_partitions``: the output cardinality is at most
    (#buckets in range)² — weeks over a decade is ~270k rows — so the
    partials are repartitioned down before the final Aggregate; without
    this, group cardinality below Ray's sort-partition count yields
    schema-less empty output partitions and executor schema warnings
    (same device as :func:`relational.preagg_sum_count`).
    """
    from ray.data.aggregate import Sum

    from raylink.util import sorted_partition_apply, uniform_pid_bounds

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                key_col: batch.column(key_col),
                "_wk": pa.array(_epoch_us(batch.column(ts_col)) // bucket_us),
            }
        )

    part_schema = pa.schema(
        [("cohort_week", pa.int64()), ("event_week", pa.int64()),
         ("n", pa.int64())]
    )

    def _cohort(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        coh = df.groupby(key_col)["_wk"].transform("min")
        act = (
            pd.DataFrame(
                {"cohort_week": coh, "event_week": df["_wk"], "u": df[key_col]}
            )
            .drop_duplicates(["u", "event_week"])
            .groupby(["cohort_week", "event_week"], as_index=False)
            .agg(n=("u", "size"))
        )
        return pa.Table.from_pandas(
            act.astype(np.int64), preserve_index=False
        ).cast(part_schema)

    tagged = events.map_batches(_tag, batch_format="pyarrow")
    partials = sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _cohort, part_schema,
        boundaries=uniform_pid_bounds(nparts),
    )
    if final_partitions is not None:
        partials = partials.repartition(final_partitions)
    return partials.groupby(["cohort_week", "event_week"]).aggregate(
        Sum("n", alias_name="n_users")
    )


def funnel_counts(
    events: ray.data.Dataset,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int | None = None,
    final_partitions: int | None = 1,
) -> ray.data.Dataset:
    """Ordered funnel analysis: for each prefix of ``steps``, how many
    entities performed those event types IN ORDER — step *i* counts an
    entity iff it has a ``steps[i]`` event STRICTLY after the earliest
    time it completed steps ``0..i-1`` (the entity's conversion time for
    step *i* is the MIN such timestamp, making the whole table a pure
    function of the input). Emits ``(step_idx, step, n_users)``.

    Shape: ONE hash-of-entity exchange (every entity's events co-located,
    ``sessionize``'s ``_pid`` device), then per-partition the funnel is
    len(steps) vectorized filter→join→groupby-min passes over all
    entities at once — no per-entity loop, no per-step shuffle. Only
    ``len(steps)`` count rows leave each partition, and the final
    aggregate sums a ``partitions × steps``-row table (repartitioned to
    ``final_partitions`` so no schema-less empty Aggregate partitions).
    Timestamps compare on the integer µs grid (``_epoch_us``) so the
    DuckDB replay shares the exact tie semantics.
    """
    from ray.data.aggregate import Sum

    from raylink.util import sorted_partition_apply, uniform_pid_bounds

    steps = list(steps)
    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()

    def _tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
        return pa.table(
            {
                "_pid": pa.array(pid),
                key_col: batch.column(key_col),
                "_t": pa.array(_epoch_us(batch.column(ts_col))),
                type_col: batch.column(type_col),
            }
        )

    part_schema = pa.schema([("step_idx", pa.int64()), ("n", pa.int64())])

    def _funnel(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        counts: list[int] = []
        prev: pd.DataFrame | None = None  # (entity, _prev conversion time)
        for i, s in enumerate(steps):
            sub = df[df[type_col] == s]
            if i > 0:
                # merge, not join: an empty join names the result index
                # after the right side's index and the next groupby sees
                # key_col as both index level and column (pandas raises)
                sub = sub.merge(prev, on=key_col, how="inner")
                sub = sub[sub["_t"] > sub["_prev"]]
            prev = (
                sub.groupby(key_col, as_index=False)["_t"]
                .min()
                .rename(columns={"_t": "_prev"})
            )
            counts.append(len(prev))
        return pa.table(
            {
                "step_idx": pa.array(np.arange(len(steps), dtype=np.int64)),
                "n": pa.array(np.asarray(counts, dtype=np.int64)),
            }
        )

    tagged = events.select_columns(
        [key_col, ts_col, type_col]
    ).map_batches(_tag, batch_format="pyarrow")
    partials = sorted_partition_apply(
        tagged.repartition(nparts), "_pid", _funnel, part_schema,
        boundaries=uniform_pid_bounds(nparts),
    )
    if final_partitions is not None:
        partials = partials.repartition(final_partitions)
    summed = partials.groupby("step_idx").aggregate(Sum("n", alias_name="n_users"))

    name_lut = np.asarray(steps, dtype=object)

    def _label(batch: pa.Table) -> pa.Table:
        idx = batch.column("step_idx").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "step_idx": batch.column("step_idx"),
                "step": pa.array(name_lut[idx].astype("U"), type=pa.string()),
                "n_users": batch.column("n_users"),
            }
        )

    return summed.map_batches(_label, batch_format="pyarrow")
