"""Shared Ray Data helpers."""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from concurrent.futures import ThreadPoolExecutor

import ray
import ray.data

# Spill directories created via make_spill_dir that have not been removed
# yet; cleaned at interpreter exit so lazy datasets that still read from a
# spill (e.g. the returned `scored_pairs` lineage) stay valid for the
# session but the parquet never outlives the process.
_SPILL_DIRS: set[str] = set()


def _cleanup_spill_dirs() -> None:
    for d in list(_SPILL_DIRS):
        shutil.rmtree(d, ignore_errors=True)
        _SPILL_DIRS.discard(d)


atexit.register(_cleanup_spill_dirs)


def make_spill_dir(prefix: str) -> str:
    """Create a tracked scratch directory for pair-scale parquet spills.

    Respects ``RAYLINK_SPILL_DIR`` then ``TMPDIR`` (via
    ``tempfile.gettempdir``); every directory is removed at interpreter
    exit, and callers that know the spill's lifetime should call
    :func:`remove_spill_dir` eagerly instead."""
    base = os.environ.get("RAYLINK_SPILL_DIR") or tempfile.gettempdir()
    d = tempfile.mkdtemp(prefix=prefix, dir=base)
    _SPILL_DIRS.add(d)
    return d


def remove_spill_dir(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
    _SPILL_DIRS.discard(path)


def from_arrow_blocks(table, n_blocks: int | None = None) -> ray.data.Dataset:
    """``ray.data.from_arrow`` with the table pre-split into ``n_blocks``
    slices. A single arrow table otherwise becomes ONE Ray Data block, which
    serializes every downstream map stage until the first shuffle."""
    import pyarrow as pa

    if table.schema.metadata:
        # pandas-written tables carry a b'pandas' schema-metadata blob;
        # metadata-bearing Arrow schemas are unhashable and make every
        # downstream Ray Data schema unification warn + skip its dedup
        # fast path — strip it here (zero-copy)
        table = table.replace_schema_metadata(None)
    if n_blocks is None:
        try:
            n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            n_blocks = 16
    n = table.num_rows
    if n == 0 or n_blocks <= 1:
        return ray.data.from_arrow(table)
    step = -(-n // n_blocks)
    slices = [table.slice(i, step) for i in range(0, n, step)]
    return ray.data.from_arrow(slices)


def materialize_concurrently(*datasets: ray.data.Dataset) -> list[ray.data.Dataset]:
    """Materialize several independent datasets in one scheduling wave.

    ``Dataset.materialize()`` blocks the driver; two small side-pipelines
    (e.g. the A- and B-side distinct-key+embed lineages) would otherwise
    serialize their fixed scheduling/actor-ramp latency. Driver threads just
    overlap the waits — execution itself stays in Ray."""
    with ThreadPoolExecutor(max_workers=len(datasets)) as pool:
        return list(pool.map(lambda d: d.materialize(), datasets))


def default_join_partitions(requested: int | None = None) -> int:
    """Hash-join partition count sized to the cluster.

    Each ``Dataset.join`` partition is backed by an aggregator actor; more
    aggregators than available CPUs deadlocks a chained-join pipeline on a
    small cluster (each actor reserves a scheduling slot while the upstream
    operators still need CPUs to produce input). Cap at the CPU count, and
    let the aggregators share CPUs fractionally (see :func:`hash_join`)."""
    if requested is not None:
        return requested
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(16, cpus))


def actor_pool_size(cap: int = 16) -> int:
    """Upper bound for autoscaling actor pools: the cluster CPU count,
    capped (the sandbox host's per-core throughput halves above ~16
    concurrent workers — BASELINE.md 'Scaling'); pools are declared
    ``concurrency=(1, actor_pool_size())`` so small sessions don't starve."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus))


@ray.remote(num_cpus=0)
class CounterActor:
    """Zero-CPU tally actor for fire-and-forget instrumentation counts
    (e.g. JW-evaluated pairs per tile in the fused stage)."""

    def __init__(self):
        self.n = 0

    def add(self, k: int) -> None:
        self.n += int(k)

    def total(self) -> int:
        return self.n


def hash_partition_ids(batch, key_cols: list[str], num_partitions: int):
    """Vectorized partition id per row: fixed-key hash of the string-joined
    key columns, mod P. Deterministic across processes (pandas' siphash with
    a pinned key), so both sides of a shuffle join co-locate."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    s = None
    for c in key_cols:
        col = pd.Series(batch.column(c).to_pandas()).astype(str)
        s = col if s is None else s.str.cat(col, sep="\x1f")
    h = pd.util.hash_array(s.to_numpy(dtype=object), hash_key="raylink_shuffle!")
    return pa.array((h % np.uint64(num_partitions)).astype(np.int32))


def pa_type(t) -> "pa.DataType":
    """Pandas-backed datasets report numpy dtypes / Python classes in
    Schema.types; normalize everything to Arrow DataTypes (object →
    string, the only ambiguous case)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(t, pa.DataType):
        return t
    try:
        dt = np.dtype(t)
        if dt == np.dtype(object):
            return pa.string()
        return pa.from_numpy_dtype(dt)
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()


def uniform_pid_bounds(nparts: int, space: int = 1 << 31) -> list[int]:
    """Explicit uniform sort boundaries for a column of siphash/mix64
    pids in ``[0, space)``: equal cuts are balanced because the hash is
    uniform, the sort skips its boundary-sampling pass, and no range can
    be empty past toy row counts (p = e^-(n/P)) — the same device
    ``shuffle_merge`` uses; see the RefBundle-warning notes there."""
    step = space // nparts
    return list(range(step, space, step))[: nparts - 1]


def skip_empty(fn):
    """Wrap a pyarrow ``map_batches`` UDF so 0-row input blocks yield
    NOTHING (no output bundle) and 0-row results are swallowed.

    Why: Ray 2.49 drops the schema when it wraps a 0-row map output into
    a RefBundle, so any empty block crossing a non-fused operator
    boundary fires ``RefBundle with a different schema`` executor
    warnings — and empty blocks are routine here (schema anchors from
    :func:`sorted_partition_apply`, Ray's own empty sort/aggregate range
    partitions). Apply to any library map that consumes the output of an
    exchange stage. Safe because every such consumer chain re-establishes
    its output schema via its own anchor or a downstream all-to-all.
    """

    def _wrapped(batch):
        if batch.num_rows == 0:
            return
        out = fn(batch)
        if out is not None and out.num_rows > 0:
            yield out

    return _wrapped


def sorted_partition_apply(
    ds: ray.data.Dataset,
    sort_key: str,
    fn,
    out_schema,
    boundaries: list | None = None,
    anchor: bool = True,
) -> ray.data.Dataset:
    """ONE range exchange (sort on ``sort_key``) + a whole-partition apply
    with a PINNED output schema — the executor-clean replacement for
    ``groupby(key).map_groups(fn)`` when the kernel is already vectorized
    over all groups of a partition.

    Why not map_groups: Ray 2.49's sort emits schema-less empty blocks for
    empty range partitions, and its map_groups wrapper yields NOTHING for
    them — both trigger ``RefBundle with a different schema`` executor
    warnings, and on a Ray version that acts on the mismatch they become a
    correctness hazard. Here (a) callers route on a HIGH-cardinality
    integer ``sort_key`` (hash of the group key mod 2^31, not mod
    #partitions) so sampled sort boundaries essentially never collide and
    empty sort partitions don't occur, and (b) every map output — including
    an empty partition's — is ``out_schema``-typed. Callers routing on a
    LOW-cardinality key (e.g. a P-valued ``_pid``) must pass EXPLICIT
    ``boundaries`` (``range(1, P)``) so sampled boundaries can't collide
    into schema-less empty sort partitions.

    ``fn(table: pa.Table) -> pa.Table`` receives a WHOLE sort partition
    (all groups whose key hashes into its range, each group complete) and
    must handle multiple groups per call; it runs once per partition, not
    once per group, which also drops map_groups' per-group Python call
    overhead."""
    import pyarrow as pa

    def _apply(block: pa.Table):
        if block.num_rows == 0:
            # yield NOTHING: the leading schema anchor (below) already
            # guarantees one typed block for the stage, and an empty
            # table emitted here crosses the next operator boundary as a
            # schema-LESS bundle (measured: Ray 2.49 drops the schema of
            # any 0-row map output), firing nonempty→empty RefBundle
            # warnings in every downstream queue
            return
        out = fn(block)
        if out.num_rows == 0:
            return
        if out.schema != out_schema:
            out = pa.Table.from_arrays(
                [out.column(f.name).cast(f.type) for f in out_schema],
                schema=out_schema,
            )
        yield out

    srt = ds.sort(sort_key) if boundaries is None else ds.sort(sort_key, boundaries=boundaries)
    mapped = srt.map_batches(_apply, batch_size=None, batch_format="pyarrow")
    if not anchor:
        # anchor-free variant for callers that feed ANOTHER map/exchange
        # stage and supply schemas explicitly (e.g. dedup_lines_global →
        # shuffle_merge with right_schema): the 0-row anchor block would
        # cross the consumer map as a schema-less bundle — the exact
        # warning the anchor exists to prevent at terminal outputs
        return mapped
    # schema anchor FIRST: the executor tolerates an empty-schema bundle
    # at the head of an output queue but warns on any nonempty→empty
    # transition — and a downstream map_batches turns a typed empty block
    # into a schema-LESS empty bundle (measured), so a trailing anchor
    # poisons every downstream stage's queue while a leading one is free
    return ray.data.from_arrow(out_schema.empty_table()).union(mapped)


def shuffle_merge(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_keys: list[str],
    right_keys: list[str],
    merge_fn,
    out_schema,
    num_partitions: int | None = None,
    left_schema=None,
    right_schema=None,
    anchor: bool = True,
) -> ray.data.Dataset:
    """Distributed hash join without ``Dataset.join`` (which crashes on
    sparse partitions in Ray 2.49 — see :func:`hash_join`).

    Both sides are tagged with ``_pid = hash(join keys) % 2^31`` under one
    union schema (right-side columns prefixed ``__r__`` to avoid clashes,
    absent columns null-padded — typed nulls, so Arrow schemas stay exact
    through the union), exchanged once via :func:`sorted_partition_apply`
    on ``_pid`` (equal join keys share a ``_pid`` so every key group lands
    whole in one range partition), and each PARTITION is merged by
    ``merge_fn(left_df, right_df) -> pandas.DataFrame`` — a vectorized
    pandas hash join over all of the partition's key groups at once.
    ``out_schema`` pins the output Arrow schema so all-NA payload
    partitions cannot drift types (and empty partitions emit typed empty
    tables instead of Ray's schema-less blocks).

    Scale contract: ONE all-to-all exchange of both inputs;
    ``num_partitions`` (default ~2× cluster CPUs; large-join callers
    override upward) bounds per-partition memory at (|L|+|R|)/P plus merge
    output via a pre-sort streaming repartition. Skewed join keys
    concentrate in a partition — the bound is the hottest key.
    """
    import pyarrow as pa

    if num_partitions is None:
        # ~2 partitions per CPU: enough parallelism for the per-partition
        # pandas merges without paying hundreds of tiny map_groups calls;
        # large-join callers override upward (per-partition memory = |L|+|R|
        # over P plus merge output)
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(16, cpus * 2)

    _pa_type = pa_type

    # Dataset.schema() on a LAZY input executes part of its lineage just to
    # learn the dtypes (a full sort for groupby-rooted lineages) — callers
    # chaining shuffle_merge should pass the known Arrow schemas explicitly.
    l_schema = left_schema if left_schema is not None else left.schema()
    r_schema = right_schema if right_schema is not None else right.schema()
    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    union_fields: list[tuple[str, "pa.DataType"]] = [
        (n, _pa_type(t)) for n, t in zip(l_names, l_schema.types)
    ] + [(f"__r__{n}", _pa_type(t)) for n, t in zip(r_names, r_schema.types)]

    # 2^31 pid values (NOT num_partitions): the range exchange samples sort
    # boundaries from the pid column, and a low-cardinality pid makes
    # boundary collisions — hence empty, schema-less sort partitions — a
    # birthday certainty once blocks outnumber distinct pids
    _PID_SPACE = 1 << 31

    def _tag(side: int, keys: list[str]):
        def _t(batch: pa.Table):
            if batch.num_rows == 0:
                # skip: upstream stages' schema anchors (and Ray's own
                # empty sort partitions) arrive here as 0-row blocks;
                # mapping them re-emits schema-less bundles mid-queue
                return
            pid = hash_partition_ids(batch, keys, _PID_SPACE)
            cols: dict[str, pa.Array] = {}
            for name, typ in union_fields:
                if side == 0 and not name.startswith("__r__") and name in batch.column_names:
                    cols[name] = batch.column(name)
                elif side == 1 and name.startswith("__r__") and name[5:] in batch.column_names:
                    cols[name] = batch.column(name[5:])
                else:
                    cols[name] = pa.nulls(len(batch), typ)
            cols["_pid"] = pid
            cols["_side"] = pa.array(
                [side] * len(batch), type=pa.int8()
            )
            yield pa.table(cols)

        return _t

    tagged = left.map_batches(_tag(0, left_keys), batch_format="pyarrow").union(
        right.map_batches(_tag(1, right_keys), batch_format="pyarrow")
    )

    def _merge(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_left = pc.equal(part.column("_side"), 0)
        ldf = part.filter(is_left).select(l_names).to_pandas()
        rtab = part.filter(pc.invert(is_left)).select(
            [f"__r__{n}" for n in r_names]
        )
        rdf = rtab.rename_columns(r_names).to_pandas()
        out = merge_fn(ldf, rdf)
        # column-wise conversion: NaN introduced by unmatched left-join rows
        # maps to typed nulls even for int/string target types (a whole-table
        # from_pandas would fail or let all-NA partitions drift to float64)
        arrays = [
            pa.array(out[f.name], type=f.type, from_pandas=True)
            for f in out_schema
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    # explicit UNIFORM boundaries over the full pid space: _pid is
    # siphash-uniform by construction, so equal cuts are balanced, the
    # sort skips its boundary-sampling pass, and sampled-boundary
    # collisions — the one remaining source of empty (schema-less,
    # warning-firing) sort partitions at realistic row counts — cannot
    # occur (a 1/P uniform slice of n hashed keys is empty with
    # probability e^-(n/P), i.e. never past toy sizes)
    step = _PID_SPACE // num_partitions
    bounds = list(range(step, _PID_SPACE, step))[: num_partitions - 1]
    # anchor=False: for callers that drive the result themselves (count /
    # collect / another typed exchange) and would rather have ZERO blocks
    # on an all-empty result than a 0-row anchor block — the anchor is a
    # from_arrow empty whose bundle can lose the streaming interleave race
    # and land mid-queue, firing the very warning it exists to prevent
    return sorted_partition_apply(
        tagged.repartition(num_partitions), "_pid", _merge, out_schema,
        boundaries=bounds, anchor=anchor,
    )


def hash_join(  # noqa: D401 — see warning below

    left: ray.data.Dataset,
    right: ray.data.Dataset,
    join_type: str,
    on: tuple,
    right_on: tuple | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """``Dataset.join`` with cluster-safe defaults: partition count scaled to
    CPUs and quarter-CPU aggregator actors so several joins can coexist in
    one streaming DAG without starving the map stages.

    WARNING (Ray 2.49.2): the built-in hash join crashes with
    ``ArrowInvalid: No match ... FieldRef`` whenever a hash partition
    receives zero rows on one side (the aggregator hands acero a
    schema-less empty table). Until that is fixed upstream, the pipeline
    avoids ``Dataset.join`` on any path where a side can be sparse and uses
    broadcast map-side joins (see ``link.join_payloads``) instead. Kept for
    dense–dense joins and future Ray versions."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=default_join_partitions(num_partitions),
        on=on,
        right_on=right_on,
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )
