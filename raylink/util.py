"""Shared Ray Data helpers."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import ray
import ray.data


def from_arrow_blocks(table, n_blocks: int | None = None) -> ray.data.Dataset:
    """``ray.data.from_arrow`` with the table pre-split into ``n_blocks``
    slices. A single arrow table otherwise becomes ONE Ray Data block, which
    serializes every downstream map stage until the first shuffle."""
    import pyarrow as pa

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
