"""Shared Ray Data helpers."""

from __future__ import annotations

import ray
import ray.data


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
