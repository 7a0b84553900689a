"""Cluster-size-aware defaults for shuffle partition counts.

Every hash-partitioned stage (dedup segments, bucketed joins, windowed
exchanges) needs a partition count sized to the CLUSTER, not to the
single-node sandbox it was developed on: too few partitions caps shuffle
parallelism on a 256-node fleet; too many fragments a pytest-sized input
into sliver blocks. ``default_partitions`` resolves ``None`` to
``max(floor, cluster CPUs x per_cpu)`` at call time — each stage keeps
its historical floor so small-session behavior is unchanged, while a
8192-core cluster automatically fans the same pipeline out to
cluster-sized exchanges. Explicit values always win.
"""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    """Total CPUs Ray currently sees (``default`` when uninitialized —
    resolving must never force a ray.init; the driver owns the session)."""
    import ray

    if not ray.is_initialized():
        return default
    try:
        return int(ray.cluster_resources().get("CPU", default)) or default
    except Exception:  # pragma: no cover - resource query races teardown
        return default


def default_partitions(explicit: "int | None", floor: int,
                       per_cpu: float = 1.0) -> int:
    """Resolve a stage's partition count: ``explicit`` if given, else
    ``max(floor, cpus * per_cpu)``."""
    if explicit is not None:
        return int(explicit)
    return max(floor, int(cluster_cpus() * per_cpu))


def default_pool(explicit=None, *, floor: int = 2, per_cpu: float = 1.0):
    """Actor-pool ``concurrency`` for ``map_batches``: ``explicit`` if
    given, else an AUTOSCALING ``(1, max(floor, cpus * per_cpu))`` range —
    a fixed ``concurrency=2`` pins the stage at 2 workers on a 256-core
    cluster, while ``(1, cpus)`` lets Ray size the pool to the queue (and
    a 1-block pytest input no longer warns about an underfed min-2 pool).
    """
    if explicit is not None:
        return explicit
    return (1, max(floor, int(cluster_cpus() * per_cpu)))
