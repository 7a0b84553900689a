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


_STAGE_CACHE: dict = {}
_STAGE_CACHE_MAX = 64


def cached_stage(cls, *args, **kwargs):
    """Stateless ``map_batches`` wrapper around a stage CLASS whose setup
    is cheap (compiled regex alternations, tiny lookup tables, an
    ObjectRef to ``ray.get``): the instance is built ONCE PER WORKER
    PROCESS and reused across tasks, batches and pipelines — the same
    setup-once guarantee as an actor pool, without paying actor-pool
    startup (~1-2s on this host) on every pipeline launch, because plain
    tasks run on Ray's long-lived worker processes.

    Use an actor pool instead when the state is expensive enough that it
    must never be rebuilt (large models), must be bounded to N copies
    (GPU residency), or when per-actor accumulation matters (the
    provenance counter). Args/kwargs must be hashable (ObjectRefs are;
    pass specs as JSON strings)."""
    key = (cls.__module__, cls.__qualname__, args,
           tuple(sorted(kwargs.items())))

    def fn(batch):
        inst = _STAGE_CACHE.get(key)
        if inst is None:
            while len(_STAGE_CACHE) >= _STAGE_CACHE_MAX:
                _STAGE_CACHE.pop(next(iter(_STAGE_CACHE)))
            inst = _STAGE_CACHE.setdefault(key, cls(*args, **kwargs))
        return inst(batch)

    fn.__name__ = f"cached_{cls.__name__}"
    return fn
