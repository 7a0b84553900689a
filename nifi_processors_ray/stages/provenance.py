"""Per-stage provenance counters — the generic analog of NiFi's
per-processor provenance reporting (``session.getProvenanceReporter()
.modifyAttributes`` at SplitToAttribute.java:207, ``.create`` at
GenerateData.java:225, and the relationship transfer counts every
processor emits).

The CDC lake already has manifest-derived lineage (``state/lake.py``);
this module covers everything else: wrap any ``map_batches`` stage —
plain function or actor-pool class — and a zero-CPU named Ray actor
accumulates ``(batches, rows_in, rows_out)`` per stage plus optional
per-route counts (the multi-way-routing analog of NiFi relationships).

Design notes for scale:

* ONE counter actor per ``Provenance`` instance (``num_cpus=0`` — it
  occupies no slot); every wrapped batch sends one tiny synchronous RPC
  carrying three ints + a small dict. Against batches of 10^4-10^5 rows
  the per-batch RPC is noise; it is synchronous so ``report()`` is exact
  the moment the pipeline finishes (fire-and-forget would race the
  snapshot).
* Counters are additive and idempotence-free: a Ray task RETRY re-counts
  its batches (at-least-once). Provenance here is observability, not an
  exactly-once ledger — the lake's manifest lineage is the exact one.
"""

from __future__ import annotations

import json
import uuid

import pyarrow as pa
import pyarrow.compute as pc


def _counters_actor():
    import ray

    @ray.remote(num_cpus=0)
    class _ProvenanceCounters:
        def __init__(self):
            self.stages: dict[str, dict] = {}

        def add(self, stage: str, rows_in: int, rows_out: int,
                routes: dict[str, int] | None) -> None:
            s = self.stages.setdefault(
                stage, {"batches": 0, "rows_in": 0, "rows_out": 0,
                        "routes": {}})
            s["batches"] += 1
            s["rows_in"] += int(rows_in)
            s["rows_out"] += int(rows_out)
            for k, v in (routes or {}).items():
                s["routes"][k] = s["routes"].get(k, 0) + int(v)

        def snapshot(self) -> dict:
            return self.stages

        def reset(self) -> None:
            self.stages = {}

    return _ProvenanceCounters


def _route_counts(table: pa.Table, route_col: str) -> dict[str, int]:
    vc = pc.value_counts(table[route_col])
    return {str(d["values"]): int(d["counts"]) for d in vc.to_pylist()}


class Provenance:
    """Counter surface for a pipeline run.

    >>> prov = Provenance()
    >>> ds = ds.map_batches(prov.wrap("split", split_fn),
    ...                     batch_format="pyarrow")
    >>> ds = ds.map_batches(prov.wrap_class("rules", RuleEngineStage,
    ...                     fn_constructor_args=(spec,), route_col="route"),
    ...                     batch_format="pyarrow", concurrency=4)
    >>> ...consume ds...
    >>> prov.report()   # pa.Table: stage, batches, rows_in, rows_out, routes
    """

    def __init__(self, name: str | None = None):
        import ray

        self.name = name or f"provenance-{uuid.uuid4().hex[:12]}"
        self._handle = _counters_actor().options(
            name=self.name, get_if_exists=True).remote()

    # -- wrappers -----------------------------------------------------------

    def wrap(self, stage: str, fn, *, route_col: str | None = None):
        """Wrap a per-batch FUNCTION: counts flow through the named stage."""
        import ray

        handle = self._handle

        def wrapped(batch: pa.Table) -> pa.Table:
            out = fn(batch)
            routes = (_route_counts(out, route_col)
                      if route_col and route_col in out.column_names else None)
            ray.get(handle.add.remote(stage, batch.num_rows, out.num_rows,
                                      routes))
            return out

        return wrapped

    def wrap_class(self, stage: str, cls, *, fn_constructor_args=(),
                   fn_constructor_kwargs=None, route_col: str | None = None):
        """Wrap an actor-pool stage CLASS; construction still happens once
        per actor (the wrapped class instantiates ``cls`` in __init__)."""
        import ray

        handle = self._handle
        kwargs = fn_constructor_kwargs or {}

        class Wrapped:
            def __init__(self):
                self.inner = cls(*fn_constructor_args, **kwargs)

            def __call__(self, batch: pa.Table) -> pa.Table:
                out = self.inner(batch)
                routes = (_route_counts(out, route_col)
                          if route_col and route_col in out.column_names
                          else None)
                ray.get(handle.add.remote(stage, batch.num_rows,
                                          out.num_rows, routes))
                return out

        Wrapped.__name__ = f"Provenance({stage})"
        return Wrapped

    # -- reporting ----------------------------------------------------------

    def snapshot(self) -> dict:
        import ray

        return ray.get(self._handle.snapshot.remote())

    def report(self) -> pa.Table:
        """One row per stage: batches, rows_in, rows_out, routes (JSON,
        sorted keys — deterministic)."""
        snap = self.snapshot()
        stages = sorted(snap)
        return pa.table({
            "stage": pa.array(stages, pa.string()),
            "batches": pa.array([snap[s]["batches"] for s in stages],
                                pa.int64()),
            "rows_in": pa.array([snap[s]["rows_in"] for s in stages],
                                pa.int64()),
            "rows_out": pa.array([snap[s]["rows_out"] for s in stages],
                                 pa.int64()),
            "routes": pa.array(
                [json.dumps(snap[s]["routes"], sort_keys=True)
                 for s in stages], pa.string()),
        })

    def reset(self) -> None:
        import ray

        ray.get(self._handle.reset.remote())

    def close(self) -> None:
        """Tear down the counter actor (the instance is unusable after)."""
        import ray

        ray.kill(self._handle)
