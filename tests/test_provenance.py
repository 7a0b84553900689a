"""Per-stage provenance counters (stages/provenance.py) — the NiFi
ProvenanceReporter / relationship-transfer-count analog."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from nifi_processors_ray.stages.provenance import Provenance


def test_function_stage_counts_rows_and_routes():
    prov = Provenance()
    try:
        t = pa.table({"x": pa.array(np.arange(100, dtype=np.int64))})

        def route(batch: pa.Table) -> pa.Table:
            r = pc.if_else(pc.greater(batch["x"], 69),
                           pa.scalar("big"), pa.scalar("small"))
            return batch.append_column("route", r)

        def drop_odd(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(pc.bit_wise_and(batch["x"], 1), pa.scalar(0)))

        ds = rd.from_arrow(t).map_batches(
            prov.wrap("route", route, route_col="route"),
            batch_format="pyarrow")
        ds = ds.map_batches(prov.wrap("drop_odd", drop_odd),
                            batch_format="pyarrow")
        assert ds.count() == 50

        rep = prov.report()
        d = {s: i for i, s in enumerate(rep["stage"].to_pylist())}
        assert rep["rows_in"][d["route"]].as_py() == 100
        assert rep["rows_out"][d["route"]].as_py() == 100
        assert json.loads(rep["routes"][d["route"]].as_py()) == {
            "big": 30, "small": 70}
        assert rep["rows_in"][d["drop_odd"]].as_py() == 100
        assert rep["rows_out"][d["drop_odd"]].as_py() == 50
        assert rep["batches"][d["route"]].as_py() >= 1

        prov.reset()
        assert prov.report().num_rows == 0
    finally:
        prov.close()


def test_class_stage_constructed_once_per_actor_and_counted():
    prov = Provenance()
    try:
        class AddTag:
            def __init__(self, tag):
                self.tag = tag  # per-actor setup (the actor-pool pattern)

            def __call__(self, batch: pa.Table) -> pa.Table:
                n = batch.num_rows
                return batch.append_column(
                    "tag", pa.nulls(n, pa.string()).fill_null(self.tag))

        t = pa.table({"x": pa.array(np.arange(64, dtype=np.int64))})
        ds = rd.from_arrow(t).map_batches(
            prov.wrap_class("tagger", AddTag, fn_constructor_args=("T",)),
            batch_format="pyarrow", batch_size=16, concurrency=2)
        out = pa.table(ds.to_pandas())
        assert set(out["tag"].to_pylist()) == {"T"}

        rep = prov.report()
        assert rep["stage"].to_pylist() == ["tagger"]
        assert rep["rows_in"][0].as_py() == 64
        assert rep["rows_out"][0].as_py() == 64
        assert rep["batches"][0].as_py() >= 2  # batch_size forced splits
    finally:
        prov.close()
