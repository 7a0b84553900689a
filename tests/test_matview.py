"""IncrementalAggView: incremental maintenance from the change feed must
equal a full recompute of the lake snapshot under updates that move keys
between groups, deletes, stale replays, and crash-resume at every commit
point."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from nifi_processors_ray.sources.changestream import (change_stream_batch,
                                                      expected_snapshot)
from nifi_processors_ray.state.lake import LakeTable
from nifi_processors_ray.state.matview import IncrementalAggView


def _lake(tmp_path, name="lake", **kw):
    kw.setdefault("num_partitions", 8)
    return LakeTable(str(tmp_path / name), key_cols=("repo", "path"),
                     seq_col="seq", op_col="op", **kw)


def _expected_agg(events: pa.Table, group="lang") -> pa.Table:
    snap = expected_snapshot(events)
    r = snap.group_by([group]).aggregate([("seq", "count")])
    r = r.rename_columns([{"seq_count": "cnt"}.get(c, c)
                          for c in r.column_names])
    return r.select([group, "cnt"]).sort_by([(group, "ascending")])


def test_matview_counts_match_full_recompute_per_epoch(tmp_path):
    lake = _lake(tmp_path)
    view = IncrementalAggView(lake, str(tmp_path / "view"), name="by_lang",
                              group_cols=["lang"])
    per, eps = 1500, 3
    for e in range(eps):
        lake.apply_epoch(
            rd.from_arrow(change_stream_batch(e * per, per, seed=13,
                                              n_repos=10,
                                              paths_per_repo=40)), e)
        got = view.refresh()
        want = _expected_agg(
            change_stream_batch(0, (e + 1) * per, seed=13, n_repos=10,
                                paths_per_repo=40))
        assert got.select(["lang", "cnt"]).equals(want)
    # no new epochs -> refresh is a no-op returning the same result
    assert view.refresh().select(["lang", "cnt"]).equals(want)


def test_matview_one_shot_equals_epochwise(tmp_path):
    events = change_stream_batch(0, 3000, seed=21, n_repos=12,
                                 paths_per_repo=30)
    lake = _lake(tmp_path)
    for e in range(3):
        lake.apply_epoch(rd.from_arrow(events.slice(e * 1000, 1000)), e)
    view = IncrementalAggView(lake, str(tmp_path / "view"), name="v",
                              group_cols=["lang"])
    got = view.refresh()
    assert got.select(["lang", "cnt"]).equals(_expected_agg(events))


def _toy_epochs():
    """Hand-built change stream: group moves, deletes, stale replays."""
    e0 = pa.table({
        "repo": ["r"] * 5, "path": ["a", "b", "c", "d", "f"],
        "lang": ["py", "py", "go", "go", "py"],
        "value": [1.0, 2.0, 4.0, 8.0, 256.0],
        "seq": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "op": ["upsert"] * 5,
    })
    e1 = pa.table({
        # a moves py->go with new value; c and f deleted; e appears; plus a
        # STALE update of b (seq 0 < 2) that must lose LWW and change nothing
        "repo": ["r"] * 5, "path": ["a", "c", "e", "b", "f"],
        "lang": ["go", "go", "rs", "java", "py"],
        "value": [16.0, 99.0, 32.0, 1000.0, 0.0],
        "seq": pa.array([10, 11, 12, 0, 13], pa.int64()),
        "op": ["upsert", "delete", "upsert", "upsert", "delete"],
    })
    e2 = pa.table({
        # e deleted; d updated in place; c reborn; and a STALE upsert of f
        # (seq 6 < its tombstone's 13) that must NOT resurrect it — the
        # winner-selection read must see the tombstone, not just live rows
        "repo": ["r"] * 4, "path": ["e", "d", "c", "f"],
        "lang": ["rs", "go", "py", "py"],
        "value": [0.0, 64.0, 128.0, 512.0],
        "seq": pa.array([20, 21, 22, 6], pa.int64()),
        "op": ["delete", "upsert", "upsert", "upsert"],
    })
    return [e0, e1, e2]


def _toy_expected(upto: int) -> pa.Table:
    events = pa.concat_tables(_toy_epochs()[:upto + 1])
    snap = expected_snapshot(events)
    r = snap.group_by(["lang"]).aggregate([("seq", "count"),
                                           ("value", "sum")])
    ren = {"seq_count": "cnt", "value_sum": "sum_value"}
    r = r.rename_columns([ren.get(c, c) for c in r.column_names])
    return r.select(["lang", "cnt", "sum_value"]).sort_by(
        [("lang", "ascending")])


def test_matview_sum_group_moves_deletes_stale(tmp_path):
    lake = _lake(tmp_path)
    view = IncrementalAggView(lake, str(tmp_path / "view"), name="v",
                              group_cols=["lang"], value_col="value")
    for e, tbl in enumerate(_toy_epochs()):
        lake.apply_epoch(rd.from_arrow(tbl), e)
        got = view.refresh()
        assert got.equals(_toy_expected(e)), f"epoch {e}: {got.to_pydict()}"


def test_matview_crash_resume_every_commit_point(tmp_path):
    lake = _lake(tmp_path)
    root = str(tmp_path / "view")
    epochs = _toy_epochs()

    # epoch 0: crash AFTER delta+gen were written, before anything else
    lake.apply_epoch(rd.from_arrow(epochs[0]), 0)
    v = IncrementalAggView(lake, root, name="v", group_cols=["lang"],
                           value_col="value")
    v._compute_delta([0], 0)  # then "crash"
    v2 = IncrementalAggView(lake, root, name="v", group_cols=["lang"],
                            value_col="value")
    assert v2.refresh().equals(_toy_expected(0))

    # epoch 1: crash after delta+gen AND the state epoch, before the fold
    lake.apply_epoch(rd.from_arrow(epochs[1]), 1)
    v2._compute_delta([1], 1)
    v2.state.apply_epoch(v2._changes([1]), 1)  # then "crash"
    v3 = IncrementalAggView(lake, root, name="v", group_cols=["lang"],
                            value_col="value")
    assert v3.refresh().equals(_toy_expected(1))

    # epoch 2: crash after everything except the consumer checkpoint
    lake.apply_epoch(rd.from_arrow(epochs[2]), 2)
    v3._compute_delta([2], 2)
    v3._finish_generation(2, [2])
    v4 = IncrementalAggView(lake, root, name="v", group_cols=["lang"],
                            value_col="value")
    assert v4.refresh().equals(_toy_expected(2))
    # all epochs drained and checkpointed -> lake may GC the fragments
    assert lake._consumers()["v"] == 2


def test_matview_small_fast_path_equals_distributed(tmp_path):
    """small_bytes=0 forces the distributed delta pipeline; the default
    driver-side fast path must produce the identical view state across
    epochs that exercise group moves, deletes, stale replays and
    tombstone-beats-stale-upsert (the standard guarded-stage equivalence
    contract)."""
    lake_a = _lake(tmp_path, "lake_a")
    lake_b = _lake(tmp_path, "lake_b")
    fast = IncrementalAggView(lake_a, str(tmp_path / "view_a"), name="v",
                              group_cols=["lang"], value_col="value")
    dist = IncrementalAggView(lake_b, str(tmp_path / "view_b"), name="v",
                              group_cols=["lang"], value_col="value",
                              small_bytes=0)
    for e, tbl in enumerate(_toy_epochs()):
        lake_a.apply_epoch(rd.from_arrow(tbl), e)
        lake_b.apply_epoch(rd.from_arrow(tbl), e)
        got_fast = fast.refresh()
        got_dist = dist.refresh()
        assert got_fast.equals(got_dist), f"epoch {e}"
        assert got_fast.equals(_toy_expected(e)), f"epoch {e}"


def test_matview_changed_key_broadcast_guard(tmp_path):
    lake = _lake(tmp_path)
    lake.apply_epoch(
        rd.from_arrow(change_stream_batch(0, 400, seed=5, n_repos=10,
                                          paths_per_repo=40)), 0)
    view = IncrementalAggView(lake, str(tmp_path / "view"), name="v",
                              group_cols=["lang"], max_changed_keys=10)
    with pytest.raises(ValueError, match="distinct keys"):
        view.refresh()


def test_lake_read_pid_pruning(tmp_path):
    lake = _lake(tmp_path)
    events = change_stream_batch(0, 800, seed=9, n_repos=10,
                                 paths_per_repo=40)
    lake.apply_epoch(rd.from_arrow(events), 0)
    from nifi_processors_ray.functions.hashing import hash64_columns
    full = lake.read_table()
    pids = hash64_columns(full, ["repo", "path"]) % np.uint64(8)
    for p in (0, 3):
        want = full.filter(pa.array(pids == p)).sort_by(
            [("repo", "ascending"), ("path", "ascending"), ("seq", "ascending")])
        got_ds = lake.read(pids={p})
        got = pa.concat_tables(
            [pa.Table.from_pandas(got_ds.to_pandas(),
                                  schema=want.schema)]).sort_by(
            [("repo", "ascending"), ("path", "ascending"), ("seq", "ascending")])
        assert got.equals(want)
    assert lake.read(pids=set()).count() == 0


def test_matview_guard_counts_distinct_keys_not_batch_sum(tmp_path):
    """Keys repeating across epochs/batches must NOT trip the guard: the
    cap measures actual distinct keys (ADVICE r3 — the pre-dedup running
    sum spuriously rejected refreshes well under the cap)."""
    lake = _lake(tmp_path)
    # the same 20 (repo, path) keys rewritten across 4 epochs -> 80 change
    # rows but only 20 distinct keys
    for e in range(4):
        t = pa.table({
            "repo": ["r"] * 20,
            "path": [f"p{i}" for i in range(20)],
            "lang": ["py"] * 20,
            "seq": pa.array(np.arange(20, dtype=np.int64) + e * 20),
            "op": ["upsert"] * 20,
        })
        lake.apply_epoch(rd.from_arrow(t), e)
    view = IncrementalAggView(lake, str(tmp_path / "view"), name="v",
                              group_cols=["lang"], max_changed_keys=25)
    got = view.refresh()
    assert got["cnt"].to_pylist() == [20]
