"""CDC lake: LWW correctness, exactly-once replay, resume, schema evolution,
deletes — verified against an independent pyarrow-only snapshot
(north rule: per-row sha256(content) equality after full replay)."""

import os

import pyarrow as pa
import pytest
import ray.data as rd

from nifi_processors_ray.pipelines.cdc import ingest_stream, replay_verify
from nifi_processors_ray.sources.changestream import (
    change_stream,
    change_stream_batch,
    expected_snapshot,
)
from nifi_processors_ray.state.lake import LakeTable, latest_by_key

N = 8000
EPOCHS = 4


def _events(author_from=None):
    return change_stream_batch(0, N, seed=7, n_repos=20, paths_per_repo=50,
                               author_from=author_from)


def _epoch_datasets(author_from=None):
    per = N // EPOCHS
    return [
        rd.from_arrow(
            change_stream_batch(i * per, per, seed=7, n_repos=20, paths_per_repo=50,
                                author_from=author_from)
        )
        for i in range(EPOCHS)
    ]


def test_generator_partition_independent():
    whole = change_stream_batch(0, 1000, seed=3)
    parts = pa.concat_tables(
        [change_stream_batch(0, 170, seed=3), change_stream_batch(170, 830, seed=3)]
    )
    assert whole.equals(parts)


def test_change_stream_dataset_matches_batch():
    ds = change_stream(500, num_blocks=7, seed=11)
    got = ds.to_arrow_refs()
    tbl = pa.concat_tables([pa.Table.from_pandas(ds.to_pandas())])
    direct = change_stream_batch(0, 500, seed=11)
    assert tbl.sort_by("seq").equals(direct.select(tbl.column_names).sort_by("seq"))


def test_latest_by_key():
    t = pa.table(
        {
            "repo": ["a", "a", "b", "a"],
            "path": ["p", "p", "p", "q"],
            "seq": [1, 5, 2, 3],
            "v": ["old", "new", "b1", "q1"],
        }
    )
    out = latest_by_key(t, ["repo", "path"], "seq").sort_by("seq")
    assert out["v"].to_pylist() == ["b1", "q1", "new"]


def test_full_replay_matches_reference_snapshot(tmp_path):
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=8)
    ingest_stream(lake, _epoch_datasets())
    assert replay_verify(lake, expected_snapshot(_events()))


def test_epoch_replay_is_idempotent(tmp_path):
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=8)
    eps = _epoch_datasets()
    ingest_stream(lake, eps)
    # duplicate delivery of every epoch: committed manifests short-circuit
    m2 = ingest_stream(lake, _epoch_datasets())
    assert [m["epoch"] for m in m2] == list(range(EPOCHS))
    assert replay_verify(lake, expected_snapshot(_events()))


def test_resume_after_partial_ingest(tmp_path):
    # kill-after-epoch-k: ingest only first 2 epochs, then "resume" the run
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=8)
    ingest_stream(lake, _epoch_datasets()[:2])
    assert lake.committed_epochs() == [0, 1]
    lake2 = LakeTable(str(tmp_path / "lake"))  # reopen from disk config
    ingest_stream(lake2, _epoch_datasets())
    assert lake2.committed_epochs() == [0, 1, 2, 3]
    assert replay_verify(lake2, expected_snapshot(_events()))


def test_uncommitted_epoch_is_replayed(tmp_path):
    # simulate a crash between delta write and manifest commit
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    eps = _epoch_datasets()
    ingest_stream(lake, eps[:1])
    os.unlink(os.path.join(str(tmp_path / "lake"), "_manifests", "epoch-0.json"))
    assert lake.committed_epochs() == []
    ingest_stream(lake, _epoch_datasets())  # epoch 0 rewritten identically
    assert replay_verify(lake, expected_snapshot(_events()))


def test_compaction_preserves_state_and_bounds_files(tmp_path):
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=8)
    ingest_stream(lake, _epoch_datasets())
    before = expected_snapshot(_events())
    m = lake.compact()
    assert sorted(m["epochs"]) == list(range(EPOCHS))
    assert replay_verify(lake, before)
    # folded delta fragments are GC'd (including any orphans)
    d = tmp_path / "lake" / "deltas"
    assert not d.exists() or not list(d.iterdir())
    # further epochs after compaction still merge correctly
    extra = rd.from_arrow(change_stream_batch(N, 2000, seed=7, n_repos=20,
                                              paths_per_repo=50))
    lake.apply_epoch(extra, EPOCHS)
    full = pa.concat_tables(
        [_events(), change_stream_batch(N, 2000, seed=7, n_repos=20, paths_per_repo=50)]
    )
    assert replay_verify(lake, expected_snapshot(full))


def test_additive_schema_evolution(tmp_path):
    # epochs 0-1 without author column; epochs 2-3 carry it (seq >= N/2)
    per = N // EPOCHS
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=8)
    for i in range(EPOCHS):
        author_from = None if i < 2 else N // 2
        tbl = change_stream_batch(i * per, per, seed=7, n_repos=20, paths_per_repo=50,
                                  author_from=author_from)
        lake.apply_epoch(rd.from_arrow(tbl), i)
    final = lake.read_table()
    assert "author" in final.column_names
    # old rows null-backfilled, new rows populated
    import pyarrow.compute as pc

    old = final.filter(pc.less(final["seq"], N // 2))
    new = final.filter(pc.greater_equal(final["seq"], N // 2))
    assert old.num_rows > 0 and new.num_rows > 0
    assert pc.count(old["author"], mode="only_valid").as_py() == 0
    assert pc.count(new["author"], mode="only_null").as_py() == 0
    # and content still matches the independent snapshot
    assert replay_verify(lake, expected_snapshot(_events(author_from=N // 2)))


def test_deletes_drop_rows(tmp_path):
    t = pa.table(
        {
            "repo": ["r", "r", "r"],
            "path": ["a", "a", "b"],
            "commit": ["c1", "c2", "c3"],
            "lang": ["py"] * 3,
            "content": ["v1", "v2", "bb"],
            "op": ["upsert", "delete", "upsert"],
            "seq": [1, 2, 3],
        }
    )
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_epoch(rd.from_arrow(t), 0)
    final = lake.read_table()
    assert final.num_rows == 1
    assert final["path"].to_pylist() == ["b"]


def test_duplicate_events_across_epochs(tmp_path):
    # at-least-once delivery: the same event appears in two different
    # epochs -> the final table must still hold exactly one row per key
    t = pa.table(
        {
            "repo": ["r", "r"],
            "path": ["a", "b"],
            "commit": ["c1", "c2"],
            "lang": ["py", "py"],
            "content": ["va", "vb"],
            "op": ["upsert", "upsert"],
            "seq": [1, 2],
        }
    )
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_epoch(rd.from_arrow(t), 0)
    lake.apply_epoch(rd.from_arrow(t), 1)  # duplicate delivery, new epoch id
    final = lake.read_table()
    assert final.num_rows == 2
    assert sorted(final["path"].to_pylist()) == ["a", "b"]
    lake.compact()
    assert lake.read_table().num_rows == 2


def test_concurrent_epoch_ingest_matches(tmp_path):
    # epochs applied concurrently (LWW makes order irrelevant) must yield
    # the same final state as sequential ingest
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=8)
    ingest_stream(lake, _epoch_datasets(), max_in_flight=4)
    assert sorted(lake.committed_epochs()) == list(range(EPOCHS))
    assert replay_verify(lake, expected_snapshot(_events()))


def test_lineage_counters(tmp_path):
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=8)
    ingest_stream(lake, _epoch_datasets())
    lin = lake.lineage()
    assert sorted(set(lin["epoch"].to_pylist())) == list(range(EPOCHS))
    # committed deltas sum to the manifest totals
    import json
    total = 0
    for e in range(EPOCHS):
        with open(tmp_path / "lake" / "_manifests" / f"epoch-{e}.json") as f:
            total += json.load(f)["rows_delta"]
    import pyarrow.compute as pc
    assert pc.sum(lin["rows_delta"]).as_py() == total


def test_orphan_fragment_invisible_and_gcd(tmp_path):
    # a fragment written by a crashed/retried task (present on disk, absent
    # from every manifest) must never be read, and compaction removes it
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=8)
    ingest_stream(lake, _epoch_datasets())
    before = lake.read_table()
    orphan = pa.table({
        "repo": ["zzz"], "path": ["zzz"], "commit": ["x"], "lang": ["py"],
        "content": ["POISON"], "op": ["upsert"], "seq": [10**9],
    })
    import pyarrow.parquet as pq
    pq.write_table(orphan, str(tmp_path / "lake" / "deltas" /
                               "epoch-0-deadbeefdeadbeef.parquet"))
    after = lake.read_table()
    assert after.equals(before)  # orphan invisible
    lake.compact()
    assert not list((tmp_path / "lake" / "deltas").iterdir())  # orphan GC'd
    assert lake.read_table().sort_by("seq").equals(before.sort_by("seq"))


def test_concurrent_ingest_with_read_factories(tmp_path):
    # factories that construct read_parquet datasets from pool threads
    # (construction is lock-serialized inside ingest_stream; execution
    # overlaps) — regression for the fsspec lazy-import race
    per = N // EPOCHS
    import pyarrow.parquet as pq
    for i in range(EPOCHS):
        d = tmp_path / "stream" / f"epoch={i}"
        d.mkdir(parents=True)
        pq.write_table(change_stream_batch(i * per, per, seed=7, n_repos=20,
                                           paths_per_repo=50),
                       str(d / "part.parquet"))
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=8)
    ingest_stream(
        lake,
        [(lambda i=i: rd.read_parquet(str(tmp_path / "stream" / f"epoch={i}")))
         for i in range(EPOCHS)],
        max_in_flight=4,
    )
    assert replay_verify(lake, expected_snapshot(_events()))


def test_hot_partition_salted_split(tmp_path):
    # skew mitigation (north rule): a partition whose resolved state exceeds
    # salt_threshold is split at compaction into bounded pid=<p>-s<k> files
    # by hash of the last key column; state is unchanged and further merges
    # (which glob both plain and salted files) still resolve correctly
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=2,
                     salt_threshold=150)
    ingest_stream(lake, _epoch_datasets())
    before = expected_snapshot(_events())
    assert replay_verify(lake, before)
    lake.compact()
    base = tmp_path / "lake" / "base" / "v=0"
    salted = [f.name for f in base.iterdir() if "-s" in f.name]
    assert salted, "expected salted sub-files for oversized partitions"
    import pyarrow.parquet as pq
    assert all(pq.read_metadata(base / f).num_rows <= 2 * 150 for f in salted)
    assert replay_verify(lake, before)
    # post-compaction epoch merges against the salted base
    extra = rd.from_arrow(change_stream_batch(N, 1000, seed=7, n_repos=20,
                                              paths_per_repo=50))
    lake.apply_epoch(extra, EPOCHS)
    full = pa.concat_tables(
        [_events(), change_stream_batch(N, 1000, seed=7, n_repos=20,
                                        paths_per_repo=50)]
    )
    assert replay_verify(lake, expected_snapshot(full))
    # SECOND compaction must fold the new epoch against the salted base via
    # aligned sub-partition tasks (never re-reading a whole pid) and still
    # resolve exactly; salts are recorded in the manifest
    m2 = lake.compact()
    assert replay_verify(lake, before := expected_snapshot(full))
    assert any(int(v["salts"]) > 1 for v in m2["partitions"].values())
    # every sub-file is bounded: a compaction task's OUTPUT is its whole
    # input sub-partition post-LWW, so this also bounds per-task work
    import pyarrow.parquet as pq
    base2 = tmp_path / "lake" / "base" / "v=1"
    for f in base2.iterdir():
        assert pq.read_metadata(base2 / f.name).num_rows <= 2 * 150


def test_salt_plan_power_of_two_alignment(tmp_path):
    """k always a power of two and >= 1; a task at width k against a base
    at width k_old reads exactly the aligned sub-files (checked indirectly:
    state equality across compactions where k grows)."""
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=2,
                     salt_threshold=100)
    per = N // EPOCHS
    # epoch 0 -> compact (small base, maybe k=1..) -> more epochs -> compact
    lake.apply_epoch(rd.from_arrow(change_stream_batch(0, per, seed=7,
                                                       n_repos=20,
                                                       paths_per_repo=50)), 0)
    lake.compact()
    plan0 = lake._salt_plan(*lake._pending_state())
    for k, _k_old in plan0.values():
        assert k & (k - 1) == 0 and k >= 1
    for i in range(1, EPOCHS):
        lake.apply_epoch(
            rd.from_arrow(change_stream_batch(i * per, per, seed=7,
                                              n_repos=20, paths_per_repo=50)),
            i)
    lake.compact()
    plan1 = lake._salt_plan(*lake._pending_state())
    # k grew with data volume and stays pow2
    assert max(k for k, _ in plan1.values()) >= max(k for k, _ in plan0.values())
    for k, _k_old in plan1.values():
        assert k & (k - 1) == 0
    assert replay_verify(lake, expected_snapshot(_events()))


def test_seq_dtype_guard(tmp_path):
    """Unsigned seq within int64 range is accepted (cast); null seq is
    rejected loudly instead of silently corrupting LWW order."""
    from nifi_processors_ray.state.lake import _seq_sort_key
    import numpy as np

    u = pa.chunked_array([pa.array([5, 0, 3], pa.uint64())])
    out = _seq_sort_key(u)
    assert out.dtype == np.int64 and list(out) == [5, 0, 3]
    with pytest.raises(pa.ArrowInvalid):
        _seq_sort_key(pa.array([2**63], pa.uint64()))  # out of int64 range
    with pytest.raises(ValueError):
        _seq_sort_key(pa.array([1, None], pa.int64()))
    with pytest.raises(TypeError):
        _seq_sort_key(pa.array(["x"], pa.string()))
    # end-to-end: uint64 seq stream resolves LWW correctly (seq=0 must lose)
    t = pa.table({
        "repo": ["r", "r"], "path": ["p", "p"],
        "seq": pa.array([7, 0], pa.uint64()),
        "op": ["upsert", "upsert"],
        "content": ["new", "old"],
    })
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_epoch(rd.from_arrow(t), 0)
    got = lake.read_table()
    assert got.num_rows == 1 and got["content"].to_pylist() == ["new"]


def test_read_column_projection(tmp_path):
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    ingest_stream(lake, _epoch_datasets())
    full = lake.read_table()
    got = pa.table(lake.read(columns=["repo", "path", "seq"]).to_pandas())
    assert sorted(got.column_names) == ["path", "repo", "seq"]
    assert got.num_rows == full.num_rows
    a = got.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = (full.select(["repo", "path", "seq"]).to_pandas()
         .sort_values(["repo", "path"]).reset_index(drop=True))
    assert a[["repo", "path", "seq"]].equals(b)
    # projection survives compaction + salting
    lake.compact()
    got2 = pa.table(lake.read(columns=["repo", "path", "seq"]).to_pandas())
    assert got2.num_rows == full.num_rows


def test_changes_feed(tmp_path):
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    eps = _epoch_datasets()
    ingest_stream(lake, eps)
    # full feed covers every committed (post-combiner) row
    feed = pa.table(lake.changes().to_pandas())
    manifests = [lake._read_manifest(f"epoch-{e}.json")
                 for e in lake.committed_epochs()]
    assert feed.num_rows == sum(m["rows_delta"] for m in manifests)
    assert set(feed["_epoch"].to_pylist()) == {0, 1, 2, 3}
    # incremental: only epochs after the checkpoint
    inc = pa.table(lake.changes(since_epoch=1).to_pandas())
    assert set(inc["_epoch"].to_pylist()) == {2, 3}
    assert inc.num_rows == sum(m["rows_delta"] for m in manifests[2:])
    # column projection on the feed
    slim = pa.table(lake.changes(columns=["repo", "seq"]).to_pandas())
    assert sorted(slim.column_names) == ["_epoch", "repo", "seq"]
    # after compaction the folded fragments are gone -> loud error
    lake.compact()
    import pytest as _pytest
    with _pytest.raises(Exception, match="GC'd|RayTaskError"):
        lake.changes().to_pandas()


def test_consumer_checkpoint_survives_compaction(tmp_path):
    """Enforced retention: a registered consumer's undrained epochs keep
    their delta fragments through a compaction; once the checkpoint
    commits past them, gc() reclaims the files (round-2 verdict #8)."""
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    assert lake.register_consumer("etl") == -1
    ingest_stream(lake, _epoch_datasets())
    rows_before = lake.read_table().num_rows

    # drain epochs 0-1, checkpoint, then compact: epochs 2-3 undrained
    ds, eps = lake.consume_changes("etl")
    assert eps == [0, 1, 2, 3]
    assert pa.table(ds.to_pandas()).num_rows > 0
    lake.commit_consumer("etl", 1)
    lake.compact()
    assert lake.read_table().num_rows == rows_before  # state unaffected

    # the feed past the checkpoint is STILL readable post-compaction
    ds2, eps2 = lake.consume_changes("etl")
    assert eps2 == [2, 3]
    feed = pa.table(ds2.to_pandas())
    assert set(feed["_epoch"].to_pylist()) == {2, 3}
    manifests = [lake._read_manifest(f"epoch-{e}.json") for e in (2, 3)]
    assert feed.num_rows == sum(m["rows_delta"] for m in manifests)
    assert lake.verify_integrity()["ok"]

    # commit past everything -> gc reclaims the retained fragments
    lake.commit_consumer("etl", 3)
    removed = lake.gc()["removed"]
    assert any("epoch-2-" in r for r in removed)
    assert any("epoch-3-" in r for r in removed)
    ds3, eps3 = lake.consume_changes("etl")
    assert eps3 == []
    assert lake.verify_integrity()["ok"]
    # checkpoints are monotone; unknown consumers are loud
    assert lake.commit_consumer("etl", 1) == 3
    with pytest.raises(KeyError, match="unregistered"):
        lake.consume_changes("nope")


def test_changed_keys_incremental_refresh_input(tmp_path):
    """changed_keys(since) = distinct keys in the chosen epochs' deltas —
    verified against a pyarrow recomputation from the raw events."""
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    ingest_stream(lake, _epoch_datasets())
    per = N // EPOCHS
    got = pa.table(lake.changed_keys(since_epoch=1).to_pandas()).sort_by(
        [("repo", "ascending"), ("path", "ascending")])
    raw = change_stream_batch(2 * per, 2 * per, seed=7, n_repos=20,
                              paths_per_repo=50)
    want = raw.select(["repo", "path"]).group_by(
        ["repo", "path"]).aggregate([]).sort_by(
        [("repo", "ascending"), ("path", "ascending")])
    assert got.equals(want)
    # all epochs -> every key ever touched
    all_keys = lake.changed_keys().count()
    raw_all = change_stream_batch(0, N, seed=7, n_repos=20, paths_per_repo=50)
    assert all_keys == raw_all.select(["repo", "path"]).group_by(
        ["repo", "path"]).aggregate([]).num_rows


def test_export_snapshot_resumable(tmp_path):
    """Partitioned export writes one file + .done marker per (pid, salt)
    and a re-run skips completed partitions (kill-resume: deleting one
    marker re-exports exactly that partition)."""
    import pyarrow.parquet as pq

    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    ingest_stream(lake, _epoch_datasets())
    want = lake.read_table()
    out = str(tmp_path / "export")
    r1 = lake.export_snapshot(out)
    assert r1["rows"] == want.num_rows and not r1["skipped"]
    got = pa.concat_tables([
        pq.read_table(os.path.join(out, f)) for f in r1["files"]])
    assert got.num_rows == want.num_rows
    assert (got.select(["repo", "path", "seq"]).sort_by(
        [("repo", "ascending"), ("path", "ascending")]).equals(
        want.select(["repo", "path", "seq"]).sort_by(
            [("repo", "ascending"), ("path", "ascending")])))

    # resume: everything already done -> all skipped, zero rows rewritten
    r2 = lake.export_snapshot(out)
    assert r2["rows"] == 0 and len(r2["skipped"]) == len(
        [f for f in os.listdir(out) if f.endswith(".done")])

    # kill-resume: drop one marker -> exactly that partition re-exports
    victim = r1["files"][0].replace(".parquet", ".done")
    os.unlink(os.path.join(out, victim))
    r3 = lake.export_snapshot(out)
    assert r3["files"] == [r1["files"][0]]
    assert r3["rows"] == pq.read_table(
        os.path.join(out, r1["files"][0])).num_rows

    # column projection export
    out2 = str(tmp_path / "export2")
    r4 = lake.export_snapshot(out2, columns=["repo", "seq"])
    t2 = pq.read_table(os.path.join(out2, r4["files"][0]))
    assert t2.column_names == ["repo", "seq"]


def test_time_travel_read_as_of_epoch(tmp_path):
    """as_of_epoch reconstructs earlier snapshots exactly: from base +
    retained deltas after a compaction (registered consumer keeps the
    fragments alive), and loudly refuses when fragments are gone."""
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    lake.register_consumer("tt")  # retention: fragments survive compaction
    eps = _epoch_datasets()
    per = N // EPOCHS
    snapshots = {}
    for i, ds in enumerate(eps):
        lake.apply_epoch(ds, i)
        snapshots[i] = expected_snapshot(
            change_stream_batch(0, (i + 1) * per, seed=7, n_repos=20,
                                paths_per_repo=50))
    lake.compact()
    for i in range(EPOCHS):
        got = lake.read_table(as_of_epoch=i)
        exp = snapshots[i]
        assert got.num_rows == exp.num_rows, f"epoch {i}"
        g = got.select(["repo", "path", "seq"]).sort_by(
            [("repo", "ascending"), ("path", "ascending")])
        e = exp.select(["repo", "path", "seq"]).sort_by(
            [("repo", "ascending"), ("path", "ascending")])
        assert g.equals(e), f"epoch {i}"
    # streaming variant agrees
    ds_rows = lake.read(as_of_epoch=1).count()
    assert ds_rows == snapshots[1].num_rows
    # latest as-of equals the current state
    assert lake.read_table(as_of_epoch=EPOCHS - 1).num_rows == \
        lake.read_table().num_rows

    # drain + gc -> fragments gone -> pre-compaction snapshots refuse loudly
    lake.commit_consumer("tt", EPOCHS - 1)
    lake.gc()
    with pytest.raises(FileNotFoundError, match="cannot reconstruct"):
        lake.read_table(as_of_epoch=0)
    # the compacted-at snapshot still works (base covers it)
    assert lake.read_table(as_of_epoch=EPOCHS - 1).num_rows == \
        snapshots[EPOCHS - 1].num_rows


def test_legacy_salted_base_layout_readable(tmp_path):
    """On-disk compat (round-2 advice): bases written by the pre-round-2
    compactor (pid=<p>-s<t>.parquet with a NON-power-of-two salt count and
    no 'partitions' key in the compact manifest) must resolve fully — the
    alignment math would otherwise silently read them as empty — and the
    next compaction migrates them to the current layout."""
    import json as _json

    import numpy as np
    import pyarrow.parquet as pq
    from nifi_processors_ray.functions.hashing import hash64_columns

    root = str(tmp_path / "lake")
    lake = LakeTable(root, num_partitions=4)
    ingest_stream(lake, _epoch_datasets())
    want = lake.read_table().sort_by([("repo", "ascending"),
                                      ("path", "ascending")])
    lake.compact()

    # rewrite the base into the legacy layout: every pid split into 3
    # (non-power-of-two) salt files by hash(last key col) % 3, manifest
    # stripped of its 'partitions' key
    bdir = os.path.join(root, "base", "v=0")
    for fn in list(os.listdir(bdir)):
        pid = int(fn.split("=")[1].split(".")[0].split("-")[0])
        t = pq.read_table(os.path.join(bdir, fn))
        os.unlink(os.path.join(bdir, fn))
        h = hash64_columns(t, ["path"]) % np.uint64(3)
        for s in range(3):
            sub = t.filter(pa.array(h == s))
            if sub.num_rows:
                pq.write_table(sub, os.path.join(
                    bdir, f"pid={pid}-s{s}.parquet"))
    mpath = os.path.join(root, "_manifests", "compact-0.json")
    with open(mpath) as f:
        m = _json.load(f)
    del m["partitions"]
    with open(mpath, "w") as f:
        _json.dump(m, f)

    lake2 = LakeTable(root)
    got = lake2.read_table().sort_by([("repo", "ascending"),
                                      ("path", "ascending")])
    assert got.equals(want)
    got_ds = pa.table(lake2.read().to_pandas()).sort_by(
        [("repo", "ascending"), ("path", "ascending")])
    assert got_ds.select(want.column_names).equals(want)

    # new deltas on top of a legacy base resolve and compact correctly
    extra = rd.from_arrow(change_stream_batch(N, 500, seed=7, n_repos=20,
                                              paths_per_repo=50))
    lake2.apply_epoch(extra, 99)
    events = pa.concat_tables([_events(),
                               change_stream_batch(N, 500, seed=7, n_repos=20,
                                                   paths_per_repo=50)])
    exp = expected_snapshot(events)
    assert lake2.read_table().num_rows == exp.num_rows
    lake2.compact()  # migrates: new manifest has partitions metadata
    assert "partitions" in lake2._read_manifest("compact-1.json")
    assert lake2.read_table().num_rows == exp.num_rows
    assert lake2.verify_integrity()["ok"]


def test_incremental_compaction_links_untouched_partitions(tmp_path):
    """A second compaction whose deltas touch ONE pid must hard-link every
    other sub-partition forward (same inode, no rewrite) — compaction cost
    is bounded by touched data, not table size."""
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=8)
    ingest_stream(lake, _epoch_datasets())
    lake.compact()
    v0 = tmp_path / "lake" / "base" / "v=0"
    inodes_before = {f.name: f.stat().st_ino for f in v0.iterdir()}

    # one new key -> exactly one pid touched
    one = pa.table({
        "repo": ["only/one"], "path": ["p"], "commit": ["c"],
        "lang": ["py"], "content": ["x"], "op": ["upsert"],
        "seq": [10_000_000],
    })
    lake.apply_epoch(rd.from_arrow(one), EPOCHS)
    from nifi_processors_ray.functions.hashing import hash64_columns
    touched_pid = int(hash64_columns(one, ["repo", "path"])[0]) % 8

    lake.compact()
    v1 = tmp_path / "lake" / "base" / "v=1"
    linked = rewritten = 0
    for f in v1.iterdir():
        pid = int(f.name.split("=")[1].split(".")[0].split("-")[0])
        if pid == touched_pid:
            rewritten += 1
            assert f.stat().st_ino != inodes_before.get(f.name)
        else:
            linked += 1
            assert f.stat().st_ino == inodes_before[f.name], f.name
    assert linked > 0 and rewritten >= 1
    # state is exact: original events + the new key
    full = pa.concat_tables([_events(), one.select(_events().column_names)])
    assert replay_verify(lake, expected_snapshot(full))


def test_verify_integrity_and_gc(tmp_path):
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    ingest_stream(lake, _epoch_datasets())
    rep = lake.verify_integrity()
    assert rep["ok"] and rep["missing"] == [] and rep["orphans"] == []

    # plant an orphan fragment (crashed-task leftover): invisible to
    # readers, flagged by fsck, removed by gc
    orphan = tmp_path / "lake" / "deltas" / "epoch-9-deadbeef.parquet"
    orphan.write_bytes(b"not a real parquet")
    before = lake.read_table().num_rows
    rep2 = lake.verify_integrity()
    assert rep2["ok"] and rep2["orphans"] == ["deltas/epoch-9-deadbeef.parquet"]
    assert lake.read_table().num_rows == before
    out = lake.gc()
    assert out["removed"] == ["deltas/epoch-9-deadbeef.parquet"]
    assert not orphan.exists()

    # delete a committed fragment -> fsck reports missing
    victim = next(f for f in (tmp_path / "lake" / "deltas").iterdir())
    victim.unlink()
    rep3 = lake.verify_integrity()
    assert not rep3["ok"] and rep3["missing"]

    # after compaction (fragments folded+GC'd) integrity holds again,
    # including base row counts vs the compact manifest
    # (restore by re-ingesting the epoch: manifest fence makes this exact)
    e = int(victim.name.split("-")[1])
    os.unlink(os.path.join(str(tmp_path / "lake"), "_manifests",
                           f"epoch-{e}.json"))
    per = N // EPOCHS
    lake.apply_epoch(rd.from_arrow(
        change_stream_batch(e * per, per, seed=7, n_repos=20,
                            paths_per_repo=50)), e)
    lake.compact()
    rep4 = lake.verify_integrity()
    assert rep4["ok"], rep4
    assert replay_verify(lake, expected_snapshot(_events()))


def test_snapshot_isolation_in_flight_epoch_invisible(tmp_path):
    """Readers see only manifest-committed epochs: a delta fragment written
    by an in-flight (not yet fenced) epoch must be invisible to read() /
    read_table() / changes() until its manifest lands."""
    lake = LakeTable(str(tmp_path / "lake"), num_partitions=4)
    ingest_stream(lake, _epoch_datasets()[:2])
    before = lake.read_table()

    # simulate an in-flight epoch: fragments on disk, no manifest yet
    import shutil
    frag_dir = tmp_path / "lake" / "deltas"
    committed = set(os.listdir(frag_dir))
    per = N // EPOCHS
    extra = rd.from_arrow(change_stream_batch(2 * per, per, seed=7,
                                              n_repos=20, paths_per_repo=50))
    lake.apply_epoch(extra, 2)
    mpath = tmp_path / "lake" / "_manifests" / "epoch-2.json"
    stashed = mpath.read_bytes()
    mpath.unlink()  # crash before the fence landed

    assert lake.read_table().equals(before)
    assert pa.table(lake.read().to_pandas()).num_rows == before.num_rows
    assert set(pa.table(lake.changes().to_pandas())["_epoch"].to_pylist()) \
        == {0, 1}
    # the in-flight fragments are orphans to fsck, not corruption
    rep = lake.verify_integrity()
    assert rep["ok"] and len(rep["orphans"]) > 0

    # fence lands -> epoch becomes visible atomically
    mpath.write_bytes(stashed)
    assert lake.read_table().num_rows >= before.num_rows
    assert 2 in set(pa.table(lake.changes().to_pandas())["_epoch"].to_pylist())


def test_manifest_scan_cache_consistency(tmp_path):
    """The mtime-cached directory listing (round-3 verdict task #8) must
    never serve a stale view: epochs committed through THIS handle, a
    FOREIGN handle (different process analog), and raw file deletion all
    surface on the next read."""
    root = str(tmp_path / "lake")
    lake = LakeTable(root, key_cols=["repo", "path"], seq_col="seq")

    def epoch_tbl(e):
        return pa.table({
            "repo": ["r"] * 3,
            "path": [f"p{i}" for i in range(3)],
            "seq": pa.array([e * 3 + i for i in range(3)], pa.int64()),
            "op": ["upsert"] * 3,
        })

    lake.apply_epoch(rd.from_arrow(epoch_tbl(0)), 0)
    assert lake.committed_epochs() == [0]
    # repeated reads hit the cache (same listing object is fine) and stay
    # correct after a write through the same handle
    assert lake.committed_epochs() == [0]
    lake.apply_epoch(rd.from_arrow(epoch_tbl(1)), 1)
    assert lake.committed_epochs() == [0, 1]

    # a SECOND handle (its own cache) sees epoch 2 committed by the first
    other = LakeTable(root)
    assert other.committed_epochs() == [0, 1]
    lake.apply_epoch(rd.from_arrow(epoch_tbl(2)), 2)
    assert other.committed_epochs() == [0, 1, 2]  # mtime invalidation

    # consumer checkpoints go through the same cache
    lake.register_consumer("c1", since_epoch=-1)
    assert other._consumers() == {"c1": -1}
    lake.commit_consumer("c1", 1)
    assert other._consumers() == {"c1": 1}
    assert lake._consumers() == {"c1": 1}

    # raw manifest deletion (external actor) is visible too
    os.unlink(os.path.join(root, "_manifests", "epoch-2.json"))
    assert lake.committed_epochs() == [0, 1]
    assert other.committed_epochs() == [0, 1]
