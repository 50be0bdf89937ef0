"""Distributed manifest planning (table/manifest_df.py): parity with the
driver-side prune, the parquet manifest cache, and the 100k-file scale
contract — planning a synthetic 100k-file table must stay seconds-fast
and never materialize the full file list on the driver."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.table import Table
from olake_spark.table.manifest_df import (
    manifest_entries_df,
    prune_files_df,
    scan_planned,
    write_manifest_cache,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    df = generate_sequences(spark, num_rows=3000, seed=3, num_partitions=12)
    t.append(df)
    return t


def _paths(files) -> set[str]:
    return {f.path for f in files}


def test_entries_df_matches_files(spark, table):
    ent = manifest_entries_df(table)
    rows = ent.collect()
    files = table.files()
    assert {r.path for r in rows} == _paths(files)
    by_path = {f.path: f for f in files}
    for r in rows:
        f = by_path[r.path]
        assert r.record_count == f.record_count
        assert r.file_size_bytes == f.file_size_bytes
        assert r.schema_id == f.schema_id
        assert r.spec_col == f.spec_col
        assert json.loads(r.stats) == f.stats


@pytest.mark.parametrize(
    "sources,doc_id_range,n_tok_range",
    [
        (["wiki"], None, None),
        (None, None, (1, 64)),
        (None, ("doc-0001", "doc-3000"), None),
        (["web", "code"], None, (100, 900)),
        (["nope"], None, None),
    ],
)
def test_prune_parity_with_driver_path(
    spark, table, sources, doc_id_range, n_tok_range
):
    # ground truth: the python prune inside Table.scan
    cand = table.files()
    if sources is not None:
        cand = [
            f
            for f in cand
            if (
                pv in sources
                if (pv := table.partition_value(f, "source")) is not None
                else any(f.may_contain("source", s) for s in sources)
            )
        ]
    if doc_id_range is not None:
        cand = [f for f in cand if f.overlaps("doc_id", *doc_id_range)]
    if n_tok_range is not None:
        cand = [f for f in cand if f.overlaps("n_tok", *n_tok_range)]

    ranges = {}
    if doc_id_range:
        ranges["doc_id"] = doc_id_range
    if n_tok_range:
        ranges["n_tok"] = n_tok_range
    surv = prune_files_df(
        manifest_entries_df(table), sources=sources, ranges=ranges
    )
    assert {r.path for r in surv.collect()} == _paths(cand)


def test_scan_planned_matches_scan(spark, table):
    for kw in (
        {},
        {"sources": ["wiki"]},
        {"n_tok_range": (1, 64)},
        {"sources": ["web"], "n_tok_range": (10, 500)},
    ):
        want = sorted(
            (r.doc_id, r.n_tok) for r in table.scan(**kw).collect()
        )
        got = sorted(
            (r.doc_id, r.n_tok) for r in scan_planned(table, **kw).collect()
        )
        assert got == want and (not kw or len(got) > 0 or kw.get("sources") == ["nope"])


def test_scan_planned_respects_snapshot_pin(spark, table):
    snap1 = table.current_snapshot_id
    n1 = table.scan().count()
    extra = generate_sequences(spark, num_rows=500, seed=9, num_partitions=2)
    table.append(extra)
    assert scan_planned(table).count() == n1 + 500
    assert scan_planned(table, snapshot_id=snap1).count() == n1


def test_expired_snapshot_manifest_cache_is_gcd(spark, table):
    from olake_spark.operators.expire import expire_snapshots

    cdir1 = write_manifest_cache(table)  # cache for snapshot 1
    table.append(generate_sequences(spark, 300, seed=11, num_partitions=2))
    table.append(generate_sequences(spark, 300, seed=12, num_partitions=2))
    cdir3 = write_manifest_cache(table)  # cache for snapshot 3
    res = expire_snapshots(table, keep_last=1)
    assert 1 in res.expired_snapshots
    assert not os.path.exists(cdir1)  # expired snapshot's cache reclaimed
    assert os.path.exists(os.path.join(cdir3, "_SUCCESS"))  # live cache kept


def test_scan_auto_delegates_to_distributed_planning(spark, table, monkeypatch):
    """Table.scan itself switches to the distributed planner past the
    shard threshold — callers get the scale path without knowing
    scan_planned exists; results identical to the driver prune."""
    import olake_spark.table.format as fmt
    import olake_spark.table.manifest_df as mdf

    calls = {"n": 0}
    orig = mdf.scan_planned

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(mdf, "scan_planned", spy)
    monkeypatch.setattr(fmt, "SCAN_DISTRIBUTED_MIN_SHARDS", 1)
    want = sorted(
        r.doc_id
        for r in table.scan(
            n_tok_range=(1, 64), distributed_planning=False
        ).collect()
    )
    assert calls["n"] == 0
    got = sorted(r.doc_id for r in table.scan(n_tok_range=(1, 64)).collect())
    assert calls["n"] == 1 and got == want and len(got) > 0


def test_cluster_specs_distributed_parity(spark, table, monkeypatch):
    """default_cluster_specs via the entries-frame aggregation equals
    the driver-side derivation (categories, bounds, bit widths)."""
    import olake_spark.operators.clustering as cl

    want = cl.default_cluster_specs(table)
    monkeypatch.setattr(cl, "_SPEC_DISTRIBUTED_MIN_SHARDS", 1)
    got = cl.default_cluster_specs(table)
    assert [
        (s.name, s.kind, s.categories, s.lo, s.hi, s.bits) for s in got
    ] == [(s.name, s.kind, s.categories, s.lo, s.hi, s.bits) for s in want]


def test_manifest_cache_roundtrip(spark, table):
    cdir = write_manifest_cache(table)
    assert os.path.exists(os.path.join(cdir, "_SUCCESS"))
    ent_json = manifest_entries_df(table, use_cache=False)
    ent_cache = manifest_entries_df(table)  # picks up the cache
    a = {r.path: r for r in ent_json.collect()}
    b = {r.path: r for r in ent_cache.collect()}
    assert a.keys() == b.keys()
    for p in a:
        assert json.loads(a[p].stats) == json.loads(b[p].stats)
    # the cached plan reads parquet, not JSON shards
    assert "parquet" in ent_cache._jdf.queryExecution().executedPlan().toString().lower()


def test_merge_distributed_planning_parity(spark, tmp_path):
    """merge_into(distributed_planning=True) — the many-shard discovery
    path through manifest_entries_df — must produce the identical final
    table as the driver-side prune on the same change batch."""
    from olake_spark.operators.merge import merge_into
    from olake_spark.schema import CDC_DELETED_AT, DATA_COLUMNS

    results = {}
    for mode in (False, True):
        root = str(tmp_path / f"tbl_{mode}")
        t = Table.create(spark, root)
        t.append(
            generate_sequences(spark, num_rows=2000, seed=4, num_partitions=10)
        )
        base = t.scan().select(*DATA_COLUMNS).orderBy("doc_id")
        upd = (
            base.limit(40)
            .withColumn("tokens", F.expr("slice(tokens, 1, 2)"))
            .withColumn("n_tok", F.least("n_tok", F.lit(2)))
            .withColumn(CDC_DELETED_AT, F.lit(None).cast("timestamp"))
        )
        dele = (
            base.limit(60)
            .exceptAll(base.limit(40))
            .withColumn(CDC_DELETED_AT, F.current_timestamp())
        )
        res = merge_into(
            t, upd.unionByName(dele), distributed_planning=mode
        )
        rows = sorted(
            (r.doc_id, r.n_tok, tuple(r.tokens))
            for r in t.refresh().scan().select("doc_id", "n_tok", "tokens").collect()
        )
        results[mode] = (res.updated, res.deleted, res.inserted, rows)
    assert results[True] == results[False]
    assert results[True][0] == 40 and results[True][1] == 20


def test_compact_distributed_planning_parity(spark, tmp_path):
    """compact(distributed_planning=True) selects the same small files
    and produces the same table contents as the driver-side path."""
    from olake_spark.operators.compaction import compact

    results = {}
    for mode in (False, True):
        root = str(tmp_path / f"c_{mode}")
        t = Table.create(spark, root)
        t.append(
            generate_sequences(spark, num_rows=2000, seed=4, num_partitions=16)
        )
        res = compact(
            t, target_file_bytes=4 << 20, distributed_planning=mode
        )
        assert not res.skipped
        rows = sorted(
            (r.doc_id, r.n_tok)
            for r in t.refresh().scan().select("doc_id", "n_tok").collect()
        )
        results[mode] = (res.input_files, res.groups, rows, len(t.files()))
    assert results[True] == results[False]


def test_expire_distributed_orphan_scan_parity(spark, tmp_path):
    """expire_snapshots(distributed_orphan_scan=True) — binaryFile
    listing anti-joined with the executor-parsed live set — deletes
    exactly the same orphans as the driver walk, and protects live
    files and uncommitted-job outputs identically."""
    import shutil

    from olake_spark.operators.compaction import compact
    from olake_spark.operators.expire import expire_snapshots

    deleted = {}
    for mode in (False, True):
        root = str(tmp_path / f"e_{mode}")
        t = Table.create(spark, root)
        t.append(
            generate_sequences(spark, num_rows=1500, seed=7, num_partitions=8)
        )
        compact(t, target_file_bytes=4 << 20)  # snap 2; snap-1 files orphan after expiry
        # plant a loose orphan + a protected uncommitted-job output
        orphan = os.path.join(root, "data", "stray", "junk.parquet")
        os.makedirs(os.path.dirname(orphan))
        shutil.copyfile(
            os.path.join(root, t.files()[0].path), orphan
        )
        jobdir = os.path.join(root, "jobs", "j1")
        os.makedirs(jobdir)
        protected = "data/stray/inflight.parquet"
        shutil.copyfile(
            os.path.join(root, t.files()[0].path),
            os.path.join(root, protected),
        )
        with open(os.path.join(jobdir, "ledger.json"), "w") as f:
            json.dump(
                {
                    "committed_snapshot_id": None,
                    "entries": {"g": {"outputs": [{"path": protected}]}},
                },
                f,
            )
        res = expire_snapshots(
            t, keep_last=1, distributed_orphan_scan=mode
        )
        assert res.deleted_data_files > 0
        assert not os.path.exists(orphan)
        assert os.path.exists(os.path.join(root, protected))
        assert t.refresh().scan().count() == 1500
        deleted[mode] = (res.deleted_data_files, res.deleted_manifests)
    assert deleted[True] == deleted[False]


def test_snapshot_file_delta_equals_bruteforce_diff(tmp_path):
    """Property: for EVERY snapshot pair across a randomized sequence of
    append/remove commits, snapshot_file_delta's subtracted sets equal
    the brute-force full file-list diff. No Spark needed — commits of
    hand-made DataFile entries drive the manifest machinery directly
    (small shards force heavy shard churn)."""
    import random

    import olake_spark.table.format as fmt
    from olake_spark.table.format import DataFile, Table, snapshot_file_delta

    rng = random.Random(7)
    old_max = fmt.MANIFEST_MAX_ENTRIES
    fmt.MANIFEST_MAX_ENTRIES = 3  # many tiny shards -> real carry-over mix
    try:
        t = Table.create(None, str(tmp_path / "tbl"))
        next_id = 0
        for _ in range(12):
            live = [f.path for f in t.files()]
            removed = set(
                rng.sample(live, k=min(len(live), rng.randrange(0, 4)))
            )
            added = []
            for _ in range(rng.randrange(1, 5)):
                added.append(
                    DataFile(
                        path=f"data/p/{next_id:04d}.parquet",
                        record_count=1,
                        file_size_bytes=10,
                    )
                )
                next_id += 1
            t.commit("append", added=added, removed_paths=removed)
        snaps = t.snapshots()
        for a in snaps:
            for b in snaps:
                ta, tb = (
                    {f.path for f in t.files(a.snapshot_id)},
                    {f.path for f in t.files(b.snapshot_id)},
                )
                b_only, a_only = snapshot_file_delta(t, a, b)
                assert set(b_only) - set(a_only) == tb - ta, (
                    a.snapshot_id,
                    b.snapshot_id,
                )
                assert set(a_only) - set(b_only) == ta - tb
    finally:
        fmt.MANIFEST_MAX_ENTRIES = old_max


def test_100k_file_planning_is_fast_and_exact(spark, tmp_path):
    """The 100x-scale contract: a table whose CURRENT snapshot tracks
    100_000 data files (synthetic manifests — no actual data files on
    disk) plans a pruned scan in seconds via the DataFrame path, with
    pruning parity against the driver-side loop."""
    from olake_spark.table.format import MANIFEST_MAX_ENTRIES, _atomic_write_json

    root = str(tmp_path / "big")
    t = Table.create(spark, root)
    n_files = 100_000
    per_shard = MANIFEST_MAX_ENTRIES
    manifests = []
    eid = 0
    for s in range((n_files + per_shard - 1) // per_shard):
        entries = []
        for _ in range(min(per_shard, n_files - eid)):
            lo = eid * 1000
            entries.append(
                {
                    "path": f"data/fake/{eid:07d}.parquet",
                    "record_count": 1000,
                    "file_size_bytes": 128 << 20,
                    "partition": f"src{eid % 8}",
                    "schema_id": 0,
                    "spec_col": "source",
                    "stats": {
                        "doc_id": {
                            "min": f"doc-{lo:012d}",
                            "max": f"doc-{lo + 999:012d}",
                            "null_count": 0,
                        },
                        "n_tok": {
                            "min": eid % 1024,
                            "max": eid % 1024 + 32,
                            "null_count": 0,
                        },
                        "source": {
                            "min": f"src{eid % 8}",
                            "max": f"src{eid % 8}",
                            "null_count": 0,
                        },
                    },
                }
            )
            eid += 1
        rel = f"manifests/manifest-big-{s:05d}.json"
        _atomic_write_json(os.path.join(root, rel), entries)
        manifests.append(rel)
    t.metadata["snapshots"].append(
        {
            "snapshot_id": 1,
            "parent_id": None,
            "timestamp_ms": int(time.time() * 1000),
            "operation": "append",
            "manifests": manifests,
            "summary": {},
            "schema_id": 0,
        }
    )
    t.metadata["current_snapshot_id"] = 1
    t.rewrite_metadata()

    # load is O(snapshots): instant regardless of file count
    t0 = time.time()
    t2 = Table.load(spark, root)
    load_s = time.time() - t0
    assert load_s < 2.0, f"Table.load took {load_s:.1f}s"

    # distributed planning: entries parse + prune as ONE Spark job;
    # only survivors reach the driver
    t0 = time.time()
    ent = manifest_entries_df(t2)
    surv = prune_files_df(
        ent, sources=["src3"], ranges={"n_tok": (100, 140)}
    ).select("path")
    got = {r.path for r in surv.collect()}
    plan_s = time.time() - t0
    assert plan_s < 30.0, f"distributed planning took {plan_s:.1f}s"

    # parity with the driver loop on the same snapshot
    want = set()
    for f in t2.files():
        if t2.partition_value(f, "source") != "src3":
            continue
        if f.overlaps("n_tok", 100, 140):
            want.add(f.path)
    assert got == want and 0 < len(got) < n_files // 100

    # the parquet cache makes the SECOND plan footer-pruned-columnar
    write_manifest_cache(t2)
    t0 = time.time()
    got2 = {
        r.path
        for r in prune_files_df(
            manifest_entries_df(t2),
            sources=["src3"],
            ranges={"n_tok": (100, 140)},
        )
        .select("path")
        .collect()
    }
    cached_s = time.time() - t0
    assert got2 == got
    assert cached_s < 15.0, f"cached planning took {cached_s:.1f}s"


@pytest.mark.skipif(
    os.environ.get("OLAKE_SCALE_TESTS") != "1",
    reason="10^6-entry metadata plane proof (~3 min); OLAKE_SCALE_TESTS=1 runs it",
)
def test_million_entry_metadata_plane(spark, tmp_path):
    """10x the 100k test: ONE MILLION data-file entries, fragmented into
    1000 manifest shards. Proves the metadata plane at 100 TB geometry
    (10^6 x 128 MB = 122 TB): load is O(snapshots), planning is one
    Spark job returning only survivors, rewrite_manifests reshards
    distributed, and driver RSS stays flat (entries are generated and
    planned shard-wise — the million never materializes on the driver).
    Numbers recorded in BENCH/BASELINE.md."""
    import resource

    from olake_spark.operators.manifests import rewrite_manifests
    from olake_spark.table.format import _atomic_write_json

    root = str(tmp_path / "huge")
    t = Table.create(spark, root)
    n_files = 1_000_000
    per_shard = 1000  # deliberately fragmented: forces a real reshard
    manifests = []
    eid = 0
    t0 = time.time()
    for s in range(n_files // per_shard):
        entries = []
        for _ in range(per_shard):
            lo = eid * 1000
            entries.append(
                {
                    "path": f"data/fake/{eid:07d}.parquet",
                    "record_count": 1000,
                    "file_size_bytes": 128 << 20,
                    "partition": f"src{eid % 8}",
                    "schema_id": 0,
                    "spec_col": "source",
                    "stats": {
                        "doc_id": {
                            "min": f"doc-{lo:012d}",
                            "max": f"doc-{lo + 999:012d}",
                            "null_count": 0,
                        },
                        "n_tok": {
                            "min": eid % 1024,
                            "max": eid % 1024 + 32,
                            "null_count": 0,
                        },
                        "source": {
                            "min": f"src{eid % 8}",
                            "max": f"src{eid % 8}",
                            "null_count": 0,
                        },
                    },
                }
            )
            eid += 1
        rel = f"manifests/manifest-huge-{s:05d}.json"
        _atomic_write_json(os.path.join(root, rel), entries)
        manifests.append(rel)
    gen_s = time.time() - t0
    t.metadata["snapshots"].append(
        {
            "snapshot_id": 1,
            "parent_id": None,
            "timestamp_ms": int(time.time() * 1000),
            "operation": "append",
            "manifests": manifests,
            "summary": {"total-data-files": n_files},
            "schema_id": 0,
        }
    )
    t.metadata["current_snapshot_id"] = 1
    t.rewrite_metadata()

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux

    t0 = time.time()
    t2 = Table.load(spark, root)
    load_s = time.time() - t0
    assert load_s < 2.0, f"Table.load took {load_s:.1f}s"

    # distributed planning: only survivors reach the driver
    t0 = time.time()
    surv = prune_files_df(
        manifest_entries_df(t2), sources=["src3"], ranges={"n_tok": (100, 140)}
    ).select("path")
    got = {r.path for r in surv.collect()}
    plan_s = time.time() - t0
    # expected set from the generation rule (no driver loop over entries)
    want = {
        f"data/fake/{e:07d}.parquet"
        for e in range(n_files)
        if e % 8 == 3 and e % 1024 <= 140 and e % 1024 + 32 >= 100
    }
    assert got == want and 0 < len(got) < n_files // 50
    assert plan_s < 120.0, f"distributed planning took {plan_s:.1f}s"

    # cached planning (parquet manifest cache)
    write_manifest_cache(t2)
    t0 = time.time()
    got2 = {
        r.path
        for r in prune_files_df(
            manifest_entries_df(t2),
            sources=["src3"],
            ranges={"n_tok": (100, 140)},
        )
        .select("path")
        .collect()
    }
    cached_s = time.time() - t0
    assert got2 == got
    assert cached_s < 30.0, f"cached planning took {cached_s:.1f}s"

    # distributed reshard: 1000 fragments -> ceil(1e6/5000) = 200 shards
    t0 = time.time()
    rres = rewrite_manifests(t2)
    reshard_s = time.time() - t0
    assert not rres.skipped
    assert len(t2.refresh().snapshot().manifests) == 200
    assert reshard_s < 300.0, f"rewrite_manifests took {reshard_s:.1f}s"

    # driver RSS flat: the million entries never materialized driver-side
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    rss_mb = (rss1 - rss0) / 1024
    assert rss_mb < 600, f"driver peak RSS grew {rss_mb:.0f} MB"

    print(
        f"MILLION-ENTRY: gen={gen_s:.1f}s load={load_s:.2f}s "
        f"plan={plan_s:.1f}s (survivors={len(got)}) cached={cached_s:.1f}s "
        f"reshard={reshard_s:.1f}s rss_delta={rss_mb:.0f}MB"
    )
