"""Table-layer tests: create/append/scan, stats pruning, snapshot
isolation, atomic commit (SURVEY.md §5 items 1-3)."""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import SOURCES, generate_sequences
from olake_spark.table import Table
from olake_spark.table.format import CommitConflict

N_ROWS = 3000


@pytest.fixture(scope="module")
def seq_df(spark):
    df = generate_sequences(spark, N_ROWS, seed=42, max_tok=64)
    df.cache().count()
    return df


@pytest.fixture(params=["local", "fakeremote"])
def table(spark, tmp_path, request):
    """The whole suite runs against BOTH FileIO implementations — the
    object-store-seam contract (table/io.py): every primitive the table
    layer issues maps onto a real object-store call (no rename exists
    in the API), so an upload-then-publish fake-remote store must be
    behaviorally identical to POSIX."""
    from olake_spark.table.io import FakeRemoteFileIO, LocalFileIO

    io = (
        LocalFileIO()
        if request.param == "local"
        else FakeRemoteFileIO(staging_dir=str(tmp_path / "_stage"))
    )
    t = Table.create(spark, str(tmp_path / "tbl"), io=io)
    yield t
    if request.param == "fakeremote":
        # the discipline check: EVERY primitive is instrumented and
        # every one the table issued maps onto a real object-store
        # call (FakeRemoteFileIO.STORE_PRIMITIVES documents the
        # mapping); rename isn't in the FileIO API at all
        assert set(io.ops) <= FakeRemoteFileIO.STORE_PRIMITIVES, io.ops


def test_generate_deterministic(spark):
    a = generate_sequences(spark, 500, seed=42, max_tok=64).orderBy("doc_id").collect()
    b = generate_sequences(spark, 500, seed=42, max_tok=64).orderBy("doc_id").collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert [r.tokens for r in a] == [r.tokens for r in b]
    for r in a[:50]:
        assert r.n_tok == len(r.tokens)
        assert r.source in SOURCES
        assert r.doc_id.startswith(r.source + "-")


def test_append_scan_roundtrip(spark, table, seq_df):
    table.append(seq_df.repartition(20))
    assert table.current_snapshot_id == 1
    files = table.files()
    assert 15 <= len(files) <= 25
    assert sum(f.record_count for f in files) == N_ROWS
    got = table.scan()
    assert got.count() == N_ROWS
    # byte-exact token equality vs the in-memory source
    diff = (
        got.select("doc_id", "tokens")
        .exceptAll(seq_df.select("doc_id", "tokens"))
        .count()
    )
    assert diff == 0


def test_partition_pure_files_and_pruning(spark, table, seq_df):
    # source-pure layout: repartition by source -> each file single-source
    table.append(seq_df.repartition(len(SOURCES), "source"))
    files = table.files()
    pure = [f for f in files if f.partition is not None]
    assert len(pure) >= 1
    web_count_true = seq_df.filter(F.col("source") == "web").count()
    scanned = table.scan(sources=["web"])
    assert scanned.count() == web_count_true
    # pruning must actually skip files: candidate set < total set
    cand = [
        f
        for f in files
        if f.partition == "web"
        or (f.partition is None and f.may_contain("source", "web"))
    ]
    assert len(cand) < len(files)


def test_stats_min_max_recorded(table, seq_df):
    table.append(seq_df.repartition(4))
    f = table.files()[0]
    assert "doc_id" in f.stats and "n_tok" in f.stats
    assert f.stats["n_tok"]["min"] >= 8
    assert f.stats["doc_id"]["min"] <= f.stats["doc_id"]["max"]


def test_snapshot_isolation_reader_pinned(spark, table, seq_df):
    table.append(seq_df.repartition(10))
    v1 = table.current_snapshot_id
    v1_files = {f.path for f in table.files(v1)}
    pinned = table.scan(snapshot_id=v1)

    # second commit replaces everything with a differently-laid-out copy
    rewritten = table.write_data_files(table.scan(v1).repartition(3))
    table.commit("replace", added=rewritten, removed_paths=v1_files)
    v2 = table.current_snapshot_id
    assert v2 != v1
    assert {f.path for f in table.files(v2)}.isdisjoint(v1_files)
    # pinned reader still sees the old files and full row count
    assert pinned.count() == N_ROWS
    assert table.scan(snapshot_id=v1).count() == N_ROWS
    assert {f.path for f in table.files(v1)} == v1_files


def test_commit_conflict_detected(spark, table, seq_df):
    table.append(seq_df.limit(100).repartition(1))
    stale = Table.load(spark, table.root)
    table.append(seq_df.limit(50).repartition(1))  # advances VERSION
    files = stale.write_data_files(seq_df.limit(10).repartition(1))
    with pytest.raises(CommitConflict):
        stale.commit("append", added=files)


def test_load_roundtrip(spark, table, seq_df):
    table.append(seq_df.repartition(2))
    t2 = Table.load(spark, table.root)
    assert t2.current_snapshot_id == table.current_snapshot_id
    assert t2.total_rows() == N_ROWS
    assert os.path.isfile(os.path.join(table.root, "VERSION"))


def test_manifest_sharding_across_limit(spark, tmp_path):
    """A commit adding more files than MANIFEST_MAX_ENTRIES must shard
    into multiple immutable manifests, and a later commit removing files
    must rewrite ONLY the manifests that lost entries (O(changed files)
    metadata work). Exercised with synthetic DataFile entries — the
    sharding math is pure metadata, no parquet needed."""
    import olake_spark.table.format as fmt
    from olake_spark.table.format import DataFile

    t = Table.create(spark, str(tmp_path / "tbl"))
    n = fmt.MANIFEST_MAX_ENTRIES + 2_500  # 1.5 shards
    added = [
        DataFile(path=f"data/x/f{i:06d}.parquet", record_count=10,
                 file_size_bytes=1000)
        for i in range(n)
    ]
    t.commit("append", added=added)
    snap = t.snapshot()
    assert len(snap.manifests) == 2
    sizes = sorted(len(t._read_manifest(m)) for m in snap.manifests)
    assert sizes == [2_500, fmt.MANIFEST_MAX_ENTRIES]
    assert t.total_rows() == 10 * n

    # remove files that all live in ONE shard: the other shard must be
    # carried over untouched (same manifest path object)
    victim = snap.manifests[0]
    victims = {e.path for e in t._read_manifest(victim)[:100]}
    t.commit("delete", removed_paths=victims)
    snap2 = t.snapshot()
    carried = set(snap.manifests) & set(snap2.manifests)
    assert len(carried) == 1 and victim not in carried
    assert t.total_rows() == 10 * (n - 100)
    # snapshot isolation: the old snapshot still sees every entry
    assert sum(
        len(t._read_manifest(m)) for m in snap.manifests
    ) == n


def test_snapshot_as_of_time_travel(spark, tmp_path):
    import time as _time

    from olake_spark.datagen import generate_sequences

    t = Table.create(spark, str(tmp_path / "tt"))
    assert t.snapshot_as_of(int(_time.time() * 1000)) is None

    df = generate_sequences(spark, 100, seed=2, max_tok=16)
    t.append(df.repartition(2))
    ts_after_append = int(_time.time() * 1000)
    _time.sleep(0.01)
    t.append(df.limit(10).repartition(1))

    # before any snapshot -> None
    first = t.snapshots()[0]
    assert t.snapshot_as_of(first.timestamp_ms - 1) is None
    # between the snapshots -> the first one, and its scan sees 100 rows
    s = t.snapshot_as_of(ts_after_append)
    assert s.snapshot_id == first.snapshot_id
    assert t.scan(snapshot_id=s.snapshot_id).count() == 100
    # far future -> current
    assert (
        t.snapshot_as_of(int(_time.time() * 1000) + 10_000).snapshot_id
        == t.current_snapshot_id
    )


def test_rollback_and_unique_snapshot_ids(spark, table, seq_df):
    a = seq_df.limit(100)
    b = seq_df.limit(200).exceptAll(a)
    table.append(a)  # snap 1
    table.append(b)  # snap 2
    assert table.scan().count() == 200
    table.rollback_to(1)
    assert table.current_snapshot_id == 1
    assert table.scan().count() == 100
    # rolled-over snapshot 2 is still time-travelable
    assert table.scan(snapshot_id=2).count() == 200
    # a fresh reader sees the rollback
    assert Table.load(spark, table.root).scan().count() == 100
    # next commit takes a NEW id (max+1), never colliding with 2
    table.append(b)
    assert table.current_snapshot_id == 3
    assert table.scan().count() == 200
    ids = [s.snapshot_id for s in table.snapshots()]
    assert len(ids) == len(set(ids)) == 3
    # non-ancestor rollback is refused (2 is not an ancestor of 3's chain)
    with pytest.raises(ValueError):
        table.rollback_to(2)
    with pytest.raises(KeyError):
        table.rollback_to(99)


def test_refs_scan_and_expire_protection(spark, table, seq_df):
    from olake_spark.operators.expire import expire_snapshots

    a = seq_df.limit(100)
    b = seq_df.limit(150).exceptAll(a)
    c = seq_df.limit(180).exceptAll(seq_df.limit(150))
    table.append(a)  # snap 1
    table.set_ref("v1.0", ref_type="tag")
    table.append(b)  # snap 2
    table.append(c)  # snap 3
    table.append(seq_df.limit(190).exceptAll(seq_df.limit(180)))  # snap 4
    assert table.refs["v1.0"]["snapshot_id"] == 1
    assert table.scan(ref="v1.0").count() == 100
    with pytest.raises(KeyError):
        table.scan(ref="nope")
    with pytest.raises(ValueError):
        table.scan(snapshot_id=1, ref="v1.0")

    # expire keep_last=2: snap 1 survives ONLY because of the tag; snap 2 goes
    res = expire_snapshots(table, keep_last=2)
    kept = set(res.kept_snapshots)
    assert 1 in kept and 2 not in kept and {3, 4} <= kept
    assert table.scan(ref="v1.0").count() == 100  # tag still readable
    # drop the tag -> snapshot 1 becomes expirable
    table.remove_ref("v1.0")
    res2 = expire_snapshots(table, keep_last=2)
    assert 1 in res2.expired_snapshots
    with pytest.raises(KeyError):
        table.scan(snapshot_id=1)


def test_partition_spec_evolution(spark, table, seq_df):
    # source-pure layout under the original spec
    table.append(seq_df.limit(1000).repartition(64, "source"))
    old_files = table.files()
    assert all(f.spec_col == "source" for f in old_files)
    assert any(f.partition is not None for f in old_files)

    table.evolve_partition("doc_id")
    assert table.partition_col == "doc_id"
    assert table.metadata["partition_spec_log"] == ["source", "doc_id"]
    # a fresh loader sees the evolved spec
    assert Table.load(spark, table.root).partition_col == "doc_id"

    # new writes record the NEW spec; old files are untouched (no rewrite)
    extra = seq_df.limit(1500).exceptAll(seq_df.limit(1000))
    table.append(extra.repartition("doc_id"))
    specs = {f.spec_col for f in table.files()}
    assert specs == {"source", "doc_id"}
    assert {f.path for f in old_files} <= {f.path for f in table.files()}

    # source pruning stays EXACT across mixed specs: identity prune for
    # old-spec files, min/max stats prune for new-spec files
    want = (
        table.scan().filter(F.col("source") == "wiki").select("doc_id").collect()
    )
    got = table.scan(sources=["wiki"]).select("doc_id").collect()
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in want)
    assert len(got) > 0

    with pytest.raises(KeyError):
        table.evolve_partition("nope")


def test_rollback_to_tag_survives_expired_intermediates(spark, table, seq_df):
    """A tag-pinned restore point stays rollbackable even after expiry
    dropped the snapshots between it and the current one."""
    from olake_spark.operators.expire import expire_snapshots

    a = seq_df.limit(100)
    table.append(a)  # snap 1
    table.set_ref("restore", ref_type="tag")
    for lo, hi in ((100, 130), (130, 160), (160, 190)):  # snaps 2-4
        table.append(seq_df.limit(hi).exceptAll(seq_df.limit(lo)))
    res = expire_snapshots(table, keep_last=2)  # drops 2 (1 is tagged)
    assert 2 in res.expired_snapshots and 1 in res.kept_snapshots
    table.rollback_to(1)  # chain 4 -> 3 -> GAP(2): still accepted
    assert table.current_snapshot_id == 1
    assert table.scan().count() == 100


def test_rollback_past_gap_requires_ref_pin(spark, table, seq_df):
    """Past a broken parent chain, only a ref-pinned target is accepted
    — id ordering alone can't distinguish an expired ancestor from an
    abandoned sibling."""
    from olake_spark.operators.expire import expire_snapshots

    a = seq_df.limit(100)
    table.append(a)  # snap 1 — NOT tagged
    table.set_ref("keep1", snapshot_id=1, ref_type="tag")
    for lo, hi in ((100, 130), (130, 160), (160, 190)):  # snaps 2-4
        table.append(seq_df.limit(hi).exceptAll(seq_df.limit(lo)))
    expire_snapshots(table, keep_last=2)  # drops 2 and breaks the chain
    table.remove_ref("keep1")  # 1 survives in the log but is unpinned
    with pytest.raises(ValueError):
        table.rollback_to(1)
    table.set_ref("restore", snapshot_id=1, ref_type="tag")
    table.rollback_to(1)  # pinned: accepted
    assert table.current_snapshot_id == 1


def test_full_maintenance_cycle_on_fake_remote_store(spark, tmp_path, seq_df):
    """compact -> zorder -> merge -> expire, all on the fake-remote
    FileIO: byte-identical results to POSIX semantics and ONLY
    object-store primitives issued (get/put/create/list/delete — the
    seam's whole contract)."""
    from olake_spark.operators.clustering import cluster
    from olake_spark.operators.compaction import compact
    from olake_spark.operators.expire import expire_snapshots
    from olake_spark.operators.merge import merge_into
    from olake_spark.schema import CDC_DELETED_AT, DATA_COLUMNS
    from olake_spark.table.io import FakeRemoteFileIO

    io = FakeRemoteFileIO(staging_dir=str(tmp_path / "_stage"))
    t = Table.create(spark, str(tmp_path / "tbl"), io=io)
    t.append(seq_df.limit(1000).repartition(8))
    base = t.scan().agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(doc_id, n_tok))").alias("ck"),
    ).first()
    compact(t, target_file_bytes=1 << 20)
    cluster(t, curve="zorder", target_file_bytes=1 << 20)
    mid = t.scan().agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(doc_id, n_tok))").alias("ck"),
    ).first()
    assert (mid.n, mid.ck) == (base.n, base.ck)
    ch = (
        t.scan().select(*DATA_COLUMNS).orderBy("doc_id").limit(20)
        .withColumn("tokens", F.expr("slice(tokens, 1, 2)"))
        .withColumn("n_tok", F.least("n_tok", F.lit(2)))
        .withColumn(CDC_DELETED_AT, F.lit(None).cast("timestamp"))
    )
    res = merge_into(t, ch)
    assert res.updated == 20
    er = expire_snapshots(t, keep_last=1)
    assert er.deleted_data_files > 0
    assert t.refresh().scan().count() == 1000
    # every primitive is instrumented; all of them store-expressible
    assert set(io.ops) <= type(io).STORE_PRIMITIVES, io.ops


def test_write_audit_publish_on_branch(spark, table, seq_df):
    """Iceberg WAP shape: stage appends on an audit branch (table
    readers see nothing), validate via scan(ref=), fast_forward to
    publish atomically."""
    a = seq_df.limit(100)
    b = seq_df.limit(140).exceptAll(a)
    c = seq_df.limit(170).exceptAll(seq_df.limit(140))
    table.append(a)  # snap 1 = published main
    table.set_ref("audit", ref_type="branch")
    table.append(b, branch="audit")  # staged
    table.append(c, branch="audit")  # staged
    # main readers see ONLY the published snapshot
    assert table.scan().count() == 100
    assert Table.load(spark, table.root).scan().count() == 100
    # the audit reader sees the staged lineage
    assert table.scan(ref="audit").count() == 170
    assert table.refs["audit"]["snapshot_id"] == 3
    # publish
    head = table.fast_forward("audit")
    assert table.current_snapshot_id == head == 3
    assert table.scan().count() == 170
    assert Table.load(spark, table.root).scan().count() == 170
    # non-fast-forward publish is refused: diverge main, then try
    table.append(seq_df.limit(180).exceptAll(seq_df.limit(170)))  # snap 4
    table.set_ref("audit2", snapshot_id=3, ref_type="branch")
    table.append(b.limit(5), branch="audit2")  # snap 5 off snap 3
    # sibling isolation: the explicit audit2 commit advances ONLY
    # audit2 — the 'audit' branch (which followed main to snapshot 4
    # under the main-tracking rule) must not be dragged onto audit2's
    # unaudited snapshot 5
    assert table.refs["audit2"]["snapshot_id"] == 5
    assert table.refs["audit"]["snapshot_id"] == 4
    with pytest.raises(ValueError):
        table.fast_forward("audit2")
    with pytest.raises(KeyError):
        table.fast_forward("nope")
    with pytest.raises(KeyError):
        table.commit("append", added=[], branch="nope")


def test_expire_pins_branch_lineage_and_sibling_publish_refused(
    spark, table, seq_df
):
    """The sibling-abandonment scenario: main diverges after a branch
    forks, then expiry runs. The branch's parent LINEAGE must survive
    expiry (so the ancestry walk can't hit a gap), and fast_forward
    must refuse the sibling publish — a gap heuristic here would have
    silently abandoned main's published rows."""
    from olake_spark.operators.expire import expire_snapshots

    a = seq_df.limit(100)
    table.append(a)  # snap 1
    table.append(seq_df.limit(130).exceptAll(seq_df.limit(100)))  # 2
    table.append(seq_df.limit(150).exceptAll(seq_df.limit(130)))  # 3 = fork
    table.set_ref("b", ref_type="branch")
    table.append(
        seq_df.limit(160).exceptAll(seq_df.limit(150)), branch="b"
    )  # 4 staged
    table.append(seq_df.limit(175).exceptAll(seq_df.limit(160)))  # 5 = main diverges
    table.append(
        seq_df.limit(180).exceptAll(seq_df.limit(175)), branch="b"
    )  # 6 staged (parent 4)
    res = expire_snapshots(table, keep_last=2)
    # branch lineage 6 -> 4 -> 3 is pinned; only pre-fork 1/2 expire
    assert set(res.expired_snapshots) <= {1, 2}
    assert {3, 4, 6} <= set(res.kept_snapshots)
    # main (5) is NOT an ancestor of b's head (6): publish refused
    with pytest.raises(ValueError, match="not a fast-forward"):
        table.fast_forward("b")
    # main's published rows are intact
    assert table.scan().count() == 165


def test_branch_ref_advances_on_commit(spark, table, seq_df):
    a = seq_df.limit(100)
    b = seq_df.limit(150).exceptAll(a)
    c = seq_df.limit(180).exceptAll(seq_df.limit(150))
    table.append(a)  # snap 1
    table.set_ref("main_line", ref_type="branch")
    table.set_ref("v1", ref_type="tag")
    table.append(b)  # snap 2: branch head 1 -> 2, tag stays
    assert table.refs["main_line"]["snapshot_id"] == 2
    assert table.refs["v1"]["snapshot_id"] == 1
    assert table.scan(ref="main_line").count() == 150
    assert table.scan(ref="v1").count() == 100
    # a commit NOT on top of the branch head leaves the branch alone
    table.rollback_to(1)
    table.set_ref("main_line", snapshot_id=2, ref_type="branch")
    table.append(c)  # snap 3, parent 1 != branch head 2
    assert table.refs["main_line"]["snapshot_id"] == 2
    # a fresh loader sees the advanced head persisted
    assert Table.load(spark, table.root).refs["main_line"]["snapshot_id"] == 2


def test_set_current_snapshot_repoints_anywhere(spark, table, seq_df):
    a = seq_df.limit(100)
    b = seq_df.limit(150).exceptAll(a)
    table.append(a)  # 1
    table.append(b)  # 2
    table.rollback_to(1)
    table.append(b)  # 3 (branch from 1)
    # 2 is on the abandoned branch: rollback refuses, set_current works
    with pytest.raises(ValueError):
        table.rollback_to(2)
    table.set_current_snapshot(2)
    assert table.current_snapshot_id == 2
    assert table.scan().count() == 150
    with pytest.raises(KeyError):
        table.set_current_snapshot(42)


def test_evolve_partition_adds_stats_column(spark, table, seq_df):
    assert "_olake_insert_time" not in table.metadata["stats_columns"]
    table.evolve_partition("_olake_insert_time")
    assert "_olake_insert_time" in table.metadata["stats_columns"]
    assert table.partition_col == "_olake_insert_time"


def test_append_distribute_partition_pure_files(spark, table, seq_df):
    """distribute='partition' must make EVERY output file
    partition-pure regardless of the caller's layout."""
    table.append(seq_df.limit(1200).repartition(3), distribute="partition")
    files = table.files()
    assert len(files) >= 10  # one+ per source value
    assert all(f.partition is not None for f in files)
    assert all(f.spec_col == "source" for f in files)
    got = table.scan(sources=["wiki"]).count()
    want = table.scan().filter(F.col("source") == "wiki").count()
    assert got == want > 0
    with pytest.raises(ValueError):
        table.append(seq_df.limit(10), distribute="bogus")


def test_distribute_partition_numeric_and_null_values(spark, tmp_path):
    """Boundary sort must follow the STRING rendering (bin_expr compares
    the cast key byte-wise): numeric partition values like [2, 10] are
    unsorted lexicographically and used to collapse into one bin. NULL
    rows must not share a file with a genuine ''-valued partition."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    t = Table.create(
        spark,
        str(tmp_path / "nt"),
        schema,
        partition_col="bucket",
        stats_columns=["doc_id", "bucket"],
    )
    rows = [(f"d{i}", [2, 10, 7, 100][i % 4], "x" * 50) for i in range(400)]
    df = spark.createDataFrame(rows, schema)
    t.append(df, distribute="partition")
    files = t.files()
    # every file pure: one bucket value each, all four values present —
    # rendered as strings (manifests type `partition` as string)
    assert all(f.partition is not None for f in files)
    assert {f.partition for f in files} == {"2", "10", "7", "100"}
    assert t.scan().count() == 400

    # NULL vs '' on a string partition column
    schema2 = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("grp", T.StringType()),
        ]
    )
    t2 = Table.create(
        spark,
        str(tmp_path / "nt2"),
        schema2,
        partition_col="grp",
        stats_columns=["doc_id", "grp"],
    )
    rows2 = [(f"a{i}", "") for i in range(50)] + [(f"b{i}", None) for i in range(50)]
    t2.append(spark.createDataFrame(rows2, schema2), distribute="partition")
    by_file = {}
    for f in t2.files():
        vals = {
            r.grp
            for r in t2.scan(files=[f]).select("grp").distinct().collect()
        }
        by_file[f.path] = vals
    # no file mixes NULL rows with ''-valued rows
    assert all(v in ({""}, {None}) for v in by_file.values()), by_file


def test_distribute_rejects_injected_partition_column(spark, tmp_path):
    """distribute requires the partition column in the caller's frame —
    auto-injected write-time system columns cannot route
    deterministically (planned at T1, stamped at T2)."""
    t = Table.create(spark, str(tmp_path / "it"))
    t.evolve_partition("_olake_insert_time")
    df = generate_sequences(spark, 50, seed=2, max_tok=16).drop(
        "_olake_insert_time"
    )
    with pytest.raises(ValueError, match="stamped at write time"):
        t.append(df, distribute="partition")
