"""Bloom-blob point-lookup pruning (table/blooms.py): parameter math,
no-false-negative property under both hash variants, scan(eq=) file
pruning observed via inputFiles, conservatism for post-build appends
and uncovered columns, driver/distributed prune parity, rebuild
supersession, and the Python/SQL lane twin exactness the registry
oracle relies on."""

import hashlib

import pytest
from pyspark.sql import functions as F

from olake_spark.datagen import generate_sequences
from olake_spark.table import Table
from olake_spark.table.blooms import (
    BLOOM_KEY,
    bloom_params,
    bloom_prune,
    bloom_prune_df,
    bloom_ref,
    build_bloom_blobs,
    keep_pred,
    pack_words,
    probe_lanes,
)
from olake_spark.table.manifest_df import manifest_entries_df


def _mk_table(spark, tmp_path, rows=1600, files_hint=128, seed=7):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(
        generate_sequences(spark, rows, seed=seed).repartition(4),
        max_records_per_file=files_hint,
    )
    return t


def test_bloom_params_shape():
    for n in (1, 100, 10_000, 1_000_000):
        m, k = bloom_params(n, 0.01)
        assert m % 64 == 0 and m >= 64
        assert 1 <= k <= 16
    # tighter fpp -> bigger filter
    assert bloom_params(1000, 0.001)[0] > bloom_params(1000, 0.05)[0]
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


@pytest.mark.parametrize("word_hash", ["xxhash64", "md5"])
def test_build_probe_no_false_negatives(spark, tmp_path, word_hash):
    t = _mk_table(spark, tmp_path)
    entry = build_bloom_blobs(t, ["doc_id"], fpp=0.01, word_hash=word_hash)
    assert entry["columns"] == ["doc_id"]
    files = t.files()
    assert len(files) > 4  # pruning has something to do
    # every sampled existing key: its file survives and scan(eq=) is exact
    sample = [
        r.doc_id
        for r in t.scan().select("doc_id").orderBy("doc_id").limit(400).collect()
    ][::40]
    for v in sample:
        surv = bloom_prune(t, files, {"doc_id": v}, word_hash=word_hash)
        got = (
            t.scan(files=surv, eq={"doc_id": v})
            .select("doc_id")
            .collect()
        )
        assert [r.doc_id for r in got] == [v]
    # and on average the filter actually prunes
    total = sum(
        len(bloom_prune(t, files, {"doc_id": v}, word_hash=word_hash))
        for v in sample
    )
    assert total < len(sample) * len(files) * 0.5


def test_scan_eq_prunes_input_files(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    build_bloom_blobs(t, ["doc_id"], fpp=0.001)
    n_files = len(t.files())
    v = t.scan().select("doc_id").first().doc_id
    df = t.scan(eq={"doc_id": v})
    assert len(df.inputFiles()) < n_files
    assert [r.doc_id for r in df.select("doc_id").collect()] == [v]
    # absent key: zero rows; typically every file bloom-pruned
    miss = t.scan(eq={"doc_id": "no-such-doc"})
    assert miss.count() == 0


def test_post_build_appends_are_kept(spark, tmp_path):
    t = _mk_table(spark, tmp_path, rows=600)
    build_bloom_blobs(t, ["doc_id"])
    old_snap = t.snapshot().snapshot_id
    t.append(generate_sequences(spark, 300, seed=99).repartition(2))
    # a key only in the new (blob-less) files must still be found
    new_key = (
        t.scan()
        .select("doc_id")
        .exceptAll(t.scan(snapshot_id=old_snap).select("doc_id"))
        .first()
        .doc_id
    )
    fresh = t.scan(eq={"doc_id": new_key})
    assert fresh.count() >= 1


def test_uncovered_column_is_conservative(spark, tmp_path):
    t = _mk_table(spark, tmp_path, rows=400)
    build_bloom_blobs(t, ["doc_id"])
    assert bloom_ref(t, "source") is None
    src = t.scan().select("source").first().source
    # eq on an uncovered column: falls back to min/max only, still exact
    got = t.scan(eq={"source": src})
    want = t.scan().where(F.col("source") == src)
    assert got.count() == want.count() > 0


def test_distributed_prune_matches_driver(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    build_bloom_blobs(t, ["doc_id"], fpp=0.001)
    v = t.scan().select("doc_id").orderBy(F.desc("doc_id")).first().doc_id
    driver = {f.path for f in bloom_prune(t, t.files(), {"doc_id": v})}
    entries = manifest_entries_df(t).where("content = 'data'")
    dist = {
        r.path
        for r in bloom_prune_df(t, entries, {"doc_id": v})
        .select("path")
        .collect()
    }
    assert dist == driver


def test_full_rebuild_supersedes_and_deletes_old_blob(spark, tmp_path):
    t = _mk_table(spark, tmp_path, rows=300)
    e1 = build_bloom_blobs(t, ["doc_id"])
    t.append(generate_sequences(spark, 200, seed=3).repartition(2))
    e2 = build_bloom_blobs(t, ["doc_id"], incremental=False)
    live = t.metadata[BLOOM_KEY]
    assert [e["paths"] for e in live] == [e2["paths"]]
    for p in e1["paths"]:
        assert not t.io.exists(t.abs_path(p))
    # fresh load sees the pointer
    t2 = Table.load(spark, t.root)
    assert bloom_ref(t2, "doc_id")["paths"] == e2["paths"]


def test_incremental_build_stacks_and_covers_new_files(spark, tmp_path):
    t = _mk_table(spark, tmp_path, rows=300)
    e1 = build_bloom_blobs(t, ["doc_id"], fpp=0.001)
    t.append(generate_sequences(spark, 200, seed=3).repartition(2))
    e2 = build_bloom_blobs(t, ["doc_id"], fpp=0.001)  # incremental default
    assert e2["paths"][: len(e1["paths"])] == e1["paths"]
    assert len(e2["paths"]) == len(e1["paths"]) + 1
    assert t.io.exists(t.abs_path(e1["paths"][0]))
    # the stacked blob now covers every file: probing a key that exists
    # only in the new files prunes down to (at least) its file — and an
    # absent key prunes everything despite two generations of blobs
    new_key = (
        t.scan()
        .select("doc_id")
        .exceptAll(
            t.scan(snapshot_id=t.snapshots()[0].snapshot_id).select("doc_id")
        )
        .first()
        .doc_id
    )
    covered = spark.read.parquet(
        *[t.abs_path(p) for p in e2["paths"]]
    ).select("path").distinct().count()
    assert covered == len(t.files())
    surv = bloom_prune(t, t.files(), {"doc_id": new_key})
    assert 1 <= len(surv) < len(t.files())
    # an absent key prunes (nearly) everything despite two generations
    # of blobs: a bloom false positive fires with probability ~fpp per
    # file, so a handful of files may legitimately survive the probe —
    # asserting == [] flakes at roughly n_files * fpp per run
    assert len(bloom_prune(t, t.files(), {"doc_id": "nope"})) <= 1
    # no new files since -> build is a no-op returning the live entry
    e3 = build_bloom_blobs(t, ["doc_id"], fpp=0.001)
    assert e3["paths"] == e2["paths"]


def test_cli_bloom_verb(spark, tmp_path, capsys):
    import json

    from olake_spark.cli import main

    t = _mk_table(spark, tmp_path, rows=400)
    dest = t.root
    assert main(["maintain", "--dest", dest, "--op", "bloom",
                 "--columns", "doc_id", "--cpus", "8"]) == 0
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    msg = next(m for m in lines if m.get("type") == "MAINTENANCE")
    assert msg["op"] == "bloom" and msg["columns"] == ["doc_id"]
    t2 = Table.load(spark, dest)
    assert bloom_ref(t2, "doc_id")["paths"] == msg["paths"]
    # unknown column is a clean error exit
    assert main(["maintain", "--dest", dest, "--op", "bloom",
                 "--columns", "nope"]) == 2


def test_md5_probe_lanes_is_exact_python_twin(spark):
    # hashlib twin == JVM md5 lanes: the registry oracle embeds the
    # Python-computed probe positions as literals on both sides
    for v in ("0", "doc-123", "xyz"):
        hx = hashlib.md5(v.encode()).hexdigest()
        want = (int(hx[:12], 16), int(hx[12:24], 16))
        assert probe_lanes(spark, v, "md5") == want


def test_keep_pred_matches_position_set_semantics(spark):
    # pack_words + keep_pred == "all probe positions in the file's
    # position set" — brute-force check over a tiny fixed geometry
    m, k = 256, 3
    vals = [f"v{i}" for i in range(40)]

    def lanes(v):
        hx = hashlib.md5(v.encode()).hexdigest()
        return int(hx[:12], 16), int(hx[12:24], 16)

    h1s, h2s = zip(*[lanes(v) for v in vals])
    words = pack_words(list(h1s), list(h2s), m, k)
    posset = {
        (h1 + i * h2) % m for h1, h2 in zip(h1s, h2s) for i in range(k)
    }
    blob = spark.createDataFrame(
        [(m, k, words)], "m long, k int, words array<long>"
    )
    probes = vals[:5] + ["absent-1", "absent-2", "absent-3"]
    for v in probes:
        h1, h2 = lanes(v)
        got = blob.select(keep_pred(h1, h2).alias("keep")).first().keep
        want = all((h1 + i * h2) % m in posset for i in range(k))
        assert got == want
