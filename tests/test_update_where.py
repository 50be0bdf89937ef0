"""Predicate-addressed UPDATE (operators/dml.update_where): exact
touched-file rewrite, old-value assignment semantics, PK-hash upkeep,
lineage preservation, and MoR interplay."""

import pytest
from pyspark.sql import functions as F

from olake_spark.operators.deletes import delete_where
from olake_spark.operators.dml import update_where
from olake_spark.schema import OLAKE_ID, olake_id_expr
from olake_spark.table.format import LAST_UPDATED_SEQ, ROW_ID, Table


def batch(spark, lo, hi, src="a"):
    return spark.range(lo, hi).selectExpr(
        "format_string('doc-%05d', id) as doc_id",
        "array(cast(id as int), cast(id+1 as int), cast(id+2 as int)) as tokens",
        "cast(3 as int) as n_tok",
        f"'{src}' as source",
    )


def rows(t, **kw):
    return {
        r.doc_id: (tuple(r.tokens), r.n_tok, r.source)
        for r in t.scan(**kw).select("doc_id", "tokens", "n_tok", "source").collect()
    }


def test_update_basic_and_untouched_files_survive(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 40, "a"))
    t.append(batch(spark, 40, 80, "b"))
    before = rows(t)
    paths_before = {f.path for f in t.files()}
    res = update_where(
        t,
        "source = 'b' AND doc_id >= 'doc-00060'",
        {"tokens": "slice(tokens, 1, 1)", "n_tok": "1"},
        target_file_bytes=1 << 20,
    )
    assert res.updated_rows == 20
    after = rows(t.refresh())
    for d, v in after.items():
        if d >= "doc-00060":
            assert v == ((int(d[4:]),), 1, "b")
        else:
            assert v == before[d]
    # only source='b' files were rewritten; the 'a' append's files remain
    paths_after = {f.path for f in t.files()}
    assert paths_before & paths_after  # untouched files carried over
    assert res.rewritten_files < len(paths_before)


def test_assignments_see_old_values(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 10))
    # n_tok reads the OLD tokens; tokens then shrinks — order must not matter
    update_where(
        t,
        "doc_id = 'doc-00004'",
        {"n_tok": "n_tok + size(tokens)", "tokens": "slice(tokens, 1, 2)"},
        target_file_bytes=1 << 20,
    )
    r = rows(t.refresh())["doc-00004"]
    assert r == ((4, 5), 6, "a")


def test_doc_id_update_recomputes_pk_hash(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 10))
    update_where(
        t, "doc_id = 'doc-00007'", {"doc_id": "'doc-renamed'"},
        target_file_bytes=1 << 20,
    )
    got = (
        t.refresh()
        .scan()
        .filter(F.col("doc_id") == "doc-renamed")
        .select(OLAKE_ID, olake_id_expr("doc_id").alias("_expect"))
        .first()
    )
    assert got[OLAKE_ID] == got._expect


def test_no_match_no_commit_and_validation(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 10))
    v = t.version
    assert update_where(t, "n_tok = 99", {"n_tok": "1"}).snapshot_id is None
    assert t.version == v
    with pytest.raises(ValueError, match="system columns"):
        update_where(t, "true", {OLAKE_ID: "'x'"})
    with pytest.raises(KeyError, match="not in table schema"):
        update_where(t, "true", {"nope": "1"})
    with pytest.raises(ValueError, match="assignment"):
        update_where(t, "true", {})


def test_lineage_preserved_and_bumped(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"), row_lineage=True)
    t.append(batch(spark, 0, 30))
    lin0 = {
        r.doc_id: (r[ROW_ID], r[LAST_UPDATED_SEQ])
        for r in t.scan(with_lineage=True).select(
            "doc_id", ROW_ID, LAST_UPDATED_SEQ
        ).collect()
    }
    res = update_where(
        t, "doc_id < 'doc-00005'", {"n_tok": "0"}, target_file_bytes=1 << 20
    )
    lin1 = {
        r.doc_id: (r[ROW_ID], r[LAST_UPDATED_SEQ])
        for r in t.refresh().scan(with_lineage=True).select(
            "doc_id", ROW_ID, LAST_UPDATED_SEQ
        ).collect()
    }
    for d, (rid, seq) in lin1.items():
        assert rid == lin0[d][0]  # identity survives the rewrite
        assert seq == (res.snapshot_id if d < "doc-00005" else lin0[d][1])


def test_update_skips_mor_deleted_rows(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 20))
    delete_where(t, "doc_id < 'doc-00003'")
    res = update_where(
        t.refresh(), "doc_id < 'doc-00006'", {"n_tok": "0"},
        target_file_bytes=1 << 20,
    )
    assert res.updated_rows == 3  # 3,4,5 — dead rows not updated
    vis = rows(t.refresh())
    assert set(d for d in vis if d < "doc-00003") == set()
    assert all(vis[f"doc-{i:05d}"][1] == 0 for i in range(3, 6))


def test_scope_ranges_bound_discovery(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 30, "a"))
    t.append(batch(spark, 30, 60, "b"))
    res = update_where(
        t,
        "n_tok = 3",
        {"n_tok": "4"},
        target_file_bytes=1 << 20,
        sources=["b"],
    )
    # planning hint prunes to the 'b' files; predicate matched all of them
    assert res.updated_rows == 30
    vis = rows(t.refresh())
    assert all(v[1] == 4 for d, v in vis.items() if v[2] == "b")
    assert all(v[1] == 3 for d, v in vis.items() if v[2] == "a")


def test_swap_assignment_semantics(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 6))
    update_where(
        t, "doc_id = 'doc-00002'",
        {"doc_id": "source", "source": "doc_id"},
        target_file_bytes=1 << 20,
    )
    vis = rows(t.refresh())
    assert "a" in vis and vis["a"][2] == "doc-00002"  # swapped, not chained


def test_cli_dml_verbs(spark, tmp_path, capsys):
    from olake_spark.cli import main

    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 12))
    dest = str(tmp_path / "tbl")
    assert main(["maintain", "--dest", dest, "--op", "update-where",
                 "--where", "doc_id < 'doc-00002'",
                 "--set", "n_tok=0;tokens=slice(tokens,1,1)",
                 "--cpus", "8"]) == 0
    assert '"updated_rows": 2' in capsys.readouterr().out
    assert main(["maintain", "--dest", dest, "--op", "delete-where",
                 "--where", "doc_id = 'doc-00005'", "--cpus", "8"]) == 0
    assert '"deleted_rows": 1' in capsys.readouterr().out
    vis = rows(Table.load(spark, dest))
    assert vis["doc-00000"] == ((0,), 0, "a") and "doc-00005" not in vis
    # arg validation paths
    assert main(["maintain", "--dest", dest, "--op", "update-where",
                 "--where", "true", "--cpus", "8"]) == 2
    assert main(["maintain", "--dest", dest, "--op", "update-where",
                 "--where", "true", "--set", "garbage",
                 "--cpus", "8"]) == 2


def test_mor_mode_matches_cow(spark, tmp_path):
    from olake_spark.operators.deletes import materialize_deletes

    a = Table.create(spark, str(tmp_path / "cow"))
    b = Table.create(spark, str(tmp_path / "mor"))
    for t in (a, b):
        t.append(batch(spark, 0, 40, "a"))
        t.append(batch(spark, 40, 60, "b"))
    assignments = {"tokens": "slice(tokens, 1, 1)", "n_tok": "size(tokens)"}
    r_cow = update_where(a, "n_tok = 3 AND source = 'a'", assignments,
                         target_file_bytes=1 << 20)
    r_mor = update_where(b, "n_tok = 3 AND source = 'a'", assignments,
                         mode="mor", target_file_bytes=1 << 20)
    assert r_cow.updated_rows == r_mor.updated_rows == 40
    assert r_mor.rewritten_files == 0 and r_mor.details["delete_files"] == 1
    assert rows(a.refresh()) == rows(b.refresh())
    # MoR debt folds back to identical state
    materialize_deletes(b, target_file_bytes=1 << 20)
    assert rows(b.refresh()) == rows(a)
    assert not b.delete_files()


def test_mor_mode_updates_doc_id_by_old_key(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"))
    t.append(batch(spark, 0, 10))
    res = update_where(
        t, "doc_id = 'doc-00004'", {"doc_id": "'doc-moved'"}, mode="mor",
        target_file_bytes=1 << 20,
    )
    assert res.updated_rows == 1
    vis = rows(t.refresh())
    assert "doc-moved" in vis and "doc-00004" not in vis
    assert len(vis) == 10
