"""auto_maintain: policy-driven inspect → plan → execute loop.

Covers: metadata-only health numbers, dry-run read-only-ness, the
dependency-ordered execution path (materialize → compact → expire) with
byte-exact token survival, the cluster-supersedes-compact rule with
churn-based re-trigger, and the fixed-point property (a second run
plans nothing).
"""

import pytest

from olake_spark.operators.autopilot import (
    MaintenancePolicy,
    auto_maintain,
    inspect_health,
    plan_actions,
)
from olake_spark.operators.deletes import delete_where
from olake_spark.table import Table

MB = 1024 * 1024


def batch(spark, lo, hi, src="a"):
    return spark.range(lo, hi).selectExpr(
        "format_string('doc-%05d', id) as doc_id",
        "array(cast(id as int), cast(id+1 as int)) as tokens",
        "cast(2 as int) as n_tok",
        f"'{src}' as source",
    )


def visible(t):
    return {
        r.doc_id: tuple(r.tokens)
        for r in t.scan().select("doc_id", "tokens").collect()
    }


@pytest.fixture()
def messy_table(spark, tmp_path):
    """A table needing every kind of help: 32 small files across 4
    append snapshots, MoR delete debt, and history past the cap."""
    t = Table.create(spark, str(tmp_path / "tbl"))
    for i in range(4):
        t.append(batch(spark, i * 500, (i + 1) * 500).repartition(8))
    delete_where(t, "doc_id < 'doc-00050'")
    return t.refresh()


def _policy(**kw):
    base = dict(
        target_file_bytes=1 * MB,
        min_small_files=4,
        max_delete_files=1,
        max_snapshots=4,
        expire_keep_last=2,
    )
    base.update(kw)
    return MaintenancePolicy(**base)


def test_inspect_health_metadata_only(spark, messy_table):
    t = messy_table
    h = inspect_health(t, _policy())
    snap = t.snapshot()
    assert h.snapshot_id == snap.snapshot_id
    assert h.total_files == len(t.files()) == 32
    assert h.total_rows == int(snap.summary["total-rows"]) == 2000
    small = [f for f in t.files() if f.file_size_bytes < 0.75 * MB]
    assert h.small_files == len(small) == 32
    assert h.delete_file_count == len(t.delete_files()) >= 1
    assert h.delete_rows == 50
    assert h.snapshot_count == len(t.snapshots()) >= 5
    assert h.last_cluster_snapshot_id is None
    # never clustered: every appended row counts as churn
    assert h.rows_since_cluster == 2000


def test_dry_run_is_readonly_and_ordered(spark, messy_table):
    t = messy_table
    before_sid = t.current_snapshot_id
    before_files = {f.path for f in t.files()}
    r = auto_maintain(t, _policy(), dry_run=True)
    assert [a.op for a in r.planned] == [
        "materialize_deletes",
        "compact",
        "expire_snapshots",
    ]
    assert all(a.reason for a in r.planned)
    assert r.executed == []
    t.refresh()
    assert t.current_snapshot_id == before_sid
    assert {f.path for f in t.files()} == before_files


def test_auto_maintain_end_to_end_and_fixed_point(spark, messy_table):
    t = messy_table
    pol = _policy()
    r = auto_maintain(t, pol, max_passes=4)
    assert r.converged and 1 <= r.passes <= 4
    first_pass = [e.op for e in r.executed if e.details["pass"] == 0]
    assert first_pass == [a.op for a in r.planned]
    t.refresh()
    # delete debt folded back into data files
    assert t.delete_files() == []
    # small files binpacked (tiny-scale binpack converges over passes)
    assert len(t.files()) < 32
    # history trimmed and within policy
    assert len(t.snapshots()) <= pol.max_snapshots
    # tokens byte-exact through the whole pipeline
    assert visible(t) == {
        f"doc-{i:05d}": (i, i + 1) for i in range(50, 2000)
    }
    # fixed point: a healthy table plans nothing
    r2 = auto_maintain(t, pol)
    assert r2.planned == []
    assert r2.health.delete_file_count == 0
    assert r2.health.small_files < pol.min_small_files


def test_cluster_supersedes_compact_and_churn_retrigger(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "ctbl"))
    t.append(batch(spark, 0, 2000).repartition(20))
    pol = _policy(cluster_curve="zorder", max_snapshots=50,
                  recluster_churn=0.25)

    plan = plan_actions(inspect_health(t, pol), pol)
    assert [a.op for a in plan] == ["cluster"]
    assert "never clustered" in plan[0].reason

    r = auto_maintain(t, pol)
    assert [a.op for a in r.executed] == ["cluster"]
    t.refresh()
    assert t.snapshot().summary.get("kind") == "cluster-zorder"
    clustered_sid = t.current_snapshot_id

    # below-churn append: no recluster; compaction handles small files
    t.append(batch(spark, 2000, 2100).repartition(5))
    h = inspect_health(t, pol)
    assert h.last_cluster_snapshot_id == clustered_sid
    assert h.rows_since_cluster == 100
    plan = plan_actions(h, pol)
    assert [a.op for a in plan] == ["compact"]

    # past the churn threshold: incremental recluster from the last curve
    t.append(batch(spark, 2100, 2700).repartition(5))
    plan = plan_actions(inspect_health(t, pol), pol)
    assert [a.op for a in plan] == ["cluster"]
    assert plan[0].kwargs["since_snapshot_id"] == clustered_sid


def test_empty_table_plans_nothing(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "empty"))
    r = auto_maintain(t, _policy())
    assert r.planned == [] and r.executed == []


def test_table_properties_and_policy_precedence(spark, tmp_path):
    from olake_spark.operators.autopilot import policy_from_table

    t = Table.create(spark, str(tmp_path / "ptbl"))
    t.append(batch(spark, 0, 100))
    sid0 = t.current_snapshot_id
    # no-op set commits nothing
    assert t.set_properties({}) == sid0

    t.set_properties({
        "maintenance.cluster-curve": "hilbert",
        "maintenance.max-snapshots": "7",
        "maintenance.recluster-churn": "0.5",
        "team": "data-eng",
    })
    t.refresh()
    assert t.properties["maintenance.max-snapshots"] == "7"
    assert t.properties["team"] == "data-eng"

    # properties survive unrelated commits
    t.append(batch(spark, 100, 200))
    t.refresh()
    assert t.properties["maintenance.cluster-curve"] == "hilbert"

    # defaults < properties < overrides
    pol = policy_from_table(t)
    assert pol.cluster_curve == "hilbert"
    assert pol.max_snapshots == 7
    assert pol.recluster_churn == 0.5
    assert pol.min_small_files == MaintenancePolicy().min_small_files
    pol = policy_from_table(t, {"cluster_curve": "zorder"})
    assert pol.cluster_curve == "zorder" and pol.max_snapshots == 7

    # unset
    t.set_properties({"team": None})
    t.refresh()
    assert "team" not in t.properties
    assert t.properties["maintenance.cluster-curve"] == "hilbert"

    # auto_maintain with policy=None reads the table's own contract
    r = auto_maintain(t, dry_run=True)
    assert any(
        a.op == "cluster" and a.kwargs["curve"] == "hilbert"
        for a in r.planned
    )

    with pytest.raises(ValueError, match="maintenance.max-snapshots"):
        t.set_properties({"maintenance.max-snapshots": "lots"})
        t.refresh()
        policy_from_table(t)


def test_cli_auto_fleet_sweep(spark, tmp_path, capsys):
    """One invocation sweeps N tables; per-table policy from properties;
    a broken root is reported without aborting the sweep."""
    import json

    from olake_spark.cli import main

    roots = []
    for name in ("t1", "t2"):
        t = Table.create(spark, str(tmp_path / name))
        t.append(batch(spark, 0, 600).repartition(10))
        roots.append(t.root)
    Table.load(spark, roots[0]).set_properties(
        {"maintenance.min-small-files": "5"}
    )
    bad = str(tmp_path / "nope")

    rc = main(["maintain", "--dest", ",".join(roots + [bad]),
               "--op", "auto", "--max-passes", "2", "--cpus", "8",
               "--target-bytes", str(1 << 20)])
    assert rc == 3  # the bad root is an error, the sweep still ran
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()
             if x.startswith("{")]
    maint = [d for d in lines if d["type"] == "MAINTENANCE"]
    fleet = [d for d in lines if d["type"] == "FLEET"][0]
    assert {d["dest"] for d in maint} == set(roots)
    assert fleet["ok"] == 2 and fleet["failed"] == [bad]
    assert all(d["converged"] for d in maint)
    for root in roots:
        t = Table.load(spark, root)
        assert len(t.files()) < 10
        assert t.scan().count() == 600
