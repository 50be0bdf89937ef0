import pytest


@pytest.fixture(scope="session")
def spark():
    from olake_spark.session import get_spark

    s = get_spark("olake-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(autouse=True)
def _stable_session_confs(request):
    """Pin the shared session's runtime confs across tests.

    Tests that drive the CLI in-process (cli.main -> get_spark) or tune
    read geometry reconfigure the ONE session-scoped SparkSession;
    runtime confs like spark.sql.shuffle.partitions persist into later
    tests and change write layouts, making probabilistic assertions
    (bloom false-positive probes) order-dependent. Snapshot and restore
    the layout-relevant confs around every test."""
    if "spark" not in request.fixturenames:
        yield
        return
    s = request.getfixturevalue("spark")
    keys = (
        "spark.sql.shuffle.partitions",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes",
        "spark.sql.execution.arrow.maxRecordsPerBatch",
    )
    saved = {}
    for k in keys:
        try:
            saved[k] = s.conf.get(k)
        except Exception:
            pass
    yield
    for k, v in saved.items():
        if v is not None:
            s.conf.set(k, v)
