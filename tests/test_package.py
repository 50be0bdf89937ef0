"""The north rule ships the engine as ``spark-submit --py-files
olake_spark.zip``. This drives that exact deployment: build the zip,
spark-submit a job from a directory where the repo is NOT importable
(no PYTHONPATH, foreign cwd), and run the full maintenance path —
including the Z-order pandas UDF, which executors must unpickle from
the distributed zip."""

import os
import shutil
import subprocess
import sys

JOB = """
import sys
from olake_spark.session import get_spark
from olake_spark.datagen import generate_sequences
from olake_spark.table import Table
from olake_spark.operators.compaction import compact
from olake_spark.operators.clustering import cluster

spark = get_spark("submit-smoke", cores=4, shuffle_partitions=4)
df = generate_sequences(spark, 2000, seed=5, max_tok=32)
t = Table.create(spark, sys.argv[1])
t.append(df.repartition(12))
compact(t, target_file_bytes=1 << 20)
cluster(t, curve="zorder", target_file_bytes=1 << 20)
assert t.refresh().scan().count() == 2000
print("SUBMIT-SMOKE-OK")
"""


def test_spark_submit_py_files_package(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "olake_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "package.py"), zip_path],
        check=True,
        capture_output=True,
    )
    job = tmp_path / "job.py"
    job.write_text(JOB)
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            str(job), str(tmp_path / "tbl"),
        ],
        cwd=str(tmp_path),  # repo not importable from here
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "SUBMIT-SMOKE-OK" in out.stdout, out.stderr[-3000:]
