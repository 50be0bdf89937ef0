"""SparkSession factory tuned for the maintenance engine.

Local mode is a stand-in for a multi-executor cluster: shuffle-partition
count and AQE settings are chosen so the same plans scale to 1000
executors (AQE coalesce/skew-join enabled, advisory partition sizes set,
Arrow enabled for the vectorized UDF path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def broadcast_cap_bytes(spark: SparkSession) -> int:
    """Byte ceiling for the engine's EXPLICIT broadcast hints (MoR
    delete anti-join payloads in table/format.py, merge key joins in
    operators/merge.py) — one source of truth, keyed off the session's
    ``spark.sql.autoBroadcastJoinThreshold`` so tuning the standard
    knob tunes the engine's hint sites too. ``-1`` (broadcast disabled)
    maps to 0: every hint site takes its shuffle-join fallback.
    Accepts Spark size strings ('64m', '10MB', '10485760b')."""
    raw = (
        str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
        .strip()
        .lower()
    )
    # full Spark byte-string grammar: optional 'b' after an optional
    # k/m/g/t/p scale ('1t', '64mb', '10485760b', plain digits)
    if raw.endswith("b"):
        raw = raw[:-1]
    mult = 1
    scales = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30,
              "t": 1 << 40, "p": 1 << 50}
    if raw and raw[-1] in scales:
        mult = scales[raw[-1]]
        raw = raw[:-1]
    try:
        v = int(float(raw)) * mult
    except ValueError:
        # unreachable for values Spark itself accepted; stay safe on
        # garbage rather than crashing a maintenance job
        v = 10 << 20
    return max(0, v)


def get_spark(
    app_name: str = "olake_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. Shuffle
    partitions default to 2x cores locally — on a real cluster you'd set
    this to ~2-3x total executor cores; AQE coalesces the excess.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cores == "*" else int(cores)
        shuffle_partitions = max(8, 2 * n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize numpy dispatch in the curve-key
        # UDFs (default 10k rows leaves vectorized ops overhead-bound)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # the olake Python data source (sources/datasource.py) prunes
        # files from pushed filters; the API is gated off by default
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("OLAKE_SPARK_DRIVER_MEM", "16g"))
        # Spark UI is the engine's live-monitor analog (SURVEY §2.7 C6);
        # opt in with OLAKE_SPARK_UI=1 (default off: headless CI runs)
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("OLAKE_SPARK_UI") == "1" else "false",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # FileOutputCommitter v2: task-side (parallel) renames instead of
        # v1's driver-side SERIAL rename of every task output at job
        # commit — a per-write fixed cost proportional to file count and
        # independent of core count, i.e. pure Amdahl drag on scaling.
        # v2's weaker crash contract (task outputs visible before job
        # commit) is safe here: every write lands in a private
        # data/<uuid> commit dir that no reader sees until a table
        # snapshot references it, and crash leftovers are reclaimed by
        # expire's orphan GC.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
    )
    # shuffle/spill scratch: prefer tmpfs — this sandbox's /tmp is a slow
    # virtio disk while /dev/shm is a 126 GB tmpfs; on a real cluster set
    # OLAKE_SPARK_LOCAL_DIR to the NVMe scratch mount
    local_dir = os.environ.get("OLAKE_SPARK_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/olake-spark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
