from olake_spark.table.format import DataFile, Snapshot, Table  # noqa: F401
