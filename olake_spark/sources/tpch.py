"""Loaders for the driver-generated testdata tables (TESTDATA.md).

The analog of the reference's ``discover`` + stream setup
(/root/reference/protocol/discover.go:16-26): for typed parquet, schema
discovery is just reading table metadata, so "discover" here reduces to
enumerating tables and exposing them as DataFrames / temp views.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every testdata table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
