"""Loaders for the driver-generated parquet fixture tables (TESTDATA.md).

These are thin ``spark.read.parquet`` wrappers — Parquet gives Catalyst
column pruning and predicate pushdown for free, so operators downstream
stay declarative and the scan only reads what the plan needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from k8stream_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in FIXTURE_TABLES:
        raise ValueError(f"unknown fixture table {name!r}; one of {FIXTURE_TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = FIXTURE_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API)."""
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
