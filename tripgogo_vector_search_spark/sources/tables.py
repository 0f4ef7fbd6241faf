"""Parquet table sources (the engine's `table_scan`).

Reference analogue: `FROM hotels` full scans (streamlit_app.py:68-69) on a
row-store; here tables are columnar Parquet so Catalyst prunes columns and
pushes predicates into the scan — check `.explain("formatted")` for
`PushedFilters` / `ReadSchema`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table. Schema comes from parquet footers (already
    written with explicit types); no inference cost.

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    long (`nanosAsLong`); it is floor-converted to a microsecond timestamp
    here — the same truncation DuckDB applies when it reads NANOS into its
    microsecond TIMESTAMP, so oracle comparisons line up exactly.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    from ..schemas import TABLES
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
