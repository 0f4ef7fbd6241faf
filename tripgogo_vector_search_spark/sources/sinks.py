"""Sinks.

The reference's sink is a row-by-row JDBC INSERT loop with one final
commit (`jdbc_sink`, ingest_hotels.py:21-36) — one network round trip per
row. The engine's equivalents:

* ``write_parquet`` — one distributed job; atomicity comes from the job
  commit protocol instead of the reference's single ``conn.commit()``.
* ``write_jdbc`` — capability parity for JDBC targets, but batched
  (``df.write.jdbc`` with batchsize), never per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
               batchsize: int = 10_000, **options) -> None:
    """Batched JDBC sink. Requires the target's JDBC driver jar on the
    classpath (not bundled here); raises whatever Spark raises without it."""
    (df.write.mode(mode)
       .format("jdbc")
       .option("url", url)
       .option("dbtable", table)
       .option("batchsize", str(batchsize))
       .options(**{k: str(v) for k, v in options.items()})
       .save())
