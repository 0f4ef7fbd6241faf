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
               batchsize: int = 10_000, ensure_table: str | None = None,
               driver_class: str | None = None, **options) -> None:
    """Batched JDBC sink. Requires the target's JDBC driver jar on the
    classpath (not bundled here); raises whatever Spark raises without it.

    ``ensure_table``: optional DDL (e.g. ``CREATE TABLE IF NOT EXISTS
    ...``) executed once through ``java.sql.DriverManager`` before the
    distributed write. Needed for dialect-less targets: Spark probes
    table existence with ``SELECT 1 FROM t WHERE 1=0`` and relies on
    the dialect classifying the failure as "object not found"; a driver
    outside Spark's dialect registry (e.g. DuckDB — the live-roundtrip
    test target) surfaces the probe's SQLException as a hard error
    instead of triggering CREATE TABLE. Pre-creating the table makes
    ``append`` a pure batched-INSERT job, which is also the portable
    contract the reference's ingest assumes (ingest_hotels.py:21-36
    inserts into a pre-existing table).

    ``driver_class``: force-load a driver class first (ServiceLoader
    registration can be skipped for jars added via spark.jars at
    session-build time).

    The pre-create connection carries the same ``user``/``password``
    (and any other string options) as the Spark write, via a
    java.util.Properties — an authenticated target must see identical
    credentials on both steps."""
    if ensure_table is not None:
        jvm = df.sparkSession._jvm
        if driver_class:
            jvm.java.lang.Class.forName(driver_class)
        props = jvm.java.util.Properties()
        for k, v in options.items():
            props.setProperty(str(k), str(v))
        conn = jvm.java.sql.DriverManager.getConnection(url, props)
        try:
            st = conn.createStatement()
            st.execute(ensure_table)
            st.close()
        finally:
            conn.close()
    (df.write.mode(mode)
       .format("jdbc")
       .option("url", url)
       .option("dbtable", table)
       .option("batchsize", str(batchsize))
       .options(**{k: str(v) for k, v in options.items()})
       .save())
