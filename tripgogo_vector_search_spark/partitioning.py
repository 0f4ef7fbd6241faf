"""Partitioning policy helpers.

``widen`` fixes the narrow-input + heavy-per-row-compute shape: a small
parquet file (one row group) scans as a single partition, serializing
CPU-bound kernels (hash sketches, embedding, regex batteries) on one core
while the rest of the cluster idles. At real scale inputs arrive in many
splits and this is a no-op; the explicit partition count keeps AQE from
coalescing the exchange back down (AQE only rewrites shuffles without a
user-specified numPartitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def shuffle_width(spark) -> int:
    """``spark.sql.shuffle.partitions`` as an int — the width CPU-dense
    small-byte stages pin their exchange to (guide §2.5) — falling back
    to ``sparkContext.defaultParallelism`` on platforms where the conf
    is non-numeric (e.g. "auto" under externally managed AQE). Shared
    helper per ADVICE r16 #2 (the inline ``int(conf.get(...))`` sites
    raised ValueError there)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def widen(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition up to ``target`` (default: cluster parallelism) when the
    plan currently has fewer partitions; never narrows."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
