"""Batch ingest pipeline — the Spark-native ``ingest_hotels.py``.

Reference (SURVEY.md §3.2): pandas read_csv -> per-row encode + INSERT
(one network round trip per row, 40 rows) -> single commit. Here it is one
distributed job: schema-declared CSV scan -> concat addr_text+city
(ingest_hotels.py:22) -> embed -> atomic parquet job commit. At 100 TB the
same plan holds: the scan and embed parallelize per input split and the
sink is append-only columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.embed import hash_embed_expr, hash_embed_udf
from ..sources.csv import read_hotels_csv
from ..sources.sinks import write_parquet


def embed_hotels(df: DataFrame, use_udf: bool = False) -> DataFrame:
    """Add `addr_vec` = normalized embedding of `addr_text + ' ' + city`
    (the exact text the reference embeds, ingest_hotels.py:22)."""
    text = F.concat_ws(" ", "addr_text", "city")
    if use_udf:
        vec = hash_embed_udf(normalized=True)(text)
    else:
        vec = hash_embed_expr(text, normalized=True)
    return df.withColumn("addr_vec", vec.cast("array<float>"))


def ingest_hotels(spark: SparkSession, csv_path: str, out_path: str,
                  use_udf: bool = False) -> DataFrame:
    hotels = embed_hotels(read_hotels_csv(spark, csv_path), use_udf=use_udf)
    write_parquet(hotels, out_path)
    return spark.read.parquet(out_path)
