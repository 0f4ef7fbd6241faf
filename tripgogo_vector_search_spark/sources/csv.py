"""CSV source (reference `csv_scan`: pd.read_csv of the hotel corpus,
ingest_hotels.py:9) — schema-declared, no inference in production paths."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import HOTELS_CSV


def read_hotels_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, header=True, schema=HOTELS_CSV)


def read_csv_with_schema(spark: SparkSession, path: str,
                         schema: StructType) -> DataFrame:
    """Schema-on-read CSV scan with a declared schema — no inference pass
    (inference reads the data twice, which is unacceptable at 100 TB)."""
    return spark.read.csv(path, header=True, schema=schema)


def read_jsonl_with_schema(spark: SparkSession, path: str,
                           schema: StructType) -> DataFrame:
    """Schema-declared JSON-lines scan (same no-inference policy as CSV;
    JSONL is the interchange format most scraped/LLM corpora arrive in)."""
    return spark.read.json(path, schema=schema)
