"""Multimodal columns: image/audio/video as opaque ``binary`` content plus
typed metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schema, batch iteration, partition-preserving
feature extraction) is real and tested; the actual codec decode is stubbed
because image/audio libraries are not in this environment:

* ``decode_backend="fake"`` (default) — deterministic byte-level features
  (content-addressed; no codec), so pipelines and tests run offline;
* ``decode_backend="pil"`` etc. — raises ``NotImplementedError`` with the
  library boundary clearly marked; a real decoder drops into
  ``_decode_batch`` without touching the Spark plumbing.

At scale: binary payloads stay columnar in parquet, flow executor-side in
Arrow record batches, and never pass through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ])),
])

FEATURE_DIM = 64


def documents_as_media(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Treat the documents table as a binary media table (UTF-8 payloads) —
    the offline stand-in for an image/audio corpus with identical plumbing."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _byte_histogram(data: bytes, dim: int = FEATURE_DIM) -> list[int]:
    counts = [0] * dim
    for b in data:
        counts[b % dim] += 1
    return counts


def byte_feature_mapper(dim: int = FEATURE_DIM):
    """mapInPandas mapper: binary content -> `dim`-bucket byte histogram
    (the deterministic 'fake decode' feature extractor). Output schema:
    media_id bigint, feat array<bigint>."""
    def mapper(batches):
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "feat": [_byte_histogram(bytes(c), dim) for c in pdf["content"]],
            })
    return mapper


def extract_features(media: DataFrame, dim: int = FEATURE_DIM,
                     decode_backend: str = "fake") -> DataFrame:
    if decode_backend != "fake":
        raise NotImplementedError(
            f"decode backend {decode_backend!r}: codec libraries are not "
            "available in this environment; plug a real decoder into "
            "byte_feature_mapper/_decode_batch")
    return media.mapInPandas(byte_feature_mapper(dim),
                             schema="media_id bigint, feat array<bigint>")


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling as metadata math (no decode): one row per
    sampled frame offset within `meta.duration_ms`."""
    return (media
            .filter(F.col("meta.duration_ms").isNotNull())
            .select("media_id",
                    F.explode(F.sequence(F.lit(0), F.col("meta.duration_ms"),
                                         F.lit(every_ms))).alias("frame_ms")))


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize needs a codec — clearly-marked stub."""
    raise NotImplementedError(
        "image resize requires a codec library (PIL/opencv), not available "
        "in this environment; the mapInPandas plumbing is extract_features")


# -- container sniffing (r10): typed binary ops, no codec ------------------

#: real container magic numbers (PNG / JPEG / RIFF-WAV)
MAGIC_PNG = bytes([0x89, 0x50, 0x4E, 0x47])
MAGIC_JPEG = bytes([0xFF, 0xD8, 0xFF])
MAGIC_RIFF = b"RIFF"


def synth_media_corpus(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Deterministic mixed-container binary corpus: each document's
    UTF-8 payload prefixed with a REAL container magic chosen by
    id % 3 — the offline stand-in for a mixed image/audio lake whose
    byte-level structure (not just its metadata) is inspectable.
    NULL text yields NULL content (an unreadable object)."""
    k = F.col(id_col) % 3
    magic = (F.when(k == 0, F.lit(MAGIC_PNG))
             .when(k == 1, F.lit(MAGIC_JPEG))
             .otherwise(F.lit(MAGIC_RIFF)))
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.concat(magic, F.encode(F.col(text_col), "UTF-8"))
        .alias("content"))


def sniff_magic(content) -> "F.Column":
    """Container type from leading magic bytes as a pure Catalyst
    expression over the hex prefix (DuckDB 1.0 has no BLOB substring,
    so both engines compare substr(hex(content)) — 2 hex chars per
    byte, byte-exact and codec-free). Unrecognized or NULL payloads
    sniff as 'unknown'."""
    hx = F.hex(content)
    return (F.when(F.substring(hx, 1, 8) == "89504E47", F.lit("image/png"))
            .when(F.substring(hx, 1, 6) == "FFD8FF", F.lit("image/jpeg"))
            .when(F.substring(hx, 1, 8) == "52494646", F.lit("audio/wav"))
            .otherwise(F.lit("unknown")))
