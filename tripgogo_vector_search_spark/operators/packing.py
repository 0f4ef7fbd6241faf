"""Sequence packing for LLM training-data preparation.

The concat-and-chunk recipe (the GPT-style pretraining layout): within
each shard, documents are laid end-to-end in a deterministic order and
the token stream is cut into fixed-length training sequences. The
output maps every document to its sequence id and offset, from which a
writer can emit packed examples.

Spark-first shape: one token-count scan + one window cumulative sum per
shard. Shards are independent — the window never sees more than one
shard's rows, so parallelism equals the shard count and a skewed shard
is fixed by salting the shard key upstream (callers control ``shard_col``
precisely so the 100 TB layout — e.g. hash(doc_id) % 10k — stays a
caller decision rather than a global sort hidden inside the operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def pack_sequences(df: DataFrame, text_col: str, id_col: str,
                   shard_col: str, context_len: int = 512) -> DataFrame:
    """Assign each document a training-sequence id and token offset.

    Within a shard, documents are concatenated in ``id_col`` order and
    chunked every ``context_len`` tokens; a document whose span crosses
    a boundary simply continues into the next sequence (the standard
    concat-and-chunk semantics — no padding, no truncation).

    Returns ``(id, shard, n_tok, seq_id, seq_offset)`` where ``seq_id``
    is shard-local (the global sequence key is ``(shard, seq_id)``) and
    ``seq_offset`` is the document's first token's position within that
    sequence.
    """
    tok: Column = token_count(text_col).cast("bigint")
    w = (Window.partitionBy("shard").orderBy("id")
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("bigint"))
    return (df.select(F.col(id_col).alias("id"),
                      F.col(shard_col).alias("shard"),
                      tok.alias("n_tok"))
            .withColumn("start_tok", start)
            # integer div, not floor(double /): exact at any token count
            .select("id", "shard", "n_tok",
                    F.expr(f"start_tok div {int(context_len)}").alias("seq_id"),
                    (F.col("start_tok") % context_len).alias("seq_offset")))
