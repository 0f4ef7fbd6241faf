"""Batch similarity join: every query row finds its top-k corpus
neighbors (SURVEY.md §2.E `sim_join`).

Strategy: broadcast the (small) query side, join against the corpus with
a codegen'd cosine expression, then per-query top-k via a row_number
window partitioned by query id. The corpus is never shuffled — only the
k-row-per-query window output moves. At 100 TB the corpus scan dominates
and parallelizes linearly; the window's partition count equals the query
count, so thousands of queries spread evenly.

For query sets too large to broadcast, switch to the ANN path
(operators/ann.py): bucket both sides and join per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions.vector import cosine_distance


def similarity_join(corpus: DataFrame, queries: DataFrame, k: int = 3,
                    corpus_vec: str = "embedding", corpus_id: str = "vec_id",
                    query_vec: str = "embedding", query_id: str = "vec_id",
                    exclude_self: bool = True) -> DataFrame:
    """Top-k corpus neighbors per query row by ascending cosine distance;
    deterministic corpus-id tiebreak."""
    from ..functions.vector import dot, l2_norm

    # Precompute each side's norm once per row (not once per pair): the
    # per-pair work drops from three 64-dim folds to one.
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(query_vec).alias("query_vec"),
                       l2_norm(query_vec).alias("query_norm"))
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"),
                      F.col(corpus_vec).alias("neighbor_vec"),
                      l2_norm(corpus_vec).alias("neighbor_norm"))
    joined = c.join(F.broadcast(q),
                    F.col("query_id") != F.col("neighbor_id") if exclude_self else F.lit(True))
    scored = joined.withColumn(
        "distance_score",
        F.lit(1.0) - dot("neighbor_vec", "query_vec")
        / (F.col("neighbor_norm") * F.col("query_norm")))
    w = W.partitionBy("query_id").orderBy(F.col("distance_score").asc(),
                                          F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("distance_score", 6).alias("distance_score")))
