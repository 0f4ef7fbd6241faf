"""Exact KNN / top-k operators.

Reference semantics (streamlit_app.py:55-73): exact brute-force scan +
``ORDER BY distance ASC FETCH FIRST k ROWS ONLY`` — there is no ANN index
anywhere in the reference repo, so exact is the default here too (ANN is
opt-in, operators/ann.py).

Spark physical plan: ``orderBy().limit(k)`` compiles to
``TakeOrderedAndProject`` — each partition keeps a k-row heap and the
driver merges partition heads. O(n log k) per partition, no global sort,
no shuffle of the full table. This is the plan that survives 100 TB: cost
is one scan + k rows per partition over the wire.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.vector import cosine_distance, match_score, vector_lit


def with_distance(df: DataFrame, query_vec: Sequence[float] | Column,
                  vec_col: str = "embedding",
                  dist_col: str = "distance_score") -> DataFrame:
    if isinstance(query_vec, Column):
        return df.withColumn(dist_col, cosine_distance(F.col(vec_col), query_vec))
    # Constant query: hoist its norm to a Python-computed literal (same
    # sequential double fold, bit-identical) — one fewer 64-dim fold/row.
    from ..functions.vector import dot, l2_norm
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    dist = (F.lit(1.0) - dot(F.col(vec_col), vector_lit(query_vec))
            / (l2_norm(F.col(vec_col)) * F.lit(qnorm)))
    return df.withColumn(dist_col, dist)


def knn_topk(df: DataFrame, query_vec: Sequence[float] | Column, k: int = 3,
             vec_col: str = "embedding", dist_col: str = "distance_score",
             tiebreak: str | None = None) -> DataFrame:
    """Exact top-k by ascending cosine distance.

    The reference breaks distance ties arbitrarily (no secondary sort key,
    streamlit_app.py:70-71); pass ``tiebreak=<id col>`` for deterministic
    results (required for oracle comparison).
    """
    scored = with_distance(df, query_vec, vec_col, dist_col)
    order = [F.col(dist_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    return scored.orderBy(*order).limit(k)


def with_match_score(df: DataFrame, dist_col: str = "distance_score",
                     score_col: str = "match_score") -> DataFrame:
    """Append the reference's client-side derived column
    (streamlit_app.py:221)."""
    return df.withColumn(score_col, match_score(F.col(dist_col)))
