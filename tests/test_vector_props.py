"""Vector-operator property tests (SURVEY.md §5.3): identity, symmetry,
normalized-dot equivalence, knn(k=n) == full sort, to_vector roundtrip.
One deterministic 200-vector batch, one Spark job per property."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from tripgogo_vector_search_spark.functions import vector as V
from tripgogo_vector_search_spark.operators.knn import knn_topk
from tripgogo_vector_search_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS

DIM = 16
N = 200


def _vecs():
    rng = random.Random(42)
    out = []
    for i in range(N):
        v = [rng.uniform(-1, 1) for _ in range(DIM)]
        out.append((i, v, [rng.uniform(-1, 1) for _ in range(DIM)]))
    return out


def _df(spark):
    return spark.createDataFrame(_vecs(), "id int, a array<double>, b array<double>")


def test_self_distance_zero_and_symmetry(spark):
    rows = (_df(spark).select(
        "id",
        V.cosine_distance("a", "a").alias("d_self"),
        V.cosine_distance("a", "b").alias("d_ab"),
        V.cosine_distance("b", "a").alias("d_ba"),
        V.euclidean_distance("a", "a").alias("e_self"))).collect()
    for r in rows:
        assert abs(r["d_self"]) < 1e-12
        assert abs(r["d_ab"] - r["d_ba"]) < 1e-12
        assert r["e_self"] == 0.0


def test_normalized_vectors_distance_equals_one_minus_dot(spark):
    rows = (_df(spark)
            .select(V.l2_normalize("a").alias("na"), V.l2_normalize("b").alias("nb"))
            .select(V.cosine_distance("na", "nb").alias("d"),
                    (F.lit(1.0) - V.dot("na", "nb")).alias("one_minus_dot"))
            ).collect()
    for r in rows:
        assert abs(r["d"] - r["one_minus_dot"]) < 1e-9


def test_l2_normalize_unit_norm_and_zero_null(spark):
    df = _df(spark).select(V.l2_norm(V.l2_normalize("a")).alias("n"))
    for r in df.collect():
        assert abs(r["n"] - 1.0) < 1e-12
    zero = spark.createDataFrame([([0.0] * DIM,)], "z array<double>")
    out = zero.select(V.l2_normalize("z").alias("nz")).first()
    assert all(x is None for x in out["nz"])


def test_knn_k_equals_n_is_full_sort(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    n = emb.count()
    q = [math.sin(0.1 * (i + 1)) for i in range(64)]
    full = knn_topk(emb, q, k=n, tiebreak="vec_id").select("vec_id").collect()
    srt = (emb.withColumn("d", V.cosine_distance("embedding", V.vector_lit(q)))
           .orderBy(F.col("d").asc(), F.col("vec_id").asc())
           .select("vec_id").collect())
    assert [r.vec_id for r in full] == [r.vec_id for r in srt]


def test_to_vector_roundtrip_and_dim_check(spark):
    df = spark.createDataFrame(
        [("[1.5, -2.0, 3.25]",), ("[]",), ("[1.0,2.0]",)], "s string")
    out = df.select(V.to_vector("s").alias("v"),
                    V.to_vector("s", dim=3).alias("v3")).collect()
    assert out[0]["v"] == [1.5, -2.0, 3.25] and out[0]["v3"] == [1.5, -2.0, 3.25]
    assert out[1]["v"] == [] and out[1]["v3"] is None
    assert out[2]["v"] == [1.0, 2.0] and out[2]["v3"] is None


def test_match_score_contract(spark):
    df = spark.createDataFrame([(0.0,), (0.123456,), (2.0,)], "d double")
    rows = df.select(V.match_score("d").alias("m")).collect()
    assert [r["m"] for r in rows] == [100.0, 87.65, -100.0]


def test_approx_count_distinct_within_tolerance(spark):
    """Sketch aggregates are the 100 TB path for distinct counts (HLL++:
    fixed memory, one pass, mergeable across partitions). Exactness is
    oracle-gated elsewhere (count_distinct); here pin the sketch's error
    envelope vs exact."""
    o = load_table(spark, SF_CORRECTNESS, "orders")
    exact = o.select(F.countDistinct("o_custkey")).first()[0]
    approx = o.select(F.approx_count_distinct("o_custkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05, (exact, approx)
