"""Heavy-tail hardening of the width_bucket rank/quantile machinery
(operators/rank.py:with_bucket_id, r9 — VERDICT r8 "What's wrong #1").

Three contracts pinned here:

1. OCCUPANCY CAP: on adversarial value distributions (lognormal body +
   1e12 outlier, outlier-stretched uniform, pure lognormal, signed
   heavy tails, a 1e-9-relative cluster co-resident with spread
   values, [0,1] scores, zipf counts) no bucket may hold more than the
   group's fair-share cap ``max(ceil(n/B), B)`` — the property that
   makes the per-bucket ``row_number``/value-histogram downstream
   work bounded at any corpus size. The r8 equi-width-between-min/max
   scheme violated this catastrophically (one outlier put ~100% of
   rows in bucket 1; measured 72.8 s vs ~3 s flat at the 8x point of
   tools/scale_slopes.py's quantile_heavy_tail fixture).
2. RESOLUTION FLOOR, documented not hidden: a cluster of DISTINCT
   values so tight that they collide in the signed-log double domain
   (ulp-scale relative spacing) is tie-like — no t-based bucketing can
   spread it; the bucket degrades to one parallel sort task. Pinned at
   a small multiple of the cap rather than left unstated.
3. MONOTONICITY: bucket ids must be non-decreasing in the value —
   including across binade boundaries, denormals, zero/-0.0 and sign
   changes — because rank offsets assume bucket order == value order.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Window as W, functions as F

from tripgogo_vector_search_spark.operators.rank import (
    with_bucket_id, with_global_rank)

B = 32


def _fair_cap(n: int) -> int:
    return max(math.ceil(n / B), B)


def _max_bucket(spark, vals: list[float]) -> int:
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "id bigint, v double").repartition(8)
    _, counts = with_bucket_id(df, "v", num_buckets=B)
    return counts.agg(F.max("_cnt").alias("mx")).collect()[0]["mx"]


def _adversaries() -> dict[str, list[float]]:
    rng = random.Random(42)
    n = 20_000
    return {
        "lognormal_outlier":
            [math.exp(rng.gauss(5, 2)) for _ in range(n)] + [1e12],
        "uniform_outlier":
            [rng.uniform(0, 1000) for _ in range(n)] + [1e12],
        "lognormal":
            [math.exp(rng.gauss(0, 3)) for _ in range(n)],
        "signed_heavy":
            [-math.exp(rng.gauss(8, 2)) for _ in range(n // 2)]
            + [rng.uniform(0, 1) for _ in range(n // 2)],
        # 90% of rows within a 1e-9-relative cluster, co-resident with
        # spread values — the shape that defeats min/max-between-group-
        # extremes AND level-chained splits (co-residents pin the span)
        "cluster_spread":
            [1e9 + rng.uniform(0, 1) for _ in range(n * 9 // 10)]
            + [rng.uniform(0, 1e10) for _ in range(n - n * 9 // 10)],
        "unit_scores":
            [rng.betavariate(8, 2) for _ in range(n)],
        "zipf_counts":
            [float(int(1000 / (1 + rng.paretovariate(1.2))))
             for _ in range(n)],
    }


def test_occupancy_cap_on_adversarial_distributions(spark):
    for label, vals in _adversaries().items():
        mx = _max_bucket(spark, vals)
        assert mx <= _fair_cap(len(vals)), (label, mx, _fair_cap(len(vals)))


def test_resolution_floor_is_tie_like_not_corpus_scale(spark):
    """Distinct values at ulp-scale relative spacing collide in the
    signed-log double domain — the documented floor. The bucket must
    still stay a SMALL MULTIPLE of the cap (parallel-peer task), never
    a corpus-scale fraction like the r8 scheme's ~100%."""
    rng = random.Random(42)
    n = 20_000
    vals = ([1e9 * (1 + rng.randint(0, 100) * 2.3e-16)
             for _ in range(n * 9 // 10)]
            + [rng.uniform(0, 1e10) for _ in range(n - n * 9 // 10)])
    mx = _max_bucket(spark, vals)
    assert mx <= 5 * _fair_cap(len(vals)), mx
    assert mx < len(vals) // 4, mx


def test_bucket_monotone_across_boundaries(spark):
    """Bucket ids non-decreasing in the value over binade/e-fold
    boundaries, denormals, +-0.0, sign flips, and extreme magnitudes —
    rank offsets assume bucket order == value order."""
    vals: list[float] = [0.0, -0.0, 5e-324, -5e-324, 1.0, -1.0,
                         1.7976931348623157e308, -1.7976931348623157e308]
    for e in range(-300, 301, 25):
        for m in (1.0, 1.0000000000000002, 1.9999999999999998):
            for s in (1.0, -1.0):
                vals.append(s * m * (2.0 ** e))
    # e-fold boundaries of the fixed grid (t = k exactly / just below)
    for k in range(1, 40, 3):
        x = math.expm1(k)
        vals += [x, math.nextafter(x, 0.0), math.nextafter(x, math.inf),
                 -x, math.nextafter(-x, 0.0), math.nextafter(-x, -math.inf)]
    vals = sorted(set(vals))
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id bigint, v double")
    d2, _ = with_bucket_id(df, "v", num_buckets=B)
    rows = sorted((r["v"], r["_bkt"]) for r in d2.select("v", "_bkt")
                  .collect())
    for (v1, b1), (v2, b2) in zip(rows, rows[1:]):
        assert b1 <= b2, (v1, b1, v2, b2)
    # and ties always share a bucket (equal values, one bucket)
    dup = spark.createDataFrame([(i, 42.5) for i in range(100)],
                                "id bigint, v double")
    d3, c3 = with_bucket_id(dup, "v", num_buckets=B)
    assert c3.count() == 1


def test_rank_exact_on_heavy_tail_values(spark):
    """with_global_rank == the single-task window on the adversarial
    shape itself (small n where the window is safe to run)."""
    rng = random.Random(7)
    vals = ([math.exp(rng.gauss(5, 2)) for _ in range(400)]
            + [1e12, 1e12 / 3]
            + [1e9 + rng.uniform(0, 1) for _ in range(300)])
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id bigint, v double").repartition(8)
    got = {r["id"]: r["rk"] for r in
           with_global_rank(df, "v", ["id"], rank_col="rk").collect()}
    w = W.orderBy("v", "id")
    want = {r["id"]: r["rk"] for r in
            df.select("id", F.row_number().over(w).alias("rk")).collect()}
    assert got == want


def test_old_equi_width_scheme_is_red_on_the_adversary(spark):
    """Red-on-the-old-shape proof: the r8 bucketing (equi-width
    width_bucket between the group min/max over the RAW value) puts
    essentially the whole corpus into one bucket on the
    lognormal+outlier adversary — the single-task-sort failure this
    round's scheme exists to prevent. If someone 'simplifies' the
    bucketing back, this documents exactly what breaks."""
    rng = random.Random(42)
    n = 20_000
    vals = [math.exp(rng.gauss(5, 2)) for _ in range(n)] + [1e12]
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "id bigint, v double").repartition(8)
    mm = df.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    old = (df.crossJoin(F.broadcast(mm))
           .select(F.least(F.width_bucket("v", "mn", "mx", F.lit(B)),
                           F.lit(B)).alias("bkt")))
    mx = (old.groupBy("bkt").count()
          .agg(F.max("count").alias("mx")).collect()[0]["mx"])
    # the outlier stretches the range so >99.9% of rows share bucket 1
    assert mx > len(vals) * 0.999, mx
    # ...which is the shape the shipped scheme keeps under the cap
    assert mx > 20 * _fair_cap(len(vals))


def test_tiny_negative_sliver_stays_below_nonnegatives(spark):
    """ADVICE r9 regression: for t in (-2^-54, 0) the evaluated
    fractional part t - floor(t) = t + 1 rounds to exactly 1.0, so the
    unclamped fine-cell id hit K and overflowed the (K+1) radix into
    the NEXT e-fold cell's thin slot. With the [-1, 0) e-fold cell fat
    AND its sliver fine cell split (c3 >= 1) while [0, 1) stays thin
    (c3 = 0), tiny negatives then sorted AFTER non-negatives —
    corrupt ranks, not just a merged bucket. The generic monotonicity
    test only exercises thin cells and cannot catch this."""
    # 2000 distinct values in (-5.6e-17, 0): every one triggers the
    # frac(t) == 1.0 rounding; together they overfill BOTH the e-fold
    # cell (fine level activates) and the sliver fine cell itself
    # (min/max split activates, c3 in [1, B])
    vals = [-k * 2.5e-20 for k in range(1, 2001)]
    # ...while [0, 1)'s e-fold cell stays under the fair-share cap
    vals += [k * 0.01 for k in range(60)]
    n = len(vals)
    assert 2000 > _fair_cap(n) > 60  # the shape the bug needs
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id bigint, v double").repartition(8)
    d2, counts = with_bucket_id(df, "v", num_buckets=B)
    rows = sorted((r["v"], r["_bkt"]) for r in
                  d2.select("v", "_bkt").collect())
    for (v1, b1), (v2, b2) in zip(rows, rows[1:]):
        assert b1 <= b2, (v1, b1, v2, b2)
    # every negative strictly below every non-negative bucket-wise OR
    # merged into the same bucket — never above
    neg_max = max(b for v, b in rows if v < 0)
    pos_min = min(b for v, b in rows if v >= 0)
    assert neg_max <= pos_min
    # the occupancy cap still holds on this shape
    mx = counts.agg(F.max("_cnt").alias("mx")).collect()[0]["mx"]
    assert mx <= 5 * _fair_cap(n), mx
    # and exact ranks survive end-to-end
    got = {r["id"]: r["rk"] for r in
           with_global_rank(df, "v", ["id"], rank_col="rk").collect()}
    w = W.orderBy("v", "id")
    want = {r["id"]: r["rk"] for r in
            df.select("id", F.row_number().over(w).alias("rk")).collect()}
    assert got == want
