"""fuzzy_join bucket-key guards (operators/fuzzy.py).

The sf0.1 fixture's 7-12-char names exercise only one-to-three length
buckets, so a regression to the quadratic block-only key would be
output-neutral AND nearly cost-neutral there (SCALE.md concedes this).
This synthetic MIXED-LENGTH corpus makes both properties bite:

- candidate growth: with C length classes sharing one (noun, c1)
  block, the block-only key emits all cross-class pairs (~C^2 growth)
  while the bucket key emits only same/adjacent-bucket pairs (~C);
- correctness: the bucketed output must equal a brute-force
  block join + length band + thresholded levenshtein, including
  pairs that straddle ADJACENT buckets (the probe +-1 explosion).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tripgogo_vector_search_spark.operators.fuzzy import (
    fuzzy_block_candidates, fuzzy_blocked_self_join)

# 4 length classes x 12 names, all sharing (c1='a', noun='common').
# Within a class, names differ only in a short version suffix
# (edit distance <= 2); across classes the first word's length jumps
# by 10 so the edit-distance-3 length band rules every pair out.
CLASSES = [5, 15, 25, 35]
PER_CLASS = 12


def _corpus(spark):
    rows = []
    key = 0
    for ci, L in enumerate(CLASSES):
        for i in range(PER_CLASS):
            rows.append((key, f"{'a' * L} common v{i:02d}"))
            key += 1
    return spark.createDataFrame(rows, "p_partkey long, p_name string")


def test_bucket_key_prunes_cross_class_candidates(spark):
    df = _corpus(spark)
    bucketed = fuzzy_block_candidates(df, bucketed=True).count()
    block_only = fuzzy_block_candidates(df, bucketed=False).count()
    n_classes, m = len(CLASSES), PER_CLASS
    within = n_classes * m * (m - 1) // 2
    total = (n_classes * m) * (n_classes * m - 1) // 2
    # block-only emits every cross-class pair; the bucket key emits
    # exactly the within-class (same-bucket) candidates here — classes
    # sit >= 2 buckets apart, so even the +-1 probe adds nothing
    assert block_only == total
    assert bucketed == within
    # the structural claim: candidates grow ~k with class count, not k^2
    assert bucketed * n_classes <= block_only


def test_fuzzy_join_matches_python_levenshtein(spark):
    """Third implementation: pure-Python DP edit distance over every
    same-(noun, c1) pair of a RANDOM mixed-length corpus — independent
    of Spark's levenshtein, the bucket key, and the probe explosion.
    Random seeds vary lengths AND near-duplicate suffix edits so the
    adjacent-bucket and band-boundary paths are exercised."""
    import random

    def lev(a, b):
        if abs(len(a) - len(b)) > 3:
            return 99
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(1234)
    rows = []
    for key in range(120):
        base_len = rng.choice([3, 5, 9, 14, 20])
        stem = "a" * base_len
        suffix = "".join(rng.choice("xyz") for _ in range(rng.randint(1, 4)))
        rows.append((key, f"{stem} common {suffix}"))
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    got = {(r.key_a, r.key_b): r.dist
           for r in fuzzy_blocked_self_join(df).collect()}
    names = dict(rows)
    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = lev(names[i], names[j])
            if d <= 3:
                want[(i, j)] = d
    assert got == want
    assert want  # the fixture must actually produce pairs


def test_bucketed_output_equals_bruteforce_on_mixed_lengths(spark):
    # include ADJACENT-bucket pairs: lengths 15 vs 17 (same block)
    # differ by 2 <= band 3 but can land in different buckets
    rows = [(100, "aaa common one"), (101, "aaaaa common one"),
            (102, "aaaa common one")]
    df = _corpus(spark).unionByName(
        spark.createDataFrame(rows, "p_partkey long, p_name string"))
    got = {tuple(r) for r in fuzzy_blocked_self_join(df)
           .select("key_a", "key_b", "dist").collect()}
    p = (df.select("p_partkey", "p_name",
                   F.length("p_name").alias("ln"),
                   F.split("p_name", " ").getItem(1).alias("noun"),
                   F.substring("p_name", 1, 1).alias("c1")))
    a, b = p.alias("a"), p.alias("b")
    brute = {tuple(r) for r in a.join(
        b, (F.col("a.noun") == F.col("b.noun"))
        & (F.col("a.c1") == F.col("b.c1"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")))
        .withColumn("dist", F.levenshtein(F.col("a.p_name"),
                                          F.col("b.p_name")))
        .filter(F.col("dist") <= 3)
        .select(F.col("a.p_partkey").alias("key_a"),
                F.col("b.p_partkey").alias("key_b"), "dist").collect()}
    assert got == brute
    # sanity: the adjacent-bucket trio produced cross-length pairs
    assert any(ka >= 100 and kb >= 100 and ka != kb for ka, kb, _ in got)
