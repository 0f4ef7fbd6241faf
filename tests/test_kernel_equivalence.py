"""Property-based equivalence: the Arrow-batched kernels
(functions/kernels.py) must produce byte-identical output to the pure-SQL
expression forms (functions/hashing.py) on arbitrary text — including
whitespace runs, unicode, empties, and sub-shingle-length docs. Hypothesis
drives the text; one Spark job per example batch."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tripgogo_vector_search_spark.functions.hashing import minhash_signature, simhash32
from tripgogo_vector_search_spark.functions.kernels import (
    minhash_signature_udf, simhash_udf)
from tripgogo_vector_search_spark.functions.text import shingles, words

TEXTS = st.lists(
    st.text(alphabet=st.sampled_from(list("abc ABC 123 é中!,.")),
            min_size=0, max_size=60),
    min_size=1, max_size=12)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=TEXTS)
def test_simhash_kernel_equals_expression(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id int, text string")
    rows = df.select(
        simhash_udf("text").alias("k"),
        simhash32(words("text")).alias("e")).collect()
    for r in rows:
        assert r["k"] == r["e"]


def test_quantize_kernel_degrades_like_expression_spec(spark):
    """Pathological vectors (NaN / Inf / NULL elements) must DEGRADE
    the way the Catalyst expression spec does — null or NaN stats for
    the bad row — never throw and kill the whole Arrow batch (a NaN
    passed the old zero-max guard and ``int(nan)`` raised; a NULL
    element raised inside np.asarray). scale / codes_sum / max_err are
    compared against the live expression spec itself
    (functions/vector.py quantize_scale / quantize / dequantize_error);
    healthy rows in the same batch keep exact values."""
    import math

    from pyspark.sql import functions as SF

    from tripgogo_vector_search_spark.functions.kernels import (
        quantize_stats_udf)
    from tripgogo_vector_search_spark.functions.vector import (
        dequantize_error, quantize, quantize_scale)

    rows = [(1, [1.0, float("nan"), 2.0]),
            (2, [1.0, None, 2.0]),
            (3, [1.0, -3.0, 2.0]),
            (4, [0.0, 0.0]),
            (5, [float("inf"), 1.0]),
            (6, None)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    sc = quantize_scale("v")
    spec = df.select(
        "id", sc.alias("scale"),
        F.aggregate(quantize("v", sc), F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("codes_sum"),
        dequantize_error("v", sc).alias("max_err"))
    got = df.select("id", quantize_stats_udf("v").alias("st"))
    want = {r.id: r for r in spec.collect()}
    by_id = {r.id: r.st for r in got.collect()}

    def same(a, b):
        # a NaN kernel stat crosses the pandas->Arrow boundary as NULL
        # (pandas' float null sentinel), so NULL matches a spec NaN
        if isinstance(b, float) and math.isnan(b):
            return a is None or (isinstance(a, float) and math.isnan(a))
        if a is None or b is None:
            return a is None and b is None
        return a == b

    for i, st_row in by_id.items():
        w = want[i]
        # id=2 (NULL element) and id=6 (NULL vector): the Arrow path
        # delivers null ELEMENTS to the kernel as NaN (indistinguishable
        # from a true NaN), so both degrade via the NaN path to NULL
        # stats + zero checksum rather than the spec's mixed
        # null-skipping aggregates; the NULL vector pins the documented
        # (None, 0, 0.0, 0.0) zero-vector contract.
        if i == 2:
            assert st_row.scale is None and st_row.codes_sum == 0
            assert st_row.max_err is None
            continue
        if i == 6:
            assert st_row.scale is None and st_row.codes_sum == 0
            continue
        assert same(st_row.scale, w.scale), (i, st_row, w)
        assert same(st_row.codes_sum, w.codes_sum), (i, st_row, w)
        assert same(st_row.max_err, w.max_err), (i, st_row, w)
    # sq_err_sum degrade pattern: NaN and null-element rows -> NULL
    assert by_id[1].sq_err_sum is None and by_id[5].sq_err_sum is None
    assert by_id[2].sq_err_sum is None
    assert by_id[3].sq_err_sum > 0 and by_id[4].sq_err_sum == 0.0


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=TEXTS)
def test_minhash_kernel_equals_expression(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id int, text string")
    sh = shingles("text", 3)
    expr_sig = F.when(F.size(sh) > 0, minhash_signature(sh, 16))
    rows = df.select(
        minhash_signature_udf("text", 3, 16).alias("k"),
        expr_sig.alias("e")).collect()
    for r in rows:
        assert r["k"] == r["e"]


def test_dup_ngram_kernel_equals_expression(spark):
    """functions/kernels.py:dup_ngram_fraction_udf ==
    operators/corpus.py:dup_ngram_fraction (the pure-expression spec)
    after the shared Spark-side round — on the fixture corpus AND on
    synthetic overlap/point-mass/short-doc corners."""
    from pyspark.sql import functions as F

    from tripgogo_vector_search_spark.functions.kernels import (
        dup_ngram_fraction_udf)
    from tripgogo_vector_search_spark.functions.text import words
    from tripgogo_vector_search_spark.operators.corpus import (
        dup_ngram_fraction)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    # the NULL row (ADVICE r9): both sides must yield NULL, not 0.0 —
    # the expression used to fall through when(m >= n) to the 0.0
    # branch on NULL while the kernel propagated NULL
    synth = spark.createDataFrame(
        [(1000, "a b a b a b"), (1001, "x y z x y z x y z"),
         (1002, "w"), (1003, "s s s s"),
         (1004, "p q p r p q p"), (1005, None)],
        "doc_id bigint, text string")
    for frame in (docs, synth):
        rows = frame.select(
            "doc_id",
            F.round(dup_ngram_fraction_udf("text", 2), 6).alias("k2"),
            F.round(dup_ngram_fraction_udf("text", 3), 6).alias("k3"),
            dup_ngram_fraction(words("text"), 2).alias("e2"),
            dup_ngram_fraction(words("text"), 3).alias("e3")).collect()
        for r in rows:
            assert r["k2"] == r["e2"], r
            assert r["k3"] == r["e3"], r
    null_row = [r for r in synth.select(
        "doc_id", dup_ngram_fraction(words("text"), 2).alias("e2"),
        F.round(dup_ngram_fraction_udf("text", 2), 6).alias("k2"))
        .collect() if r["doc_id"] == 1005][0]
    assert null_row["e2"] is None and null_row["k2"] is None
