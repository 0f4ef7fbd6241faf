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
