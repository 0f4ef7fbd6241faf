"""Central query registry: every operator from SURVEY.md §2 as a
(spark_fn, duckdb_oracle_sql) pair, keyed by the §2 `id`.

Each spark fn takes (spark, sf_dir) and returns a DataFrame whose column
names match the oracle SQL exactly (the driver sorts columns by name
before hashing). Computed floats are rounded to 6 dp on both sides;
double-sum aggregates go through exact DECIMAL accumulation so results are
independent of partition order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window as W

from ..functions import text as TX
from ..functions import vector as V
from ..operators.knn import knn_topk, with_distance, with_match_score
from ..session import prepare
from ..sources.tables import load_table
from .flagship import DIM, QUERY_VEC, flagship_query
from .oracle_helpers import sql_cosine_distance, sql_dot, sql_double_list

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare(spark)
            return fn(spark, sf_dir)
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped
    return deco


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# §2.A scans
# --------------------------------------------------------------------------

@query("table_scan", "SELECT * FROM nation")
def table_scan(spark, sf_dir):
    """Full table scan (reference: `FROM hotels`, streamlit_app.py:68-69)."""
    return _t(spark, sf_dir, "nation")


# --------------------------------------------------------------------------
# §2.B projections / scalar expressions
# --------------------------------------------------------------------------

@query("project",
       "SELECT c_custkey, c_name, c_mktsegment FROM customer")
def project(spark, sf_dir):
    """Column projection (streamlit_app.py:56-67). Catalyst prunes the
    parquet scan to exactly these columns."""
    return _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@query("rename_cols",
       """SELECT c_custkey AS customer_id, c_name AS customer_name,
                 c_acctbal AS account_balance
          FROM customer""")
def rename_cols(spark, sf_dir):
    """Bulk rename (streamlit_app.py:224-231)."""
    return (_t(spark, sf_dir, "customer")
            .select("c_custkey", "c_name", "c_acctbal")
            .withColumnsRenamed({"c_custkey": "customer_id",
                                 "c_name": "customer_name",
                                 "c_acctbal": "account_balance"}))


@query("concat_text",
       "SELECT doc_id, concat_ws(' ', text, lang) AS full_text FROM documents")
def concat_text(spark, sf_dir):
    """Space-joined string concat (ingest_hotels.py:22's
    `addr_text + ' ' + city`)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.concat_ws(" ", "text", "lang").alias("full_text"))


@query("derived_score",
       """SELECT l_orderkey, l_linenumber,
                 round((1.0 - l_discount) * 100, 2) AS match_score
          FROM lineitem""")
def derived_score(spark, sf_dir):
    """Arithmetic derived column `(1 - x) * 100` rounded to 2
    (streamlit_app.py:221)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round((F.lit(1.0) - F.col("l_discount")) * 100, 2).alias("match_score"),
    )


@query("cast_concat_pct",
       """SELECT l_orderkey, l_linenumber,
                 CAST(CAST(round((1.0 - l_discount) * 100, 2) AS DECIMAL(10,2)) AS VARCHAR)
                   || '%' AS display_score
          FROM lineitem""")
def cast_concat_pct(spark, sf_dir):
    """Numeric->string cast + '%' concat (streamlit_app.py:222). DECIMAL
    pivot makes the string rendering engine-independent."""
    li = _t(spark, sf_dir, "lineitem")
    score = F.round((F.lit(1.0) - F.col("l_discount")) * 100, 2)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.concat(score.cast("decimal(10,2)").cast("string"), F.lit("%")).alias("display_score"),
    )


@query("filter_predicates",
       """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
          FROM lineitem
          WHERE l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20
            AND l_shipdate >= TIMESTAMP '1995-01-01'""")
def filter_predicates(spark, sf_dir):
    """Filters (absent in the reference — SURVEY.md §2.B — but the natural
    pre-KNN refinement). Pushed down to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_returnflag") == "R")
                      & F.col("l_quantity").between(10, 20)
                      & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")))
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))


# --------------------------------------------------------------------------
# §2.D sorts / limits
# --------------------------------------------------------------------------

@query("sort_limit",
       """SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 10""")
def sort_limit(spark, sf_dir):
    """ORDER BY + FETCH FIRST k (streamlit_app.py:70-72) ->
    TakeOrderedAndProject; deterministic via key tiebreak."""
    o = _t(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
            .limit(10))


@query("sort_desc",
       """SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")
def sort_desc(spark, sf_dir):
    """Descending re-sort (streamlit_app.py:234)."""
    o = _t(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(10))


# --------------------------------------------------------------------------
# §2.C vector core
# --------------------------------------------------------------------------

_QV = sql_double_list(QUERY_VEC)

@query("to_vector",
       "SELECT vec_id, embedding AS vec FROM embeddings")
def to_vector(spark, sf_dir):
    """TO_VECTOR parity (streamlit_app.py:66): serialize each stored vector
    to its bracketed string literal form, parse it back with the engine's
    `to_vector`. Float->string is shortest-round-trip in Spark, so the
    round trip is the identity — the oracle is the raw column."""
    e = _t(spark, sf_dir, "embeddings")
    as_str = F.concat(
        F.lit("["),
        F.array_join(F.transform("embedding", lambda x: x.cast("string")), ","),
        F.lit("]"),
    )
    return e.select("vec_id", V.to_vector(as_str, dim=DIM).alias("vec"))


@query("l2_normalize",
       f"""SELECT vec_id,
                  list_transform(generate_series(1, len(embedding)),
                      i -> round(embedding[i]::DOUBLE / sqrt({sql_dot('embedding', 'embedding')}), 6))
                    AS unit_vec
           FROM embeddings""")
def l2_normalize(spark, sf_dir):
    """Unit-normalization (ingest_hotels.py:23 `normalize_embeddings=True`),
    elements rounded to 6 dp for cross-engine float comparison."""
    e = _t(spark, sf_dir, "embeddings")
    unit = F.transform(V.l2_normalize("embedding"), lambda x: F.round(x, 6))
    return e.select("vec_id", unit.alias("unit_vec"))


@query("cosine_distance",
       f"""SELECT vec_id, label,
                  round({sql_cosine_distance('embedding', _QV)}, 6) AS distance_score
           FROM embeddings""")
def cosine_distance_q(spark, sf_dir):
    """COSINE_DISTANCE vs the fixed query vector over the whole corpus
    (streamlit_app.py:64-67)."""
    e = _t(spark, sf_dir, "embeddings")
    return (with_distance(e, QUERY_VEC)
            .select("vec_id", "label", F.round("distance_score", 6).alias("distance_score")))


@query("knn_topk",
       f"""SELECT vec_id, label,
                  round(distance_score, 6) AS distance_score,
                  round((1.0 - distance_score) * 100, 2) AS match_score
           FROM (
             SELECT vec_id, label,
                    {sql_cosine_distance('embedding', _QV)} AS distance_score
             FROM embeddings
           ) ORDER BY distance_score ASC, vec_id ASC LIMIT 3""")
def knn_topk_q(spark, sf_dir):
    """The flagship: exact brute-force KNN + match score
    (streamlit_app.py:55-73,221)."""
    return flagship_query(spark, sf_dir)


@query("match_score",
       f"""SELECT vec_id,
                  round((1.0 - {sql_cosine_distance('embedding', _QV)}) * 100, 2) AS match_score
           FROM embeddings""")
def match_score_q(spark, sf_dir):
    """Distance -> similarity percentage rescaling (streamlit_app.py:221)."""
    e = _t(spark, sf_dir, "embeddings")
    return (with_match_score(with_distance(e, QUERY_VEC))
            .select("vec_id", "match_score"))


# --------------------------------------------------------------------------
# §2.E aggregations / windows / json
# --------------------------------------------------------------------------

@query("groupby_agg",
       """SELECT l_returnflag, l_linestatus,
                 CAST(round(SUM(CAST(l_quantity AS DECIMAL(20,4))), 2) AS DOUBLE) AS sum_qty,
                 CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(20,4))), 2) AS DOUBLE) AS sum_base_price,
                 CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))), 2) AS DOUBLE) AS sum_disc_price,
                 COUNT(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          GROUP BY l_returnflag, l_linestatus""")
def groupby_agg(spark, sf_dir):
    """TPC-H Q1-style hash aggregate (partial + final, map-side combine).
    DECIMAL accumulation keeps double sums exact and partition-order
    independent."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum(F.col("l_quantity").cast("decimal(20,4)")), 2)
                 .cast("double").alias("sum_qty"),
                F.round(F.sum(F.col("l_extendedprice").cast("decimal(20,4)")), 2)
                 .cast("double").alias("sum_base_price"),
                F.round(F.sum((F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                              .cast("decimal(24,6)")), 2)
                 .cast("double").alias("sum_disc_price"),
                F.count(F.lit(1)).alias("count_order"),
            ))


@query("window_topk",
       """SELECT n_name, c_custkey, c_name, c_acctbal
          FROM (
            SELECT n.n_name, c.c_custkey, c.c_name, c.c_acctbal,
                   row_number() OVER (PARTITION BY n.n_name
                                      ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rn
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          ) WHERE rn <= 3""")
def window_topk(spark, sf_dir):
    """Per-group top-k via row_number window; the nation dim is
    broadcast (25 rows) so the join is shuffle-free."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("n_name", "c_custkey", "c_name", "c_acctbal"))


@query("json_extract",
       """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events""")
def json_extract(spark, sf_dir):
    """JSON field extraction from string props (the reference's nested
    LLM-response extraction, streamlit_app.py:154, as a column op)."""
    e = _t(spark, sf_dir, "events")
    return e.select("event_id",
                    F.get_json_object("props", "$.k").cast("bigint").alias("k"))
