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
from ..operators import dedup as DD
from ..operators import textstats as TS
from ..operators.knn import knn_topk, with_distance, with_match_score
from ..operators.simjoin import similarity_join
from ..session import prepare
from ..sources.tables import load_table
from .flagship import DIM, QUERY_VEC, flagship_query
from .oracle_helpers import (sql_cosine_distance, sql_dot, sql_double_list,
                             sql_lsh_band_keys, sql_minhash_signature,
                             sql_norm, sql_shingles, sql_simhash32,
                             sql_stopword_hits, sql_words)

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


# --------------------------------------------------------------------------
# Dedup suite (north-star extension: SURVEY.md §2.E / BASELINE.json)
# --------------------------------------------------------------------------

@query("exact_dedup",
       """SELECT text, min(doc_id) AS canonical_id, count(*) AS dup_count
          FROM documents GROUP BY text""")
def exact_dedup_q(spark, sf_dir):
    """Exact duplicate groups by full text (hash groupBy; map-side combine,
    one shuffle on the text key)."""
    return DD.exact_dedup(_t(spark, sf_dir, "documents"), ["text"], "doc_id")


@query("fingerprint_dedup",
       r"""SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
                  min(doc_id) AS canonical_id, count(*) AS dup_count
           FROM documents GROUP BY 1""")
def fingerprint_dedup_q(spark, sf_dir):
    """Dedup on the normalized-text md5 fingerprint."""
    return DD.fingerprint_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


_MINHASH_CTE = f"""
WITH w AS (SELECT doc_id, {sql_words('text')} AS ws FROM documents),
sh AS (SELECT doc_id, {sql_shingles('ws', 3)} AS sh FROM w),
sig AS (SELECT doc_id, {sql_minhash_signature('sh', 16)} AS sig
        FROM sh WHERE len(sh) > 0),
bands AS (SELECT doc_id, unnest({sql_lsh_band_keys('sig', 4, 4)}) AS band_key
          FROM sig),
pairs AS (SELECT DISTINCT a.doc_id AS dup_id, b.doc_id AS src_id
          FROM bands a JOIN bands b
            ON a.band_key = b.band_key AND b.doc_id < a.doc_id),
mins AS (SELECT dup_id, min(src_id) AS min_src FROM pairs GROUP BY dup_id)
"""

@query("minhash_dedup",
       _MINHASH_CTE + """
       SELECT d.doc_id, (m.min_src IS NOT NULL) AS is_dup,
              coalesce(m.min_src, d.doc_id) AS canonical_id
       FROM documents d LEFT JOIN mins m ON d.doc_id = m.dup_id""")
def minhash_dedup_q(spark, sf_dir):
    """MinHash+LSH near-dedup: 3-word shingles -> 16 md5-seeded minhashes
    -> 4 bands x 4 rows -> band-key self-join -> smallest-id canonical."""
    return DD.minhash_lsh_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id",
                                shingle_n=3, num_hashes=16, bands=4)


@query("simhash_dedup",
       f"""SELECT {sql_simhash32(sql_words('text'))} AS simhash,
                  min(doc_id) AS canonical_id, count(*) AS dup_count
           FROM documents GROUP BY 1""")
def simhash_dedup_q(spark, sf_dir):
    """SimHash (32-bit, md5-derived) exact-signature dedup."""
    return DD.simhash_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


@query("ngram_jaccard",
       f"""WITH w AS (SELECT doc_id, {sql_words('text')} AS ws FROM documents),
           sh AS (SELECT doc_id, list_distinct({sql_shingles('ws', 3)}) AS sh FROM w),
           nz AS (SELECT doc_id, sh, len(sh) AS n_sh FROM sh WHERE len(sh) > 0),
           inv AS (SELECT doc_id, n_sh, unnest(sh) AS shingle FROM nz),
           inter AS (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a,
                    b.n_sh AS n_b, count(*) AS inter
             FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2, 3, 4)
           SELECT id_a, id_b,
                  round(inter::DOUBLE / (n_a + n_b - inter), 6) AS jaccard
           FROM inter""")
def ngram_jaccard_q(spark, sf_dir):
    """N-gram Jaccard similarity join via inverted shingle index (candidate
    pairs = docs sharing >= 1 shingle)."""
    return DD.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), "text", "doc_id",
                                  shingle_n=3, min_jaccard=0.0)


_SIGN_BUCKET = ("array_to_string(list_transform(generate_series(1, 8), "
                "i -> CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END), '')")

@query("embedding_near_dup",
       f"""WITH e AS (SELECT vec_id, embedding, {_SIGN_BUCKET} AS bucket
                      FROM embeddings),
           pairs AS (
             SELECT a.vec_id AS id_a, b.vec_id AS id_b
             FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
             WHERE {sql_dot('a.embedding', 'b.embedding')}
                   / ({sql_norm('a.embedding')} * {sql_norm('b.embedding')}) >= 0.95),
           mins AS (SELECT id_b AS dup_id, min(id_a) AS min_src
                    FROM pairs GROUP BY 1)
           SELECT v.vec_id, (m.min_src IS NOT NULL) AS is_dup,
                  coalesce(m.min_src, v.vec_id) AS canonical_id
           FROM embeddings v LEFT JOIN mins m ON v.vec_id = m.dup_id""")
def embedding_near_dup_q(spark, sf_dir):
    """Embedding-cosine near-dedup: sign-prefix bucketing bounds the pair
    join; cosine >= 0.95 within buckets."""
    return DD.embedding_near_dup(_t(spark, sf_dir, "embeddings"), "embedding",
                                 "vec_id", prefix_bits=8, threshold=0.95)


# --------------------------------------------------------------------------
# Similarity join (batch top-k per query row)
# --------------------------------------------------------------------------

@query("sim_join",
       f"""WITH q AS (SELECT vec_id, embedding FROM embeddings
                      WHERE vec_id % 25 = 0),
           scored AS (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    {sql_cosine_distance('c.embedding', 'q.embedding')} AS d,
                    row_number() OVER (
                      PARTITION BY q.vec_id
                      ORDER BY {sql_cosine_distance('c.embedding', 'q.embedding')} ASC,
                               c.vec_id ASC) AS rank
             FROM embeddings c CROSS JOIN q
             WHERE c.vec_id != q.vec_id)
           SELECT query_id, neighbor_id, rank, round(d, 6) AS distance_score
           FROM scored WHERE rank <= 3""")
def sim_join_q(spark, sf_dir):
    """Batch similarity join: each query row (every 25th vector) gets its
    top-3 nearest corpus neighbors. Query side is broadcast."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 25 == 0)
    return similarity_join(e, q, k=3)


# --------------------------------------------------------------------------
# Text analysis (north-star extension)
# --------------------------------------------------------------------------

@query("text_stats",
       f"""SELECT doc_id, length(text) AS char_count,
                  len({sql_words('text')}) AS word_count,
                  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS token_count,
                  round(length(text)::DOUBLE / len({sql_words('text')}), 6) AS chars_per_word
           FROM documents""")
def text_stats_q(spark, sf_dir):
    """Per-doc char/word/lexer-token counts + mean word length."""
    return TS.doc_stats(_t(spark, sf_dir, "documents"))


def _lang_id_sql() -> str:
    wl = f"list_transform({sql_words('text')}, t -> lower(t))"
    hits = {lang: sql_stopword_hits(wl, sw) for lang, sw in TX.STOPWORDS.items()}
    ordered = sorted(hits)
    cases = []
    for lang in ordered:
        others = ", ".join(hits[o] for o in ordered if o != lang)
        cases.append(f"WHEN {hits[lang]} > 0 AND {hits[lang]} >= greatest({others}) "
                     f"THEN '{lang}'")
    ladder = "\n".join(cases)
    return (f"SELECT doc_id, CASE {ladder} ELSE 'unknown' END AS lang_pred "
            f"FROM documents")


@query("lang_id", _lang_id_sql())
def lang_id_q(spark, sf_dir):
    """Stopword-hit language-ID heuristic (first-match alphabetical ties)."""
    return TS.lang_id(_t(spark, sf_dir, "documents"))


@query("quality_score",
       f"""SELECT doc_id,
                  round(
                    least(len({sql_words('text')})::DOUBLE / 20.0, 1.0)
                    * greatest(0.0, 1.0 -
                        (length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
                         / length(text)) * 4)
                    * CASE WHEN (length(text)::DOUBLE / len({sql_words('text')})) >= 3
                                AND (length(text)::DOUBLE / len({sql_words('text')})) <= 12
                           THEN 1.0 ELSE 0.5 END,
                  6) AS quality
           FROM documents""")
def quality_score_q(spark, sf_dir):
    """Heuristic doc quality: length x punctuation x word-shape factors."""
    return TS.doc_quality(_t(spark, sf_dir, "documents"))


@query("doc_fingerprint",
       r"""SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
           FROM documents""")
def doc_fingerprint_q(spark, sf_dir):
    """Stable md5 fingerprint of normalized text."""
    return TS.doc_fingerprint(_t(spark, sf_dir, "documents"))


@query("lang_dist",
       "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang")
def lang_dist_q(spark, sf_dir):
    """Language distribution of the corpus."""
    return TS.lang_distribution(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Embedding + multimodal (§2.C embed_text / north-star multimodal)
# --------------------------------------------------------------------------

from .oracle_helpers import sql_hash_bucket, sql_hash_sign  # noqa: E402


@query("embed_text",
       f"""WITH w AS (SELECT doc_id,
                             list_transform({sql_words('text')}, t -> md5(t)) AS hs
                      FROM documents)
           SELECT doc_id,
                  list_transform(generate_series(0, 63), b ->
                    list_sum(list_transform(hs, h ->
                      CASE WHEN {sql_hash_bucket('h')} = b
                           THEN {sql_hash_sign('h')} ELSE 0 END))::BIGINT) AS vec
           FROM w""")
def embed_text_q(spark, sf_dir):
    """Deterministic hash embedder (raw signed-count signature) as a pure
    Catalyst expression — the JVM-side form of §2.C embed_text. The
    normalized pandas-UDF form is pinned equal in tests."""
    from ..functions.embed import hash_embed_expr
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id",
                    hash_embed_expr("text", normalized=False)
                    .cast("array<bigint>").alias("vec"))


@query("multimodal_features",
       """SELECT doc_id AS media_id,
                 list_transform(generate_series(0, 63), b ->
                   list_sum(list_transform(generate_series(1, length(text)), i ->
                     CASE WHEN ascii(substring(text, i, 1)) % 64 = b
                          THEN 1 ELSE 0 END))::BIGINT) AS feat
          FROM documents""")
def multimodal_features_q(spark, sf_dir):
    """Binary-column feature extraction: UTF-8 payloads flow as Arrow
    binary batches through mapInPandas; features are an exact byte
    histogram so the oracle (ascii() over ASCII text) matches."""
    from ..operators.multimodal import documents_as_media, extract_features
    d = _t(spark, sf_dir, "documents")
    return extract_features(documents_as_media(d))


# --------------------------------------------------------------------------
# Streaming (§2.G extension)
# --------------------------------------------------------------------------

@query("stream_window_agg",
       """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                 event_type, count(*) AS n_events,
                 CAST(round(SUM(CAST(value AS DECIMAL(20,4))), 2) AS DOUBLE) AS sum_value
          FROM events GROUP BY 1, 2""")
def stream_window_agg_q(spark, sf_dir):
    """Structured Streaming tumbling-window agg driven to completion on
    the finite events source; oracle is the equivalent batch date_trunc."""
    from ..streaming.ingest import (run_stream_to_table, stream_events,
                                    windowed_event_agg)
    agg = windowed_event_agg(stream_events(spark, sf_dir))
    return run_stream_to_table(spark, agg, mode="complete")


@query("stream_embed", ORACLES["embed_text"])
def stream_embed_q(spark, sf_dir):
    """Embed-on-arrival via readStream; must equal the batch embed_text
    oracle exactly."""
    from ..streaming.ingest import run_stream_to_table, stream_embed_documents
    return run_stream_to_table(spark, stream_embed_documents(spark, sf_dir),
                               mode="append")


# --------------------------------------------------------------------------
# ANN (opt-in approximate path; exact KNN stays the default)
# --------------------------------------------------------------------------

from ..operators import ann as ANN  # noqa: E402

_PLANES = ANN.lsh_planes()
_QBUCKET = ANN.py_lsh_bucket(QUERY_VEC, _PLANES)
_BUCKET_SQL = "(" + " || ".join(
    f"(CASE WHEN {sql_dot('embedding', sql_double_list(p))} >= 0 "
    "THEN '1' ELSE '0' END)"
    for p in _PLANES) + ")"

@query("ann_lsh",
       f"""SELECT vec_id, round({sql_cosine_distance('embedding', _QV)}, 6)
                    AS distance_score
           FROM embeddings
           WHERE {_BUCKET_SQL} = '{_QBUCKET}'
           ORDER BY {sql_cosine_distance('embedding', _QV)} ASC, vec_id ASC
           LIMIT 3""")
def ann_lsh_q(spark, sf_dir):
    """LSH random-hyperplane ANN: search only the query's sign-bit bucket
    (single probe); ~corpus/2^8 candidates instead of a full scan."""
    idx = ANN.build_lsh_index(_t(spark, sf_dir, "embeddings"), planes=_PLANES)
    return ANN.lsh_search(idx, QUERY_VEC, k=3, planes=_PLANES)


@query("ann_ivf",
       f"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec
                      FROM embeddings WHERE vec_id < 16),
           a AS (SELECT e.vec_id, e.embedding, c.cid,
                        row_number() OVER (
                          PARTITION BY e.vec_id
                          ORDER BY {sql_cosine_distance('e.embedding', 'c.cvec')} ASC,
                                   c.cid ASC) AS rn
                 FROM embeddings e CROSS JOIN c),
           assign AS (SELECT vec_id, embedding, cid FROM a WHERE rn = 1),
           probes AS (SELECT cid FROM (
                        SELECT cid, row_number() OVER (
                          ORDER BY {sql_cosine_distance('cvec', _QV)} ASC,
                                   cid ASC) AS rn
                        FROM c)
                      WHERE rn <= 2),
           scored AS (SELECT s.vec_id, s.cid,
                             {sql_cosine_distance('s.embedding', _QV)} AS d
                      FROM assign s JOIN probes p ON s.cid = p.cid)
           SELECT vec_id, cid, round(d, 6) AS distance_score
           FROM scored ORDER BY d ASC, vec_id ASC LIMIT 3""")
def ann_ivf_q(spark, sf_dir):
    """IVF ANN: nearest-centroid cell assignment (seed-sampled centroids),
    probe the 2 cells nearest the query, exact search within."""
    return ANN.ivf_search(_t(spark, sf_dir, "embeddings"), QUERY_VEC,
                          k=3, n_cells=16, nprobe=2)
