"""Degenerate-input robustness: empty corpora, NULL/empty text, and
single-row inputs must flow through every operator family without
crashing and with sensible outputs (a 100 TB pipeline always contains
broken rows; an operator that throws on one poisons the whole job).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tripgogo_vector_search_spark.operators import dedup as DD
from tripgogo_vector_search_spark.operators.knn import knn_topk
from tripgogo_vector_search_spark.operators.textstats import doc_stats, lang_id


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_dedup_family_on_empty_corpus(spark):
    empty = _corpus(spark, [])
    assert DD.minhash_lsh_dedup(empty, "text", "doc_id").count() == 0
    assert DD.simhash_banded_dedup(empty, "text", "doc_id").count() == 0
    assert DD.ngram_jaccard_pairs(empty, "text", "doc_id").count() == 0
    assert DD.fingerprint_dedup(empty, "text", "doc_id").count() == 0


def test_dedup_family_on_null_and_short_text(spark):
    rows = [(1, None), (2, ""), (3, "one"), (4, "two words"),
            (5, "three word doc"), (6, "three word doc")]
    docs = _corpus(spark, rows)
    out = {r.doc_id: (r.is_dup, r.canonical_id)
           for r in DD.minhash_lsh_dedup(docs, "text", "doc_id").collect()}
    # every input row gets a verdict; docs with no shingles never collide
    assert set(out) == {1, 2, 3, 4, 5, 6}
    for i in (1, 2, 3, 4):
        assert out[i] == (False, i)
    assert out[5] == (False, 5) and out[6] == (True, 5)
    # jaccard join: unshingleable docs simply produce no pairs
    pairs = {(r.id_a, r.id_b)
             for r in DD.ngram_jaccard_pairs(docs, "text", "doc_id",
                                             min_jaccard=0.9).collect()}
    assert pairs == {(5, 6)}
    # banded simhash handles NULL text (NULL signature) without throwing
    sim = {r.doc_id: r.is_dup
           for r in DD.simhash_banded_dedup(docs, "text", "doc_id").collect()}
    assert sim[6] is True


def test_text_stats_on_null_and_empty(spark):
    docs = _corpus(spark, [(1, None), (2, ""), (3, "hello world")])
    stats = {r.doc_id: r for r in doc_stats(docs).collect()}
    assert set(stats) == {1, 2, 3}
    assert stats[3].word_count == 2
    langs = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    assert langs[1] == "unknown" and langs[2] == "unknown"


def test_knn_on_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert knn_topk(empty, [1.0, 0.0], k=3, tiebreak="vec_id").count() == 0
    one = spark.createDataFrame([(7, [1.0, 0.0])],
                                "vec_id bigint, embedding array<double>")
    got = knn_topk(one, [1.0, 0.0], k=3, tiebreak="vec_id").collect()
    assert [r.vec_id for r in got] == [7]


def test_embedding_near_dup_single_and_empty(spark):
    one = spark.createDataFrame([(1, [0.5, -0.5])],
                                "vec_id bigint, embedding array<double>")
    r = DD.embedding_near_dup(one, "embedding", "vec_id").first()
    assert (r.is_dup, r.canonical_id) == (False, 1)
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert DD.embedding_near_dup(empty, "embedding", "vec_id").count() == 0


def test_entropy_single_word_doc_is_positive_zero(spark):
    # one distinct word -> H = 0 exactly, normalized to +0.0 (not -0.0:
    # the driver canonicalizer hashes bit patterns, and -p*ln(p) at p=1
    # produces IEEE -0.0 before the engine contract's `+ 0.0`)
    import math
    from tripgogo_vector_search_spark.plans import registry as R
    one = spark.createDataFrame([(1, "word word word")],
                                "doc_id bigint, text string")
    # drive the same expression pipeline as the registry query
    from pyspark.sql import functions as F
    c = (one.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
         .groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("n")))
    t = c.groupBy("doc_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot").cast("double")
    term = F.round(-p * F.log(p), 12).cast("decimal(24,12)")
    [row] = (c.join(t, "doc_id").select("doc_id", term.alias("term"))
             .groupBy("doc_id")
             .agg((F.round(F.sum("term").cast("double"), 6) + F.lit(0.0))
                  .alias("e")).collect())
    assert row.e == 0.0 and math.copysign(1.0, row.e) == 1.0


def test_bm25_doc_without_query_terms_absent(spark):
    # docs containing none of the query terms must not appear (score 0
    # rows would claim relevance the ranker doesn't assign)
    from tests.conftest import SF_CORRECTNESS
    from tripgogo_vector_search_spark.plans import registry as R
    out = {r.doc_id for r in
           R.QUERIES["bm25_score"](spark, SF_CORRECTNESS).collect()}
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    from pyspark.sql import functions as F
    has = {r.doc_id for r in docs.filter(
        F.col("text").rlike(r"\b(data|query|spark)\b")).collect()}
    assert out == has


def test_quartile_agg_group_of_one(spark):
    # n=1: every quartile is the single value (ceil(q*1)=1)
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W
    one = spark.createDataFrame([(7, 1, 42.5)],
                                "c_nationkey int, c_custkey int, c_acctbal double")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    r = one.select("c_nationkey", "c_acctbal",
                   F.row_number().over(w).alias("rn"),
                   F.count(F.lit(1)).over(W.partitionBy("c_nationkey"))
                   .alias("n"))
    aggs = [F.min(F.when(F.col("rn") >= F.ceil(F.lit(q) * F.col("n")),
                         F.col("c_acctbal"))).alias(f"q{int(q*100)}")
            for q in (0.25, 0.5, 0.75)]
    [row] = r.groupBy("c_nationkey").agg(*aggs).collect()
    assert (row.q25, row.q50, row.q75) == (42.5, 42.5, 42.5)


def test_dup_ngram_and_luhn_on_null_empty_and_single(spark):
    """r9 operators on broken rows: NULL text flows through the Arrow
    kernel as NULL, empty/single-word docs score 0.0, and the Luhn
    card counter treats digit-free text as zero candidates."""
    from tripgogo_vector_search_spark.functions.kernels import (
        dup_ngram_fraction_udf)
    from tripgogo_vector_search_spark.operators import corpus as CP

    rows = [(1, None), (2, ""), (3, "one"), (4, "a a a")]
    docs = _corpus(spark, rows)
    got = {r.doc_id: r.d2 for r in docs.select(
        "doc_id", F.round(dup_ngram_fraction_udf("text", 2), 6)
        .alias("d2")).collect()}
    assert got[1] is None
    assert got[2] == 0.0 and got[3] == 0.0
    assert got[4] == 1.0
    cand, valid = CP.card_counts("text")
    cc = {r.doc_id: (r.c, r.v) for r in docs.select(
        "doc_id", cand.alias("c"), valid.alias("v")).collect()}
    for i in (2, 3, 4):
        assert cc[i] == (0, 0)


def test_compaction_on_empty_evict_and_full_evict(spark, tmp_path):
    """Index compaction extremes: nothing retired is a no-op; an evict
    set covering EVERY row of EVERY partition is refused (that is store
    deletion, not compaction — an empty current-corpus frame is usually
    an upstream failure) and the store is left byte-readable with all
    rows intact."""
    import os

    import pytest

    from tripgogo_vector_search_spark.operators.index_maintenance import (
        compact_partitioned_store)

    path = str(tmp_path / "store")
    (spark.range(100)
     .select(F.col("id").alias("doc_id"),
             F.floor(F.col("id") / 32).alias("id_range"))
     .write.mode("overwrite").partitionBy("id_range").parquet(path))
    # no-op: everything current
    stats = compact_partitioned_store(
        spark, path, spark.range(100).select(F.col("id").alias("doc_id")))
    assert stats["evicted_rows"] == 0
    # full evict: zero current ids -> refused loudly, store untouched
    with pytest.raises(ValueError, match="refusing to compact"):
        compact_partitioned_store(
            spark, path,
            spark.range(0).select(F.col("id").alias("doc_id")))
    assert len([d for d in os.listdir(path)
                if d.startswith("id_range=")]) == 4
    assert spark.read.parquet(path).count() == 100


def test_paragraph_family_on_degenerate_corpora(spark):
    """r10 paragraph hygiene: empty corpus, NULL text, and all-short
    corpora flow through dup_paragraph_stats / split_contamination
    with every document accounted for and zero false duplicates.
    20 identical words make exactly one full paragraph, so two docs
    sharing it are mutual dups; a 19-word doc has zero paragraphs but
    still counts in n_docs."""
    from tripgogo_vector_search_spark.operators import corpus as CP

    def mk(rows):
        return spark.createDataFrame(
            rows, "doc_id bigint, text string, source string")

    empty = mk([])
    assert CP.dup_paragraph_stats(empty).count() == 0
    assert CP.split_contamination(empty).count() == 0

    para = " ".join(["w%d" % i for i in range(20)])
    docs = mk([(1, None, "a"),            # NULL text: 0 paras
               (2, "", "a"),              # empty: 0 paras
               (3, "only three words", "a"),   # short: 0 paras
               (4, para, "a"),            # dup pair across docs
               (5, para, "b"),
               (6, " ".join(["u%d" % i for i in range(25)]), "b")])
    out = {r.source: r for r in CP.dup_paragraph_stats(docs).collect()}
    assert out["a"].n_docs == 4 and out["a"].n_paras == 1
    assert out["a"].dup_paras == 1 and out["a"].dup_doc_fraction == 0.25
    # source b: doc 5 dup, doc 6's single unique para is not
    assert out["b"].n_docs == 2 and out["b"].n_paras == 2
    assert out["b"].dup_paras == 1 and out["b"].dup_para_fraction == 0.5
    # a source with ONLY short docs reports NULL para fraction, 0 docs
    shorts = mk([(7, "tiny", "c"), (8, None, "c")])
    row = CP.dup_paragraph_stats(shorts).collect()[0]
    assert row.n_paras == 0 and row.dup_para_fraction is None
    assert row.dup_doc_fraction == 0.0
    # short docs must NOT co-locate or collide via the NULL sentinel:
    # two NULL-text docs are not each other's duplicates
    assert row.dup_paras == 0

    # split audit on a train-only corpus: no eval rows, empty result
    import hashlib
    ids_train = [i for i in range(200)
                 if hashlib.md5(str(i).encode()).hexdigest()[0]
                 not in "cdef"][:2]
    only_train = mk([(i, para, "a") for i in ids_train])
    assert CP.split_contamination(only_train).count() == 0


def test_dsir_on_degenerate_corpora(spark):
    """r10 DSIR: empty corpus, no-target corpus, and gram-less docs
    flow through; a raw doc identical to the target slice scores
    positive, an alien doc scores negative, and a 1-word doc keeps
    weight exactly 0 (no grams -> empty product)."""
    from tripgogo_vector_search_spark.operators import corpus as CP

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    tgt = (F.col("doc_id") % 2 == 0)
    assert CP.dsir_importance_weights(mk([]), tgt).count() == 0
    # no target rows: smoothing keeps every delta finite, no crash
    only_raw = mk([(1, "a b c"), (3, "x y z")])
    rows = {r.doc_id: r for r in
            CP.dsir_importance_weights(only_raw, tgt).collect()}
    assert set(rows) == {1, 3}
    # target-lookalike vs alien vocabulary, plus a gram-less doc
    docs = mk([(0, "the cat sat on the mat"),
               (2, "the cat sat on the hat"),
               (1, "the cat sat on the mat"),      # = target: positive
               (3, "zq xw vv kk jj pp qq rr"),     # alien: negative
               (5, "single")])                     # 0 grams: weight 0
    out = {r.doc_id: r for r in
           CP.dsir_importance_weights(docs, tgt).collect()}
    assert out[1].selected and out[1].log_weight > 0
    assert not out[3].selected and out[3].log_weight < 0
    assert out[5].n_grams == 0 and out[5].log_weight == 0.0
    assert not out[5].selected


def test_dup_paragraph_removal_semantics(spark):
    """r10 removal transform: NULL text stays NULL, short docs pass
    through verbatim, the globally-first occurrence (smallest
    (doc_id, seg_idx)) survives — including in-document repeats — and
    a fully-duplicated doc with no tail cleans to the empty string."""
    from tripgogo_vector_search_spark.operators import corpus as CP

    para_a = " ".join("a%d" % i for i in range(20))
    para_b = " ".join("b%d" % i for i in range(20))
    para_c = " ".join("c%d" % i for i in range(20))
    docs = spark.createDataFrame(
        [(1, None),
         (2, "short doc"),
         (3, para_a + " " + para_b + " tail words"),   # first owner of a, b
         (4, para_b),                                   # dup of b: removed -> ""
         (5, para_c + " " + para_c),                    # in-doc repeat: 2nd removed
         (6, para_a),                                   # doc 3 owns a: removed
         ], "doc_id bigint, text string")
    out = {r.doc_id: r for r in CP.dup_paragraph_removal(docs).collect()}
    assert out[1].clean_text is None and out[1].n_paras == 0
    assert out[2].clean_text == "short doc" and out[2].n_removed == 0
    assert out[3].clean_text == para_a + " " + para_b + " tail words"
    assert out[3].n_removed == 0
    assert out[4].clean_text == "" and out[4].n_removed == 1
    assert out[5].clean_text == para_c and out[5].n_removed == 1
    assert out[6].clean_text == "" and out[6].n_removed == 1
    # idempotency: removing from the cleaned corpus removes nothing
    cleaned = CP.dup_paragraph_removal(
        spark.createDataFrame(
            [(r.doc_id, r.clean_text) for r in out.values()],
            "doc_id bigint, text string"))
    assert {r.n_removed for r in cleaned.collect()} == {0}


def test_multimodal_magic_sniff_degenerates(spark):
    """r10 container sniffing: NULL text (unreadable object) sniffs as
    unknown; an empty payload still classifies from its magic alone; a
    payload whose TEXT begins with a magic string classifies by the
    real (prepended) magic, not the content echo."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        sniff_magic, synth_media_corpus)

    docs = spark.createDataFrame(
        [(0, None),          # PNG slot but NULL text -> NULL content
         (3, ""),            # PNG magic + empty payload
         (4, "RIFF not really"),   # JPEG slot, text echoes RIFF
         (5, "plain words")],      # RIFF slot
        "doc_id bigint, text string")
    m = synth_media_corpus(docs)
    out = {r.media_id: r.mime for r in
           m.select("media_id",
                    sniff_magic(F.col("content")).alias("mime")).collect()}
    assert out[0] == "unknown"
    assert out[3] == "image/png"
    assert out[4] == "image/jpeg"
    assert out[5] == "audio/wav"


def test_lm_cross_entropy_on_degenerate_corpora(spark):
    """CCNet scoring (r11): empty corpus -> empty output; a corpus
    with NO reference docs still scores (uniform add-1 LM); NULL and
    gram-less docs score NULL, never 0; reference docs are excluded."""
    from tripgogo_vector_search_spark.operators.corpus import (
        lm_cross_entropy)

    empty = _corpus(spark, [])
    assert lm_cross_entropy(empty, F.col("doc_id") % 7 == 0).count() == 0
    rows = [(1, None), (2, ""), (3, "one"), (4, "two words here ok"),
            (7, "a reference document with several words")]
    out = {r.doc_id: (r.n_grams, r.cross_entropy) for r in
           lm_cross_entropy(_corpus(spark, rows),
                            F.col("doc_id") % 7 == 0).collect()}
    assert set(out) == {1, 2, 3, 4}  # doc 7 is the reference slice
    for i in (1, 2, 3):
        assert out[i] == (0, None), (i, out[i])
    assert out[4][0] == 3 and out[4][1] is not None and out[4][1] > 0
    # no reference docs at all: add-1 smoothing alone defines the LM
    out2 = {r.doc_id: r.cross_entropy for r in
            lm_cross_entropy(_corpus(spark, rows),
                             F.lit(False)).collect()}
    assert out2[7] is not None and out2[7] > 0


def test_pq_on_tiny_and_empty_corpora(spark):
    """PQ (r11): a corpus smaller than the codebook seed count still
    trains (fewer centroids) and encodes every vector; an empty
    corpus encodes to an empty frame — no division by zero, no crash."""
    import tripgogo_vector_search_spark.plans.registry as R

    def encode(emb):
        x = (emb.select(
            "vec_id", "embedding",
            F.explode(F.array(*[F.lit(m) for m in range(R._PQ_M)]))
            .alias("m"))
            .select("vec_id", "m",
                    F.slice("embedding", F.col("m") * R._PQ_SUB + 1,
                            R._PQ_SUB).alias("xs")))
        c0 = (x.filter(F.col("vec_id") < R._PQ_K)
              .select("m", F.col("vec_id").alias("cid"),
                      F.col("xs").alias("cvec")))
        a1 = R._pq_assign(x, c0)
        return a1

    dim = R._PQ_M * R._PQ_SUB
    tiny = spark.createDataFrame(
        [(i, [float(i + d) for d in range(dim)]) for i in range(3)],
        "vec_id bigint, embedding array<double>")
    out = encode(tiny).collect()
    assert len(out) == 3 * R._PQ_M
    assert {r["cid"] for r in out} <= {0, 1, 2}
    empty = spark.createDataFrame([], "vec_id bigint, "
                                  "embedding array<double>")
    assert encode(empty).count() == 0


def test_gopher_gate_on_degenerate_text(spark):
    """Gopher battery (r11): NULL text -> NULL flags (unknown, not
    failed); empty text and single words get definite verdicts."""
    import tripgogo_vector_search_spark.functions.text as TX

    rows = [(1, None), (2, ""), (3, "the"), (4, "#### ... ####")]
    flags = TX.gopher_rules(F.col("text"))
    out = {r.doc_id: tuple(r)[1:] for r in
           _corpus(spark, rows).select(
               "doc_id", *[c.alias(k) for k, c in flags.items()])
           .collect()}
    assert all(v is None for v in out[1])
    assert out[2][0] is False          # '' -> 1 empty word, count fails
    assert out[3][3] is False          # one stop word < 2
    assert out[4][4] is False          # symbol soup fails the ratio


def test_session_window_on_empty_and_single_event(spark):
    """Native session windows (r11): empty input -> empty output; one
    event -> one session spanning [ts, ts+gap)."""
    ev = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", 10.0)],
        "user_id bigint, ts string, value double").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"),
            "value")
    g = (ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
         .agg(F.count(F.lit(1)).alias("n")))
    row = g.collect()[0]
    assert row["n"] == 1
    assert str(row["session_window"]["end"]
               - row["session_window"]["start"]) == "0:30:00"
    assert g.filter(F.lit(False)).count() == 0


def test_png_chain_on_degenerate_text(spark):
    """PNG synthesis/decode (r12): NULL text -> NULL content -> NULL
    stats; text too short for one pixel row -> structurally sound
    height-0 file the decoder rejects to NULLs; a one-pixel-row text
    decodes exactly."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        decode_png_stats, parse_png, synth_png_corpus)

    rows = [(0, None), (7, ""), (14, "xy"), (21, "abcdefghi")]
    # ids chosen % 7 == 0 -> w = 3, one row needs 9 bytes
    m = synth_png_corpus(_corpus(spark, rows))
    out = {r["media_id"]: tuple(r)[1:]
           for r in decode_png_stats(m).collect()}
    assert out[0] == (None,) * 6       # NULL text -> NULL content
    assert out[7] == (None,) * 6       # empty -> height 0 -> rejected
    assert out[14] == (None,) * 6      # 2 bytes < one 9-byte row
    w9, h9, n9, mr, mg, mb = out[21]
    assert (w9, h9, n9) == (3, 1, 3)
    raw = b"abcdefghi"
    assert (mr, mg, mb) == tuple(
        round(sum(raw[c::3]) / 3, 6) for c in range(3))
    # and the rejected files are still structurally honest containers
    blob = {r["media_id"]: r["content"]
            for r in m.collect()}[7]
    assert parse_png(bytes(blob)) is None and bytes(blob)[:4] == b"\x89PNG"


def test_c4_gate_on_degenerate_text(spark):
    """C4 battery (r12): NULL text -> NULL flags; empty text -> zero
    retained sentences; a page of one long terminal sentence fails
    only the 5-sentence minimum."""
    import tripgogo_vector_search_spark.functions.text as TX

    rows = [(1, None), (2, ""), (3, "this is one full sentence."),
            (4, "lorem ipsum filler. " * 6)]
    flags = TX.c4_rules(F.col("text"))
    out = {r.doc_id: tuple(r)[1:] for r in
           _corpus(spark, rows).select(
               "doc_id",
               TX.c4_sentences_kept(F.col("text")).alias("nk"),
               *[c.alias(k) for k, c in flags.items()]).collect()}
    assert all(v is None for v in out[1])
    assert out[2][0] == 0 and out[2][1] is False
    assert out[3][0] == 1 and out[3][1] is False   # 1 < 5 sentences
    assert out[4][2] is False                      # lorem ipsum page


def test_subword_tokenizer_on_degenerate_inputs(spark):
    """Learned tokenizer (r12): empty vocab still tokenizes (single
    chars are implicit vocabulary); NULL text -> NULL stats; empty
    and whitespace-only text -> zero words, NULL fertility."""
    from tripgogo_vector_search_spark.operators.tokenize import (
        subword_tokenize, tokenize_word)

    assert tokenize_word("", set()) == 0
    assert tokenize_word("abc", set()) == 3
    assert tokenize_word("abcd", {"abcd"}) == 1
    # greedy from the left: no 2-4-gram matches at pos 0 -> 'a' (1),
    # then 'abcd' matches whole -> 2 tokens (not 'ab'+'cd'+'a')
    assert tokenize_word("aabcd", {"abcd", "ab"}) == 2
    rows = [(1, None), (2, ""), (3, "   "), (4, "ab ab")]
    out = {r["doc_id"]: (r["n_words"], r["n_tokens"], r["fertility"])
           for r in subword_tokenize(_corpus(spark, rows),
                                     ["ab"]).collect()}
    assert out[1] == (None, None, None)
    assert out[2] == (0, 0, None)
    assert out[3] == (0, 0, None)
    assert out[4] == (2, 2, 1.0)


def test_semdedup_singleton_cells_keep_everything(spark):
    """SemDeDup tournament (r12): a corpus where every vector sits
    alone in its cell prunes nothing (no pairs exist)."""
    # exercised end-to-end at the fixture in test_round12_props; here
    # the pure tournament property on a tiny frame via the same exprs
    from tripgogo_vector_search_spark.functions import vector as V

    rows = [(0, [1.0] + [0.0] * 3), (1, [0.0, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    d01 = df.crossJoin(df.selectExpr("vec_id AS r_id",
                                     "embedding AS r_emb")) \
        .filter("vec_id < r_id") \
        .select(F.round(V.cosine_distance(F.col("embedding"),
                                          F.col("r_emb")), 6).alias("d")) \
        .collect()[0]["d"]
    assert d01 == 1.0  # orthogonal -> far above any dup threshold


def test_gif_chain_on_degenerate_text(spark):
    """GIF synthesis/decode (r13): NULL text -> NULL content -> NULL
    stats; text too short for one pixel row -> structurally sound
    height-0 file the decoder rejects to NULLs; a one-pixel-row text
    decodes exactly (palette channels are affine maps of the index)."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        _GIF_PALETTE, decode_gif_stats, parse_gif, synth_gif_corpus)

    rows = [(0, None), (6, ""), (12, "x"), (18, "qr")]
    # ids chosen % 6 == 0 -> w = 2, one row needs 2 bytes
    m = synth_gif_corpus(_corpus(spark, rows))
    out = {r["media_id"]: tuple(r)[1:]
           for r in decode_gif_stats(m).collect()}
    assert out[0] == (None,) * 7       # NULL text -> NULL content
    assert out[6] == (None,) * 7       # empty -> height 0 -> rejected
    assert out[12] == (None,) * 7      # 1 byte < one 2-byte row
    w2, h2, n2, mi, mr, mg, mb = out[18]
    assert (w2, h2, n2) == (2, 1, 2)
    raw = b"qr"
    assert mi == round(sum(raw) / 2, 6)
    assert (mr, mg, mb) == tuple(
        round(sum(_GIF_PALETTE[u][c] for u in raw) / 2, 6)
        for c in range(3))
    # and the rejected files are still structurally honest containers
    blobs = {r["media_id"]: r["content"] for r in m.collect()}
    assert parse_gif(bytes(blobs[6])) is None
    assert bytes(blobs[6])[:6] == b"GIF89a"
    assert bytes(blobs[6])[-1:] == b"\x3b"

def test_gif_synthesis_cap_arm_matches_oracle_formula(spark):
    """A document LONGER than the synthesis pixel cap must produce a
    GIF whose height is the ORACLE's formula ``least(dlen // w,
    cap // w)`` with the cap arm winning — the arm no fixture row
    reached while the cap constant was silently shadowed to 2^24
    (VERDICT r14 "What's wrong #1"): a 5000-byte doc at w=2 used to
    synthesize 2500 rows while all four GIF oracles pinned 2048."""
    from tripgogo_vector_search_spark.operators import multimodal as M

    # the synthesis cap is the value the four GIF oracle literals are
    # derived from at registration; pin it against re-shadowing
    assert M._GIF_SYNTH_MAX_PIXELS == 4096
    assert M._GIF_DECODE_MAX_PIXELS == 1 << 24
    text = "ab" * 2500                       # dlen = 5000 > 4096
    rows = [(0, text)]                       # id % 6 == 0 -> w = 2
    m = M.synth_gif_corpus(_corpus(spark, rows))
    got = M.decode_gif_stats(m).first()
    w, dlen = 2, 5000
    h_oracle = min(dlen // w, M._GIF_SYNTH_MAX_PIXELS // w)
    assert h_oracle == 2048                  # the cap arm, not dlen//w
    assert (got.width, got.height, got.n_pixels) == (w, h_oracle,
                                                     w * h_oracle)
    raw = text.encode()[:w * h_oracle]
    assert got.mean_idx == round(sum(raw) / len(raw), 6)
    # the plain-Python spec decoder agrees on the capped geometry
    blob = bytes(m.first().content)
    assert M.parse_gif(blob)[:3] == (w, h_oracle, w * h_oracle)
