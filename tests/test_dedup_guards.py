"""Worst-case guards for the dedup family (VERDICT r1 items 3-4): one hot
shingle / band key / bucket must never expand to a quadratic single-task
array, and the guards must not change output on well-behaved corpora.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from tripgogo_vector_search_spark.operators import dedup as DD

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# ngram_jaccard df_cap
# ---------------------------------------------------------------------------

def test_ngram_jaccard_stop_shingle_capped(spark):
    # 40 docs all sharing one boilerplate shingle ("the same header"),
    # plus per-doc unique tails. Uncapped, the hot shingle's posting list
    # expands to 40*39/2 pairs; with df_cap below 40 it is dropped from
    # the index and only genuinely-overlapping docs pair.
    rows = [(i, f"the same header unique{i} tail{i} word{i}")
            for i in range(40)]
    # docs 100/101 share their whole tail -> survive the cap via their
    # non-stop shingles
    rows += [(100, "the same header shared tail text here"),
             (101, "the same header shared tail text here")]
    df = _docs(spark, rows)

    # base path (min_jaccard=0 -> full inverted index): the stop-shingle
    # is dropped from the intersection but kept in the union denominator,
    # so the capped score is the documented 4/6 underestimation, not 1.0
    capped = (DD.ngram_jaccard_pairs(df, "text", "doc_id", shingle_n=3,
                                     min_jaccard=0.0, df_cap=10)
              .filter(F.col("jaccard") >= 0.5))
    got = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
    assert set(got) == {(100, 101)}
    assert got[(100, 101)] == pytest.approx(4 / 6, abs=1e-6)

    # prefix path (min_jaccard>0): the cap only prunes candidate
    # generation; verification intersects the FULL shingle sets, so the
    # identical pair scores an exact 1.0 (found via its rare shingles,
    # which outrank the boilerplate in the rarest-first prefix order)
    pref = DD.ngram_jaccard_pairs(df, "text", "doc_id", shingle_n=3,
                                  min_jaccard=0.5, df_cap=10)
    pg = {(r.id_a, r.id_b): r.jaccard for r in pref.collect()}
    assert set(pg) == {(100, 101)}
    assert pg[(100, 101)] == 1.0


def test_ngram_jaccard_prefix_matches_bruteforce(spark):
    # Exactness of the prefix-filter path: on a real corpus it must equal
    # the full inverted-index join post-filtered to the same threshold.
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text"))
    for t in (0.3, 0.6, 0.9):
        pref = DD.ngram_jaccard_pairs(docs, "text", "doc_id", min_jaccard=t)
        base = (DD.ngram_jaccard_pairs(docs, "text", "doc_id",
                                       min_jaccard=0.0)
                .filter(F.col("jaccard") >= t))
        rp = sorted(map(tuple, pref.collect()))
        rb = sorted(map(tuple, base.collect()))
        assert rp == rb, f"threshold {t}: prefix path diverges"
    assert len(rp) > 0 or t == 0.9  # corpus has pairs at low thresholds


def test_ngram_jaccard_prefix_oversized_posting_dropped(spark):
    # All-boilerplate corpus: every shingle is in every doc, so every
    # prefix posting list has 30 entries. df_cap=10 drops them all — the
    # guard trades recall for a bounded task, never a quadratic blowup.
    rows = [(i, "identical boilerplate document body text") for i in range(30)]
    df = _docs(spark, rows)
    out = DD.ngram_jaccard_pairs(df, "text", "doc_id", shingle_n=3,
                                 min_jaccard=0.5, df_cap=10)
    assert out.count() == 0


def test_containment_cap_parity_on_hot_vocab(spark):
    """VERDICT r3 #4: the containment_join oracle mirrors the Spark
    df_cap as a `count(*) OVER (PARTITION BY shingle) <= cap` filter.
    Spark caps by posting-list SIZE, the oracle by window document
    frequency — prove the two definitions agree on a corpus where a
    shingle actually EXCEEDS the cap (the class the fixture-scale gate
    never exercises: fixture vocab is too cold to hit df=1024)."""
    import duckdb
    import pandas as pd

    # 20 docs share a boilerplate head (df=20 > cap=10); two docs are
    # supersets of a third so real containment pairs survive the cap.
    rows = [(i, f"the same header unique{i} tail{i} word{i}")
            for i in range(20)]
    rows += [(100, "alpha beta gamma delta epsilon"),
             (101, "alpha beta gamma delta epsilon zeta eta theta"),
             (102, "alpha beta gamma delta epsilon zeta eta theta more")]
    df = _docs(spark, rows)
    got = sorted(
        tuple(r) for r in DD.containment_pairs(
            df, "text", "doc_id", shingle_n=3, min_containment=0.8,
            df_cap=10, hash_shingle_key=False).collect())

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    from tripgogo_vector_search_spark.plans.oracle_helpers import (
        sql_shingles, sql_words)
    sql = f"""
      WITH w AS (SELECT doc_id, {sql_words('text')} AS ws FROM documents),
      sh AS (SELECT doc_id, list_distinct({sql_shingles('ws', 3)}) AS sh
             FROM w),
      nz AS (SELECT doc_id, sh, len(sh) AS n_sh FROM sh WHERE len(sh) > 0),
      inv0 AS (SELECT doc_id, n_sh, unnest(sh) AS shingle FROM nz),
      inv AS (SELECT doc_id, n_sh, shingle FROM (
                SELECT doc_id, n_sh, shingle,
                       count(*) OVER (PARTITION BY shingle) AS dfreq
                FROM inv0) WHERE dfreq <= 10),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a,
                       b.n_sh AS n_b, count(*) AS inter
                FROM inv a JOIN inv b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2, 3, 4)
      SELECT id_a, id_b, round(inter::DOUBLE / n_a, 6) AS cont_a_in_b,
             round(inter::DOUBLE / n_b, 6) AS cont_b_in_a
      FROM inter
      WHERE round(inter::DOUBLE / n_a, 6) >= 0.8
         OR round(inter::DOUBLE / n_b, 6) >= 0.8"""
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    con.close()
    assert got == want
    assert len(got) >= 2  # the cap must not have killed the real pairs


def test_ngram_jaccard_cap_above_max_df_is_identity(spark):
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text"))
    a = DD.ngram_jaccard_pairs(docs, "text", "doc_id", min_jaccard=0.4,
                               df_cap=1024)
    b = DD.ngram_jaccard_pairs(docs, "text", "doc_id", min_jaccard=0.4,
                               df_cap=10**9)
    ra = sorted((r.id_a, r.id_b, r.jaccard) for r in a.collect())
    rb = sorted((r.id_a, r.id_b, r.jaccard) for r in b.collect())
    assert ra == rb and len(ra) > 0


# ---------------------------------------------------------------------------
# minhash star-linking == pair expansion under the min-aggregate
# ---------------------------------------------------------------------------

def test_minhash_star_linking_matches_bruteforce(spark):
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text"))
    got = {r.doc_id: (r.is_dup, r.canonical_id)
           for r in DD.minhash_lsh_dedup(docs, "text", "doc_id").collect()}

    # brute force: full collision sets from the band index
    bands = DD.minhash_bands(docs, "text", "doc_id").collect()
    by_key: dict[str, list[int]] = {}
    for r in bands:
        by_key.setdefault(r.band_key, []).append(r.doc_id)
    collide: dict[int, set[int]] = {}
    for ids in by_key.values():
        for a in ids:
            collide.setdefault(a, set()).update(ids)
    for r in docs.select("doc_id").collect():
        i = r.doc_id
        below = {x for x in collide.get(i, set()) if x < i}
        want = (True, min(below)) if below else (False, i)
        assert got[i] == want, f"doc {i}: got {got[i]}, want {want}"


def test_minhash_components_star_edges_same_components(spark):
    # Star edges (everyone -> bucket min) must yield the same connected
    # components as the full per-bucket clique: compare against a
    # brute-force union-find over the complete collision sets.
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text"))
    got = {r.doc_id: r.component_id
           for r in DD.minhash_components(docs, "text", "doc_id").collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    by_key: dict[str, list[int]] = {}
    for r in DD.minhash_bands(docs, "text", "doc_id").collect():
        by_key.setdefault(r.band_key, []).append(r.doc_id)
    for ids in by_key.values():
        for x in ids[1:]:
            union(ids[0], x)
    n_dup_groups = 0
    for r in docs.select("doc_id").collect():
        i = r.doc_id
        assert got[i] == find(i), f"doc {i}: got {got[i]}, want {find(i)}"
        n_dup_groups += got[i] != i
    assert n_dup_groups > 0  # the corpus does contain near-dups


# ---------------------------------------------------------------------------
# simhash banded posting_cap
# ---------------------------------------------------------------------------

def test_simhash_banded_oversized_bucket_still_groups_identical(spark):
    # 30 byte-identical docs -> identical signatures -> every band bucket
    # has 30 entries. posting_cap=8 forces ALL buckets onto the oversized
    # path, which must still star-link identical signatures.
    rows = [(i, "identical boilerplate document body text") for i in range(30)]
    rows += [(90, "a completely unrelated piece of writing")]
    df = _docs(spark, rows)
    out = {r.doc_id: (r.is_dup, r.canonical_id)
           for r in DD.simhash_banded_dedup(df, "text", "doc_id",
                                            posting_cap=8).collect()}
    assert out[0] == (False, 0)
    for i in range(1, 30):
        assert out[i] == (True, 0)
    assert out[90] == (False, 90)


def test_simhash_banded_cap_above_bucket_size_is_identity(spark):
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text"))
    a = DD.simhash_banded_dedup(docs, "text", "doc_id", posting_cap=1024)
    b = DD.simhash_banded_dedup(docs, "text", "doc_id", posting_cap=10**9)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# embedding_near_dup adaptive prefix
# ---------------------------------------------------------------------------

def test_adaptive_prefix_bits_schedule():
    # small corpora resolve to the floor (oracle parity at every test SF)
    assert DD.adaptive_prefix_bits(50, dim=64) == 8
    assert DD.adaptive_prefix_bits(5_000, dim=64) == 8
    # growth: expected occupancy n / 2^bits stays <= target_bucket
    for n in (10**6, 10**8, 10**10):
        bits = DD.adaptive_prefix_bits(n, dim=64)
        assert n / 2 ** bits <= 64
        assert bits == math.ceil(math.log2(n / 64))
    # never exceeds the vector dimension
    assert DD.adaptive_prefix_bits(10**12, dim=16) == 16


def test_embedding_near_dup_adaptive_equals_fixed_at_test_sf(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    auto = DD.embedding_near_dup(emb, "embedding", "vec_id", prefix_bits=None)
    fixed = DD.embedding_near_dup(emb, "embedding", "vec_id", prefix_bits=8)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, fixed.collect()))


def test_embedding_near_dup_recall_on_scaled_copies(spark):
    # Positive scaling preserves every sign and cosine==1, so recall must
    # be exact regardless of prefix width — the operator's contract is
    # near-*identical* vectors.
    import numpy as np
    rng = np.random.RandomState(7)
    base = rng.randn(40, 16).astype(float)
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    rows += [(100 + i, [float(x) * 2.5 for x in base[i]]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r.vec_id: (r.is_dup, r.canonical_id)
           for r in DD.embedding_near_dup(emb, "embedding", "vec_id",
                                          prefix_bits=12,
                                          threshold=0.999).collect()}
    for i in range(10):
        assert out[100 + i] == (True, i)
    dup_flags = [out[i][0] for i in range(40)]
    assert not any(dup_flags)  # random gaussians are not near-dups


def test_corpus_stats_footer_only_and_cached(tmp_path):
    # (n, dim) must come from the parquet footer + one-row read — no Spark.
    from tripgogo_vector_search_spark.plans import registry as R
    n, dim = R.corpus_stats(SF, "embeddings", "embedding")
    import pyarrow.parquet as pq
    f = pq.ParquetFile(f"{SF}/embeddings.parquet")
    assert n == f.metadata.num_rows
    head = next(f.iter_batches(batch_size=1, columns=["embedding"]))
    assert dim == len(head.column(0)[0].as_py())
    # second call is served from the in-process memo (same object)
    assert R.corpus_stats(SF, "embeddings", "embedding") is \
        R._CORPUS_STATS_MEMO[(os.path.abspath(SF), "embeddings", "embedding")]


def test_embedding_near_dup_query_runs_no_stats_jobs(spark, monkeypatch):
    # Regression for the r2 perf flaw: building the registry query must not
    # fire driver-side count()/first() jobs — the adaptive width now comes
    # from footer stats. Patch the job-triggering methods to explode if hit.
    from pyspark.sql import DataFrame
    from tripgogo_vector_search_spark.plans import registry as R

    def _boom(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver-side job during plan construction")

    monkeypatch.setattr(DataFrame, "count", _boom)
    monkeypatch.setattr(DataFrame, "first", _boom)
    df = R.QUERIES["embedding_near_dup"](spark, SF)  # construction only
    assert "is_dup" in df.columns


def test_simhash_banded_oversized_bucket_fallback_recall(spark, monkeypatch):
    """Pin EXACTLY which pairs the >posting_cap exact-signature collapse
    sacrifices (VERDICT r2 item 6). Degenerate corpus via injected
    signatures (posting_cap=4):

    - ids 0-5: identical signature S0 -> every band bucket oversized;
      the star-edge fallback must still link all six (identical sigs).
    - id 10: hamming distance 1 from S0, shares 3 of 4 band keys — but
      only through oversized buckets, so its true near-dup pairs with
      ids 0-5 are the documented sacrifice: it must come back is_dup=False.
    - ids 20,21: hamming-1 pair in small buckets -> found normally.
    """
    S0 = "0" * 32
    S1 = "1" + "0" * 31          # hamming 1 from S0, bands 2-4 shared
    T0 = "1" * 32
    T1 = "1" * 31 + "0"          # hamming 1 from T0
    rows = [(i, S0) for i in range(6)] + [(10, S1), (20, T0), (21, T1)]
    sigs = spark.createDataFrame(rows, "doc_id bigint, simhash string")
    monkeypatch.setattr(DD, "simhash_signatures", lambda df, t, i: sigs)
    corpus = spark.createDataFrame([(r[0], "x") for r in rows],
                                   "doc_id bigint, text string")
    out = {r.doc_id: (r.is_dup, r.canonical_id)
           for r in DD.simhash_banded_dedup(corpus, "text", "doc_id",
                                            radius=3, posting_cap=4).collect()}
    # identical-signature group survives the collapse intact
    assert out[0] == (False, 0)
    for i in range(1, 6):
        assert out[i] == (True, 0)
    # the sacrificed cross-signature pair: within radius, lost to the cap
    assert out[10] == (False, 10)
    # control pair in small buckets is unaffected
    assert out[20] == (False, 20)
    assert out[21] == (True, 20)
    # and with an adequate cap the sacrificed pair IS recovered
    monkeypatch.setattr(DD, "simhash_signatures", lambda df, t, i: sigs)
    full = {r.doc_id: (r.is_dup, r.canonical_id)
            for r in DD.simhash_banded_dedup(corpus, "text", "doc_id",
                                             radius=3,
                                             posting_cap=1024).collect()}
    assert full[10] == (True, 0)


def test_string_keyed_exact_mode_matches_hashed(spark):
    # ADVICE r2: hash_shingle_key=False must be a real, selectable exact
    # mode — same plan, string shuffle key — with identical output here.
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    h = DD.ngram_jaccard_pairs(docs, "text", "doc_id")
    s = DD.ngram_jaccard_pairs(docs, "text", "doc_id",
                               hash_shingle_key=False)
    assert sorted(map(tuple, h.collect())) == sorted(map(tuple, s.collect()))
    hc = DD.containment_pairs(docs, "text", "doc_id", min_containment=0.5)
    sc = DD.containment_pairs(docs, "text", "doc_id", min_containment=0.5,
                              hash_shingle_key=False)
    assert sorted(map(tuple, hc.collect())) == sorted(map(tuple, sc.collect()))


def test_connected_components_raises_on_nonconvergence(spark):
    """VERDICT r8 "What's wrong #2": a component whose diameter exceeds
    max_iter must RAISE, not silently return partially-propagated
    labels. A path graph (template family evolving one doc per step) is
    the canonical offender: min-label propagation moves one hop per
    round, so diameter 11 cannot converge in 3 rounds."""
    spark.catalog.clearCache()  # isolate from other tests' fixture caches
    edges = spark.createDataFrame([(i, i + 1) for i in range(11)],
                                  "a bigint, b bigint")
    nodes = spark.createDataFrame([(i,) for i in range(12)],
                                  "doc_id bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.connected_components(edges, nodes, "doc_id", max_iter=3)
    # the raise path must not leak the loop's caches either
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty()
    # the same graph converges with the default budget: one component
    out = DD.connected_components(edges, nodes, "doc_id")
    assert {r["component_id"] for r in out.collect()} == {0}


def test_connected_components_log_rounds_on_deep_chain(spark):
    """r9 pointer jumping: a diameter-200 path graph converges within
    the DEFAULT round budget (max_iter=25) — pure hash-min moves one
    hop per round and would need 200; path doubling needs ~log2(200).
    One component, labeled by its minimum id."""
    edges = spark.createDataFrame([(i, i + 1) for i in range(200)],
                                  "a bigint, b bigint")
    nodes = spark.createDataFrame([(i,) for i in range(201)],
                                  "doc_id bigint")
    out = DD.connected_components(edges, nodes, "doc_id")
    assert {r["component_id"] for r in out.collect()} == {0}


def test_connected_components_durable_checkpoint_mode(spark, tmp_path):
    """VERDICT r9 list #4: `durable=True` swaps every loop
    materialization for a RELIABLE .checkpoint() under the context's
    checkpoint dir — the fault-tolerant mode for long-lived clusters
    where localCheckpoint blocks die with an executor. Pins: identical
    labels to local mode, no executor blocks left stored, superseded
    rounds' checkpoint file sets deleted as the loop advances (at most
    ~two label frames' files remain), and a loud error when no
    checkpoint dir is configured."""
    import os

    sc = spark.sparkContext
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)] + [(100, 101), (101, 102)],
        "a bigint, b bigint")
    nodes = spark.createDataFrame(
        [(i,) for i in range(41)] + [(100,), (101,), (102,)],
        "doc_id bigint")
    want = {r["doc_id"]: r["component_id"] for r in
            DD.connected_components(edges, nodes, "doc_id").collect()}

    assert sc.getCheckpointDir() is None
    with pytest.raises(RuntimeError, match="setCheckpointDir"):
        DD.connected_components(edges, nodes, "doc_id", durable=True)

    jsc = sc._jsc.sc()

    def stored_ids():
        return {i.id() for i in jsc.getRDDStorageInfo()
                if i.numCachedPartitions() > 0}

    blocks_before = stored_ids()
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        out = DD.connected_components(edges, nodes, "doc_id",
                                      durable=True)
        got = {r["doc_id"]: r["component_id"] for r in out.collect()}
        assert got == want
        # durable mode stores nothing on executors...
        assert stored_ids() <= blocks_before
        # ...and superseded rounds' file sets were deleted through the
        # Hadoop FileSystem API as the loop advanced: only the final
        # label frame's files (and at most one sibling) remain
        rdd_dirs = []
        for root, dirs, files in os.walk(ckpt):
            if files and any(f.startswith("part-") for f in files):
                rdd_dirs.append(root)
        assert 0 < len(rdd_dirs) <= 2, rdd_dirs
    finally:
        # best-effort reset so later in-session users see the fixture
        # default again (localCheckpoint ignores the dir either way)
        try:
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(
                spark._jvm.scala.Option.apply(None))
        except Exception:
            pass


# ---------------------------------------------------------------------------
# semdedup cell_occupancy_guard (VERDICT r12 list #2)
# ---------------------------------------------------------------------------

def _basis_vec(i: int, dim: int = 8) -> list[float]:
    return [1.0 if j == i else 0.0 for j in range(dim)]


def _collapsed_corpus(spark, n_dup: int = 200):
    """The adversarial shape: 3 mutually-orthogonal singleton vectors
    plus `n_dup` IDENTICAL copies of a fourth (a degenerate embedding
    mode — empty/boilerplate docs collapsing to one vector). With the
    16-smallest-id seed rule, seeds 3..15 are all the collapsed vector,
    and the cid-ASC tie-break piles every copy into cell 3."""
    rows = [(i, _basis_vec(i)) for i in range(3)]
    rows += [(i, _basis_vec(5)) for i in range(3, 3 + n_dup)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    from tripgogo_vector_search_spark.operators import ann as ANN
    idx = ANN.build_ivf_index(emb, "embedding", "vec_id", n_cells=16)
    cents = (emb.filter(F.col("vec_id") < 16)
             .select(F.col("vec_id").alias("cid"),
                     F.col("embedding").alias("cvec")))
    return idx, cents


def test_semdedup_occupancy_guard_trips_on_collapsed_embeddings(spark):
    # 200 copies in one cell of an intended-16 clustering: cap =
    # max(64, 8*203//16) = 101 < 200 -> the guard must RAISE before
    # the quadratic within-cell pair join is planned.
    idx, cents = _collapsed_corpus(spark)
    with pytest.raises(RuntimeError, match="occupancy guard"):
        DD.semdedup_keep(idx, cents)


def test_semdedup_guard_override_still_correct_on_collapsed_corpus(spark):
    # An explicit cap (the operator's documented escape hatch) admits
    # the same corpus, and the verdict is still the paper's: of the
    # 200 identical vectors (pair distance 0, equal centroid distance)
    # exactly the smallest id survives; the 3 orthogonal singletons
    # (distance 1.0 > eps in their own cells anyway) all survive.
    idx, cents = _collapsed_corpus(spark)
    out = DD.semdedup_keep(idx, cents, occupancy_cap=1000)
    keep = sorted(r.vec_id for r in out.collect() if r.keep)
    assert keep == [0, 1, 2, 3]
    assert out.count() == 203


def test_cell_occupancy_guard_uses_intended_cell_count(spark):
    # Red-on-old-shape proof for the guard's own arithmetic: when the
    # corpus collapses into ONE observed cell, an observed-count cap
    # inflates to factor*total and the mega-cell passes as "balanced".
    # The guard must take the clustering's INTENDED cell count.
    cells = spark.createDataFrame([(0,)] * 500, "cid int")
    with pytest.raises(RuntimeError, match="occupancy guard"):
        DD.cell_occupancy_guard(cells, "cid", n_cells=16)
    # the observed-count fallback (which would have admitted the
    # mega-cell as "balanced") no longer exists: n_cells is
    # keyword-only and REQUIRED (ADVICE r13 low), so a caller that
    # omits it fails at the call site instead of silently getting
    # the broken arithmetic.
    with pytest.raises(TypeError, match="n_cells"):
        DD.cell_occupancy_guard(cells, "cid")


def test_cell_occupancy_guard_passes_balanced_and_reports(spark):
    cells = spark.createDataFrame(
        [(i % 16,) for i in range(480)], "cid int")
    stats = DD.cell_occupancy_guard(cells, "cid", n_cells=16)
    assert stats == {"n_cells": 16, "total": 480, "cap": 240,
                     "max_occupancy": 30, "hot": []}


def test_semdedup_split_mode_bounds_hot_cells_and_replays(spark):
    """on_hot='split' (the guard's remediation arm): the collapsed
    corpus runs WITHOUT raising, every sub-bucket stays under the cap,
    and the survivor set equals a plain-Python replay of the
    deterministic crc32 sub-bucketing — within a sub-bucket the paper's
    rule still keeps exactly one of the identical vectors (min id on
    the cdist tie), while duplicates split across sub-buckets both
    survive: the documented recall trade, same class as df_cap."""
    import math
    import zlib

    idx, cents = _collapsed_corpus(spark)
    out = DD.semdedup_keep(idx, cents, on_hot="split")
    keep = sorted(r.vec_id for r in out.collect() if r.keep)
    # replay: cell 3 holds ids 3..202 (200 rows); cap = max(64,
    # 8*203//16) = 101 -> nsplit = ceil(200/101) = 2; survivor per
    # sub-bucket = min id (identical vectors tie on cdist)
    cap = max(64, (8 * 203) // 16)
    ns = math.ceil(200 / cap)
    assert ns == 2
    buckets: dict[int, int] = {}
    for i in range(3, 203):
        b = zlib.crc32(str(i).encode()) % ns
        buckets[b] = min(buckets.get(b, i), i)
    want = sorted([0, 1, 2] + list(buckets.values()))
    assert keep == want
    assert len(keep) == 3 + ns          # the recall trade, visible
    assert out.count() == 203


def test_semdedup_split_mode_is_identity_on_balanced_cells(spark):
    """With no hot cell, split mode plans the exact same single-key
    pair join — the remediation arm must cost nothing on healthy
    corpora."""
    rows = [(i, _basis_vec(i % 8)) for i in range(32)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    from tripgogo_vector_search_spark.operators import ann as ANN
    idx = ANN.build_ivf_index(emb, "embedding", "vec_id", n_cells=16)
    cents = (emb.filter(F.col("vec_id") < 16)
             .select(F.col("vec_id").alias("cid"),
                     F.col("embedding").alias("cvec")))
    a = DD.semdedup_keep(idx, cents, on_hot="raise")
    b = DD.semdedup_keep(idx, cents, on_hot="split")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert "_sub" not in b.columns


def test_cell_occupancy_guard_report_mode_returns_hot_list(spark):
    cells = spark.createDataFrame([(0,)] * 500 + [(1,)] * 3, "cid int")
    stats = DD.cell_occupancy_guard(cells, "cid", n_cells=16,
                                    on_hot="report")
    assert stats["hot"] == [(0, 500)]
