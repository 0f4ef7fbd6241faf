"""Independent reference checks for the round-3f/g/h operators: each
query recomputed in plain Python (pandas/pyarrow/numpy — no Spark, no
DuckDB) from the same parquet and compared. Third implementation:
catches the Spark query and its SQL oracle sharing a mistake.
"""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE
from tripgogo_vector_search_spark.plans.registry import QUERIES

SF = SF_SMOKE


def _docs(*cols):
    t = pq.read_table(f"{SF}/documents.parquet", columns=list(cols))
    return list(zip(*(t.column(c).to_pylist() for c in cols)))


def test_vocab_topk_matches_python_reference(spark):
    tf = collections.Counter()
    df = collections.Counter()
    n_docs = 0
    for doc_id, text in _docs("doc_id", "text"):
        n_docs += 1
        toks = [w.lower() for w in text.split(" ")]
        tf.update(toks)
        df.update(set(toks))
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    want = {t: (c, df[t], round(math.log(n_docs / df[t]), 6))
            for t, c in ranked}
    got = {r.token: (r.tf, r.df, r.idf)
           for r in QUERIES["vocab_topk"](spark, SF).collect()}
    assert set(got) == set(want)
    for t in want:
        assert got[t][:2] == want[t][:2], t
        assert got[t][2] == pytest.approx(want[t][2], abs=2e-6), t


def test_corr_pairs_matches_numpy(spark):
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_quantity", "l_extendedprice", "l_discount"])
    cols = {c: np.round(np.array(t.column(c).to_pylist()) * 100)
            for c in ["l_quantity", "l_extendedprice", "l_discount"]}
    got = {r.pair: r.corr for r in QUERIES["corr_pairs"](spark, SF).collect()}
    for a, b in [("l_quantity", "l_extendedprice"),
                 ("l_quantity", "l_discount"),
                 ("l_extendedprice", "l_discount")]:
        want = np.corrcoef(cols[a], cols[b])[0, 1]
        assert got[f"{a}~{b}"] == pytest.approx(want, abs=2e-6), (a, b)


def test_quality_gate_median_is_exact_lower_median(spark):
    rows = QUERIES["quality_gate"](spark, SF).collect()
    # recompute per-lang scores via the engine's own quality query
    # (itself oracle- and property-checked), then the rank median in
    # plain python
    q = {r.doc_id: r.quality
         for r in QUERIES["quality_score"](spark, SF).collect()}
    langs = collections.defaultdict(list)
    for doc_id, lang in _docs("doc_id", "lang"):
        langs[lang].append((q[doc_id], doc_id))
    kept = {(r.doc_id, r.lang) for r in rows}
    for lang, vals in langs.items():
        vals.sort()
        med = vals[(len(vals) + 1) // 2 - 1][0]
        want = {(d, lang) for s, d in vals if s >= med}
        have = {k for k in kept if k[1] == lang}
        assert have == want, lang


def test_value_outlier_iqr_matches_python(spark):
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "event_type", "value"])
    by_type = collections.defaultdict(list)
    for eid, et, v in zip(*(t.column(c).to_pylist()
                            for c in ["event_id", "event_type", "value"])):
        by_type[et].append((v, eid))
    got = {r.event_type: (r.n_events, r.n_outliers, r.outlier_pct)
           for r in QUERIES["value_outlier_iqr"](spark, SF).collect()}
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        q1 = vals[math.ceil(0.25 * n) - 1][0]
        q3 = vals[math.ceil(0.75 * n) - 1][0]
        iqr = q3 - q1
        out = sum(1 for v, _ in vals
                  if v < q1 - 1.5 * iqr or v > q3 + 1.5 * iqr)
        assert got[et] == (n, out, round(out / n, 6)), et


def test_kmeans_assign_matches_numpy(spark):
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column(0).to_pylist()
    vecs = {i: np.array(v, dtype=np.float64)
            for i, v in zip(ids, t.column(1).to_pylist())}
    cents = {i: vecs[i] for i in sorted(vecs) if i < 4}

    def cos_d(a, b):
        return 1.0 - float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))

    sizes = collections.Counter()
    dsums = collections.defaultdict(float)
    for i, v in vecs.items():
        best = min(((cos_d(v, cv), cid) for cid, cv in cents.items()))
        sizes[best[1]] += 1
        dsums[best[1]] += round(best[0], 6)
    got = {r.cid: (r.n_vecs, r.mean_dist)
           for r in QUERIES["kmeans_assign"](spark, SF).collect()}
    assert set(got) == set(sizes)
    for cid in sizes:
        assert got[cid][0] == sizes[cid], cid
        assert got[cid][1] == pytest.approx(
            dsums[cid] / sizes[cid], abs=2e-6), cid


def test_ann_recall_eval_bounds_and_ground_truth(spark):
    rows = QUERIES["ann_recall_eval"](spark, SF).collect()
    assert rows, "no query points at this sf"
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vecs = {i: np.array(v, dtype=np.float64)
            for i, v in zip(t.column(0).to_pylist(),
                            t.column(1).to_pylist())}
    # r14 (VERDICT r13 list #1): the query draw is a FIXED-SIZE
    # deterministic sample — the 8 smallest ids by (md5(str(id)), id)
    # — so the brute-force ground-truth side stays O(corpus)
    import hashlib
    qids = set(sorted(
        vecs,
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:8])
    assert {r.qid for r in rows} == qids
    for r in rows:
        assert 0 <= r.matched <= 3
        assert r.recall_at_3 == pytest.approx(r.matched / 3.0, abs=1e-6)
        # every query's own vector is in both top-3 sets (distance 0,
        # and its assigned IVF cell is always probed) -> recall >= 1/3
        assert r.matched >= 1, r.qid


def test_novelty_by_source_matches_python(spark):
    first = {}
    per_doc = []
    for doc_id, text, source in sorted(_docs("doc_id", "text", "source")):
        ws = text.split(" ")
        sh = list(dict.fromkeys(
            " ".join(ws[i:i + 3]) for i in range(len(ws) - 2)))
        per_doc.append((doc_id, source, sh))
        for s in sh:
            first.setdefault(s, doc_id)
    agg = collections.defaultdict(lambda: [0, 0])
    for doc_id, source, sh in per_doc:
        for s in sh:
            agg[source][0] += 1
            agg[source][1] += first[s] == doc_id
    got = {r.source: (r.total_shingles, r.novel_shingles, r.novelty_pct)
           for r in QUERIES["novelty_by_source"](spark, SF).collect()}
    want = {src: (tot, nov, round(nov / tot, 6))
            for src, (tot, nov) in agg.items()}
    assert got == want


def test_orders_rfm_matches_pandas(spark):
    import pandas as pd
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    ref = o["o_orderdate"].max()
    g = o.groupby("o_custkey").agg(
        last_order=("o_orderdate", "max"),
        frequency=("o_orderdate", "size"),
        monetary=("o_totalprice", lambda s: float(
            sum(round(v * 100) for v in s) / 100)))
    g = g.reset_index()
    g["recency_days"] = (ref - g["last_order"]).dt.days
    g = g.sort_values(["monetary", "o_custkey"],
                      ascending=[False, True]).reset_index(drop=True)
    n = len(g)
    # ntile(4): first (n % 4) tiles get ceil(n/4) rows
    bands, tile, used = [], 1, 0
    base, rem = divmod(n, 4)
    for i in range(n):
        bands.append(tile)
        used += 1
        if used == base + (1 if tile <= rem else 0):
            tile, used = tile + 1, 0
    g["value_band"] = bands
    want = {int(r.o_custkey): (int(r.recency_days), int(r.frequency),
                               round(r.monetary, 2), int(r.value_band))
            for r in g.itertuples()}
    got = {r.c_custkey: (r.recency_days, r.frequency, r.monetary,
                         r.value_band)
           for r in QUERIES["orders_rfm"](spark, SF).collect()}
    assert got == want


def test_kmv_distinct_sketch_matches_python(spark):
    import hashlib
    by_lang = collections.defaultdict(set)
    for text, lang in _docs("text", "lang"):
        for w in text.split(" "):
            by_lang[lang].add(
                hashlib.md5(w.lower().encode()).hexdigest())
    got = {r.lang: (r.true_distinct, r.est_distinct, r.rel_err)
           for r in QUERIES["kmv_distinct_sketch"](spark, SF).collect()}
    for lang, hashes in by_lang.items():
        if len(hashes) < 64:
            assert lang not in got
            continue
        kth = sorted(hashes)[63]
        est = 63 * 4294967296.0 / int(kth[:8], 16)
        n = len(hashes)
        assert got[lang][0] == n, lang
        assert got[lang][1] == pytest.approx(round(est, 6), abs=1e-6)
        assert got[lang][2] == pytest.approx(
            round(abs(est - n) / n, 6), abs=1e-6)
        # a k=64 KMV sketch has ~1/sqrt(k-1) ~ 13% std error; 50% is a
        # broken-sketch tripwire, not a tolerance
        assert got[lang][2] < 0.5, (lang, got[lang])


def test_minhash_threshold_sweep_matches_python(spark):
    import hashlib

    def sig(shingles):
        return [min(hashlib.md5(f"{i}|{s}".encode()).hexdigest()
                    for s in shingles) for i in range(16)]

    sigs = {}
    for doc_id, text in _docs("doc_id", "text"):
        if doc_id >= 200:
            continue
        ws = text.split(" ")
        sh = list(dict.fromkeys(
            " ".join(ws[i:i + 3]) for i in range(len(ws) - 2)))
        if sh:
            sigs[doc_id] = sig(sh)
    ids = sorted(sigs)
    ests = [round(sum(a == b for a, b in zip(sigs[x], sigs[y])) / 16.0, 6)
            for i, x in enumerate(ids) for y in ids[i + 1:]]
    got = {r.threshold: r.n_pairs
           for r in QUERIES["minhash_threshold_sweep"](spark, SF).collect()}
    for t in (0.3, 0.5, 0.7, 0.9):
        assert got[t] == sum(1 for e in ests if e >= t), t
    # monotone non-increasing S-curve
    assert got[0.3] >= got[0.5] >= got[0.7] >= got[0.9]


def test_shingle_df_histogram_matches_python(spark):
    df = collections.Counter()
    for doc_id, text in _docs("doc_id", "text"):
        ws = text.split(" ")
        for s in set(" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)):
            df[s] += 1
    bounds = [2, 4, 8, 16, 64, 256, 1024]

    def bucket(n):
        if n < bounds[0]:
            return f"<{bounds[0]}"
        for lo, hi in zip(bounds, bounds[1:]):
            if n < hi:
                return f"{lo}-{hi - 1}"
        return f">={bounds[-1]}"

    agg = collections.defaultdict(lambda: [0, 0, 0])
    for n in df.values():
        b = agg[bucket(n)]
        b[0] += 1
        b[1] += n
        b[2] += n * (n - 1) // 2
    got = {r.bucket: (r.n_shingles, r.n_postings, r.n_pairs)
           for r in QUERIES["shingle_df_histogram"](spark, SF).collect()}
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_filtered_knn_is_subset_of_filtered_corpus(spark):
    rows = QUERIES["filtered_knn"](spark, SF).collect()
    assert 0 < len(rows) <= 5
    assert all(r.label in (2, 5) for r in rows)
    # distances are ascending after the deterministic tie-break sort
    ds = [r.distance_score for r in sorted(rows, key=lambda r: (
        r.distance_score, r.vec_id))]
    assert ds == sorted(ds)


def test_hybrid_rrf_scores_bounded_and_ranked(spark):
    rows = QUERIES["hybrid_search_rrf"](spark, SF).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        # max possible: rank 1 in both lists
        assert 0 < r.rrf_score <= round(2 / 61, 6) + 1e-9
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True) or \
        sorted(scores, reverse=True) == scores  # driver may reorder


def test_pipeline_funnel_stages_monotone(spark):
    got = {r.stage: r.n
           for r in QUERIES["pipeline_funnel"](spark, SF).collect()}
    assert got["raw_docs"] >= got["quality_pass"] >= got["exact_dedup_pass"]
    assert got["tokens_shipped"] >= got["exact_dedup_pass"]  # >=1 tok/doc


def test_kmeans_lloyd_partitions_the_corpus(spark):
    import pyarrow.parquet as pq2
    n = pq2.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"]).num_rows
    rows = QUERIES["kmeans_lloyd"](spark, SF).collect()
    assert sum(r.n_vecs for r in rows) == n  # every vector assigned once
    assert {r.cid for r in rows} <= {0, 1, 2, 3}
    for r in rows:
        assert 0.0 <= r.mean_dist <= 2.0  # cosine distance range


def test_copurchase_lift_matches_python(spark):
    import itertools
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_orderkey", "l_partkey"])
    op = sorted(set(zip(t.column(0).to_pylist(), t.column(1).to_pylist())))
    orders = collections.defaultdict(list)
    support = collections.Counter()
    for o, p in op:
        orders[o].append(p)
        support[p] += 1
    n_orders = len(orders)
    pair_s = collections.Counter()
    for parts in orders.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            pair_s[(a, b)] += 1
    cands = [(a, b, s,
              round(s * n_orders / (support[a] * support[b]), 6))
             for (a, b), s in pair_s.items() if s >= 3]
    cands.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = cands[:20]
    got = [(r.part_a, r.part_b, r.s_ab, r.lift)
           for r in QUERIES["copurchase_lift"](spark, SF).collect()]
    assert sorted(got) == sorted(want)


def test_percentile_cont_matches_numpy_linear(spark):
    # numpy's 'linear' method IS the ANSI PERCENTILE_CONT definition —
    # a genuinely independent implementation of the interpolation
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_type", "value"])
    by_type = collections.defaultdict(list)
    for et, v in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        by_type[et].append(v)
    got = {r.event_type: r.p95
           for r in QUERIES["percentile_cont_exact"](spark, SF).collect()}
    for et, vals in by_type.items():
        want = float(np.percentile(np.array(vals), 95, method="linear"))
        assert got[et] == pytest.approx(want, abs=2e-6), et


def test_trend_slope_matches_numpy_polyfit(spark):
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_type", "ts", "value"])
    by_type = collections.defaultdict(lambda: ([], []))
    for et, ts, v in zip(t.column(0).to_pylist(), t.column(1).to_pylist(),
                         t.column(2).to_pylist()):
        xs, ys = by_type[et]
        xs.append(int(ts.timestamp()))       # floor to whole seconds
        ys.append(round(v * 100))            # integer cents
    got = {r.event_type: r.slope_cents_per_day
           for r in QUERIES["trend_slope"](spark, SF).collect()}
    for et, (xs, ys) in by_type.items():
        slope = np.polyfit(np.array(xs, dtype=np.float64),
                           np.array(ys, dtype=np.float64), 1)[0]
        want = slope * 86400.0  # cents/sec -> cents/day
        # polyfit solves the same least squares by a different
        # numerical route (QR vs closed form): allow relative slack
        assert got[et] == pytest.approx(want, rel=1e-4), et


def test_gini_matches_python_reference(spark):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["source"])
    counts = sorted(collections.Counter(t.column(0).to_pylist()).values())
    k, tot = len(counts), sum(counts)
    gini = (2.0 * sum((i + 1) * x for i, x in enumerate(counts))
            / (k * tot) - (k + 1.0) / k)
    row = QUERIES["source_concentration_gini"](spark, SF).collect()[0]
    assert row.n_sources == k and row.n_docs == tot
    assert row.gini == pytest.approx(gini, abs=2e-6)
    assert 0.0 <= row.gini < 1.0


def test_hybrid_rrf_matches_python_fusion(spark):
    # independent rank fusion over the engine's own two ranked lists
    lex = QUERIES["bm25_score"](spark, SF).collect()
    lex_rank = {r.doc_id: i + 1 for i, r in enumerate(
        sorted(lex, key=lambda r: (-r.bm25, r.doc_id))[:20])}
    from tripgogo_vector_search_spark.functions.embed import hash_embed_py
    qv = np.array(hash_embed_py("data query spark", normalized=False))
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    dists = []
    for d, text in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        v = np.array(hash_embed_py(text, normalized=False))
        if v @ v == 0:
            continue
        cos = 1.0 - float(v @ qv) / (np.linalg.norm(v) * np.linalg.norm(qv))
        dists.append((round(cos, 6), d))
    vec_rank = {d: i + 1 for i, (c, d) in enumerate(sorted(dists)[:20])}
    fused = collections.defaultdict(float)
    for d, r in lex_rank.items():
        fused[d] += 1.0 / (60 + r)
    for d, r in vec_rank.items():
        fused[d] += 1.0 / (60 + r)
    want = sorted(((round(s, 6), d) for d, s in fused.items()),
                  key=lambda t2: (-t2[0], t2[1]))[:10]
    got = [(r.rrf_score, r.doc_id)
           for r in QUERIES["hybrid_search_rrf"](spark, SF).collect()]
    assert sorted(got) == sorted(want)
