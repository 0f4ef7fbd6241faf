"""Independent reference checks for the round-3 operators: each query is
recomputed in plain Python (pandas/pyarrow, no Spark, no DuckDB) from the
same parquet and must agree. This is a third implementation — catching
the case where the Spark query and its SQL oracle share a mistake.
"""

from __future__ import annotations

import collections
import math

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE
from tripgogo_vector_search_spark.plans.registry import QUERIES

SF = SF_SMOKE


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column(0).to_pylist(), t.column(1).to_pylist()))


def test_entropy_score_matches_python_reference(spark):
    got = {r.doc_id: r.word_entropy
           for r in QUERIES["entropy_score"](spark, SF).collect()}
    for doc_id, text in _docs():
        counts = collections.Counter(text.split(" "))
        tot = sum(counts.values())
        # mirror the engine contract: per-term 1e-12 rounding, exact sum
        terms = [round(-(n / tot) * math.log(n / tot), 12)
                 for n in counts.values()]
        want = round(math.fsum(terms), 6) + 0.0
        assert got[doc_id] == pytest.approx(want, abs=2e-6), doc_id


def test_bm25_matches_python_reference(spark):
    qterms = ["data", "query", "spark"]
    k1, b = 1.2, 0.75
    docs = _docs()
    dl = {d: len(t.split(" ")) for d, t in docs}
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    tf = {d: collections.Counter(w for w in t.split(" ") if w in qterms)
          for d, t in docs}
    df = collections.Counter(w for d in tf.values() for w in d)
    want = {}
    for d, counts in tf.items():
        if not counts:
            continue
        terms = []
        for w, f in counts.items():
            idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
            frac = (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
            terms.append(round(idf * frac, 12))
        want[d] = round(math.fsum(terms), 6) + 0.0
    got = {r.doc_id: r.bm25 for r in QUERIES["bm25_score"](spark, SF).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6), d


def test_quartile_agg_values_are_rank_correct_members(spark):
    t = pq.read_table(f"{SF}/customer.parquet",
                      columns=["c_nationkey", "c_custkey", "c_acctbal"])
    rows = list(zip(t.column(0).to_pylist(), t.column(1).to_pylist(),
                    t.column(2).to_pylist()))
    groups: dict = collections.defaultdict(list)
    for nk, ck, bal in rows:
        groups[nk].append((bal, ck))
    got = {r.c_nationkey: (r.q25, r.q50, r.q75)
           for r in QUERIES["quartile_agg"](spark, SF).collect()}
    assert set(got) == set(groups)
    for nk, vals in groups.items():
        ordered = [bal for bal, _ in sorted(vals)]
        n = len(ordered)
        want = tuple(ordered[math.ceil(q * n) - 1] for q in (0.25, 0.5, 0.75))
        assert got[nk] == want, nk


def test_mode_agg_is_true_argmax_with_lexical_tiebreak(spark):
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "event_type"])
    counts: dict = collections.defaultdict(collections.Counter)
    for u, e in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        counts[u][e] += 1
    got = {r.user_id: (r.mode_event, r.n_occurrences)
           for r in QUERIES["mode_agg"](spark, SF).collect()}
    assert set(got) == set(counts)
    for u, c in counts.items():
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got[u] == best, u


def test_event_gap_stats_matches_python_reference(spark):
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "event_id", "ts"])
    rows = sorted(zip(t.column(0).to_pylist(), t.column(2).to_pylist(),
                      t.column(1).to_pylist()),
                  key=lambda r: (r[0], r[1], r[2]))
    per_user: dict = collections.defaultdict(list)
    for u, ts, eid in rows:
        per_user[u].append(ts)
    got = {r.user_id: (r.n_gaps, r.max_gap_us, r.avg_gap_sec)
           for r in QUERIES["event_gap_stats"](spark, SF).collect()}
    for u, tss in per_user.items():
        if len(tss) < 2:
            assert u not in got
            continue
        gaps = [int((b - a).total_seconds() * 1_000_000)
                for a, b in zip(tss, tss[1:])]
        want = (len(gaps), max(gaps),
                round(sum(gaps) / len(gaps) / 1_000_000.0, 6))
        assert got[u] == want, u


def test_minhash_estimate_is_calibrated(spark):
    rows = QUERIES["minhash_jaccard_estimate"](spark, SF).collect()
    assert rows, "bounded pair set must be non-empty"
    errs = []
    for r in rows:
        # estimates live on the k/16 grid by construction
        assert abs(r.est_jaccard * 16 - round(r.est_jaccard * 16)) < 1e-9
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        errs.append(abs(r.est_jaccard - r.exact_jaccard))
    # 16 hashes -> stderr ~ sqrt(j(1-j)/16) <= 0.125; the mean absolute
    # error across pairs must look like that, not like noise
    assert sum(errs) / len(errs) < 0.15


def test_tpch_q14_ratio_matches_python_reference(spark):
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_extendedprice",
                                "l_discount", "l_shipdate"])
    pt = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey", "p_type"])
    ptype = dict(zip(pt.column(0).to_pylist(), pt.column(1).to_pylist()))
    import datetime
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 4, 1)
    num = den = 0.0
    for pk, price, disc, ship in zip(li.column(0).to_pylist(),
                                     li.column(1).to_pylist(),
                                     li.column(2).to_pylist(),
                                     li.column(3).to_pylist()):
        if not (lo <= ship < hi):
            continue
        rev = price * (1 - disc)
        den += rev
        if ptype.get(pk) == "PROMO":
            num += rev
    [row] = QUERIES["tpch_q14"](spark, SF).collect()
    assert row.promo_revenue_pct == pytest.approx(100.0 * num / den, abs=1e-4)
