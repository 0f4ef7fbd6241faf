"""Independent reference checks for the round-10 corpus-hygiene and
data-selection operators: each query is recomputed in plain Python
(pyarrow + hashlib + math, no Spark, no DuckDB) from the same parquet
and must agree. Third implementation — catches the case where the
Spark plan and its SQL oracle share a mistake (the two-engine gate
cannot see that class).
"""

from __future__ import annotations

import collections
import hashlib
import math
from decimal import Decimal

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE
from tripgogo_vector_search_spark.plans.registry import QUERIES

SF = SF_SMOKE
PARA = 20


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "source"])
    return list(zip(t.column(0).to_pylist(), t.column(1).to_pylist(),
                    t.column(2).to_pylist()))


def _paras(text):
    ws = text.split(" ") if text is not None else []
    n_full = len(ws) // PARA
    return [hashlib.md5(" ".join(ws[i * PARA:(i + 1) * PARA])
                        .encode()).hexdigest()
            for i in range(n_full)]


def _split(doc_id):
    n = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
    return {"c": "val", "d": "val", "e": "test", "f": "test"}.get(n, "train")


def test_dup_paragraph_fraction_matches_python_reference(spark):
    got = {r.source: r for r in
           QUERIES["dup_paragraph_fraction"](spark, SF).collect()}
    mult = collections.Counter()
    per_doc = {}
    for doc_id, text, source in _docs():
        hs = _paras(text)
        per_doc[doc_id] = (source, hs)
        mult.update(hs)
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])  # docs paras dup dupdocs
    for source, hs in per_doc.values():
        d = sum(1 for h in hs if mult[h] > 1)
        a = agg[source]
        a[0] += 1
        a[1] += len(hs)
        a[2] += d
        a[3] += 1 if d > 0 else 0
    assert set(got) == set(agg)
    for source, (nd, np_, dp, dd) in agg.items():
        r = got[source]
        assert (r.n_docs, r.n_paras, r.dup_paras) == (nd, np_, dp), source
        want_pf = round(dp / np_, 6) if np_ else None
        assert r.dup_para_fraction == pytest.approx(want_pf) \
            if want_pf is not None else r.dup_para_fraction is None
        assert r.dup_doc_fraction == pytest.approx(round(dd / nd, 6))


def test_split_contamination_matches_python_reference(spark):
    got = {(r.split, r.source): r for r in
           QUERIES["split_contamination_audit"](spark, SF).collect()}
    train_keys = set()
    rows = []
    for doc_id, text, source in _docs():
        hs = _paras(text)
        sp = _split(doc_id)
        if sp == "train":
            train_keys.update(hs)
        rows.append((doc_id, source, sp, hs))
    agg = collections.defaultdict(lambda: [0, 0])
    for doc_id, source, sp, hs in rows:
        if sp == "train":
            continue
        a = agg[(sp, source)]
        a[0] += 1
        a[1] += 1 if any(h in train_keys for h in hs) else 0
    assert set(got) == set(agg)
    for key, (nd, nc) in agg.items():
        r = got[key]
        assert (r.n_docs, r.contaminated_docs) == (nd, nc), key
        assert r.contamination_fraction == pytest.approx(round(nc / nd, 6))


def test_dsir_matches_python_reference(spark):
    got = {r.doc_id: r for r in
           QUERIES["dsir_importance_weights"](spark, SF).collect()}
    K = 64

    def bucket(gram):
        h = hashlib.md5(gram.encode()).hexdigest()
        b = 0
        for i in range(6):
            b = (b << 1) | (1 if h[i] in "89abcdef" else 0)
        return b

    db = collections.defaultdict(collections.Counter)  # doc -> bucket counts
    target = {}
    for doc_id, text, _ in _docs():
        ws = text.split(" ") if text is not None else []
        target[doc_id] = doc_id % 7 == 0
        for i in range(len(ws) - 1):
            db[doc_id][bucket(ws[i] + " " + ws[i + 1])] += 1
    ct = collections.Counter()
    cr = collections.Counter()
    for doc_id, counts in db.items():
        (ct if target[doc_id] else cr).update(counts)
    tt, tr = sum(ct.values()), sum(cr.values())
    # mirror the engine contract exactly: each factor cast to double
    # BEFORE the multiply (the int64-overflow-safe ADVICE r10 form —
    # float(a)*float(b), not float(a*b)), one IEEE division, one ln,
    # quantized to 12 decimals (DECIMAL(28,12)), DECIMAL accumulation
    delta = {b: Decimal(repr(round(math.log(
        float(ct[b] + 1) * float(tr + K)
        / (float(tt + K) * float(cr[b] + 1))), 12)))
        for b in set(ct) | set(cr)}
    raw_ids = [d for d, t in target.items() if not t]
    assert set(got) == set(raw_ids)
    for doc_id in raw_ids:
        counts = db.get(doc_id, {})
        s = sum((Decimal(c) * delta[b] for b, c in counts.items()),
                Decimal(0))
        r = got[doc_id]
        assert r.n_grams == sum(counts.values()), doc_id
        assert r.log_weight == pytest.approx(round(float(s), 6),
                                             abs=2e-6), doc_id
        assert r.selected == (s > 0), doc_id


def test_dup_paragraph_removal_matches_python_reference(spark):
    got = {r.doc_id: r for r in
           QUERIES["dup_paragraph_removal"](spark, SF).collect()}
    first = {}
    per_doc = []
    for doc_id, text, _ in sorted(_docs()):
        hs = _paras(text)
        for i, h in enumerate(hs):
            first.setdefault(h, (doc_id, i))
        per_doc.append((doc_id, text, hs))
    for doc_id, text, hs in per_doc:
        r = got[doc_id]
        if text is None:
            assert (r.n_paras, r.n_removed, r.clean_text) == (0, 0, None)
            continue
        ws = text.split(" ")
        kept, removed = [], 0
        for i, h in enumerate(hs):
            if first[h] == (doc_id, i):
                kept.append(" ".join(ws[i * PARA:(i + 1) * PARA]))
            else:
                removed += 1
        tail = ws[len(hs) * PARA:]
        if tail:
            kept.append(" ".join(tail))
        assert r.n_paras == len(hs) and r.n_removed == removed, doc_id
        assert r.clean_text == " ".join(kept), doc_id
