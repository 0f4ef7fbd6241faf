"""Independent reference checks for the round-11 additions: plain
Python (pyarrow + hashlib + math — no Spark, no DuckDB) recomputation
from the same parquet. Third implementation — catches the case where
the Spark plan and its SQL oracle share a mistake (the two-engine gate
cannot see that class)."""

from __future__ import annotations

import collections
import hashlib
import math
from decimal import Decimal

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE
from tripgogo_vector_search_spark.plans.registry import QUERIES

SF = SF_SMOKE
K = 64  # DSIR_BUCKETS


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    return list(zip(t.column(0).to_pylist(), t.column(1).to_pylist()))


def _bucket(gram: str) -> int:
    h = hashlib.md5(gram.encode()).hexdigest()
    b = 0
    for i in range(6):
        b = (b << 1) | (1 if h[i] in "89abcdef" else 0)
    return b


def _dsir_log_weights() -> dict[int, float]:
    """The dsir_importance_weights contract replayed in plain Python
    (the r10 reference, including the ADVICE r10 factor-double casts)."""
    db = collections.defaultdict(collections.Counter)
    target = {}
    for doc_id, text in _docs():
        ws = text.split(" ") if text is not None else []
        target[doc_id] = doc_id % 7 == 0
        for i in range(len(ws) - 1):
            db[doc_id][_bucket(ws[i] + " " + ws[i + 1])] += 1
    ct, cr = collections.Counter(), collections.Counter()
    for doc_id, counts in db.items():
        (ct if target[doc_id] else cr).update(counts)
    tt, tr = sum(ct.values()), sum(cr.values())
    delta = {b: Decimal(repr(round(math.log(
        float(ct[b] + 1) * float(tr + K)
        / (float(tt + K) * float(cr[b] + 1))), 12)))
        for b in set(ct) | set(cr)}
    out = {}
    for doc_id, is_t in target.items():
        if is_t:
            continue
        s = sum((Decimal(c) * delta[b]
                 for b, c in db.get(doc_id, {}).items()), Decimal(0))
        out[doc_id] = round(float(s), 6)
    return out


def test_dsir_resample_membership_matches_python_draw(spark):
    """The Gumbel-top-k draw replayed independently: u from md5, key =
    log_weight - ln(-ln(u)) rounded to 1e-12, top 100 by (key DESC,
    doc_id ASC). Set membership AND order-free identity of the drawn
    ids must match the Spark plan."""
    got = [r.doc_id for r in
           QUERIES["dsir_resample"](spark, SF).collect()]
    assert len(got) == len(set(got)) == 100
    lw = _dsir_log_weights()
    keyed = []
    for doc_id, w in lw.items():
        hx = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        u = (int(hx, 16) + 0.5) / 2 ** 32
        keyed.append((round(w - math.log(-math.log(u)), 12), -doc_id,
                      doc_id))
    keyed.sort(reverse=True)
    want = [doc_id for _, _, doc_id in keyed[:100]]
    assert set(got) == set(want)
    # the draw is weight-proportional, not a plain top-by-weight cut:
    # the selected set must differ from the 100 largest raw weights
    # (equality would mean the Gumbel noise is not being applied)
    by_weight = sorted(lw, key=lambda d: (-lw[d], d))[:100]
    assert set(want) != set(by_weight)
