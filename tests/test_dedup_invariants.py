"""Algebraic invariants of the dedup family — properties that must hold
on ANY corpus, checked on real test data plus adversarial edits. These
complement the oracle gate (which pins one corpus's exact output) by
pinning the contracts a pipeline composes against.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tripgogo_vector_search_spark.operators import dedup as DD

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text"))


def test_exact_dedup_partitions_the_corpus(spark):
    docs = _docs(spark)
    out = DD.fingerprint_dedup(docs, "text", "doc_id")
    # group sizes sum to the corpus size; every canonical is a real doc
    assert (out.agg(F.sum("dup_count")).first()[0] == docs.count())
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert all(r.canonical_id in ids for r in out.collect())


def test_canonical_is_minimal_and_self_for_non_dups(spark):
    docs = _docs(spark)
    for out in (DD.minhash_lsh_dedup(docs, "text", "doc_id"),
                DD.embedding_near_dup(
                    spark.read.parquet(f"{SF}/embeddings.parquet"),
                    "embedding", "vec_id").withColumnsRenamed(
                        {"vec_id": "doc_id"}),
                DD.simhash_banded_dedup(docs, "text", "doc_id")):
        rows = out.collect()
        for r in rows:
            # canonical never exceeds the member id; non-dups self-label
            assert r.canonical_id <= r.doc_id
            assert r.is_dup == (r.canonical_id != r.doc_id)


def test_components_refine_lsh_verdict(spark):
    """Connected components can only merge LSH groups, never split them:
    two docs with the same LSH canonical must share a component."""
    docs = _docs(spark)
    lsh = DD.minhash_lsh_dedup(docs, "text", "doc_id")
    comp = DD.minhash_components(docs, "text", "doc_id")
    j = {r.doc_id: r.component_id for r in comp.collect()}
    by_canon: dict[int, set[int]] = {}
    for r in lsh.collect():
        by_canon.setdefault(r.canonical_id, set()).add(j[r.doc_id])
    for canon, comps in by_canon.items():
        assert len(comps) == 1, f"LSH group {canon} split across {comps}"


def test_duplicating_a_doc_is_detected(spark):
    """Appending an exact copy of any doc must mark the copy as a dup of
    the original, in every near-dup operator."""
    docs = _docs(spark)
    src = docs.orderBy("doc_id").limit(1)
    clone = src.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    aug = docs.unionByName(clone)
    orig_id = src.first().doc_id
    clone_id = orig_id + 1_000_000
    for out in (DD.minhash_lsh_dedup(aug, "text", "doc_id"),
                DD.simhash_banded_dedup(aug, "text", "doc_id")):
        r = out.filter(F.col("doc_id") == clone_id).first()
        assert r.is_dup and r.canonical_id <= orig_id
    jac = DD.ngram_jaccard_pairs(aug, "text", "doc_id", min_jaccard=0.99)
    hits = {(p.id_a, p.id_b) for p in jac.collect()}
    assert (orig_id, clone_id) in hits


def test_jaccard_pairs_are_canonical_and_bounded(spark):
    out = DD.ngram_jaccard_pairs(_docs(spark), "text", "doc_id",
                                 min_jaccard=0.2).collect()
    assert len(out) > 0
    for r in out:
        assert r.id_a < r.id_b          # one row per unordered pair
        assert 0.2 <= r.jaccard <= 1.0  # threshold respected, bounded


def test_simhash_banded_matches_python_reference(spark):
    """Full third implementation of the banded-SimHash algorithm in
    pure Python (md5 -> 32-bit signature -> 4x8 bands -> per-bucket
    pairs with hamming <= radius, posting-cap star fallback -> min
    star-link), independent of both the Spark plan and the DuckDB
    oracle — the same role the numpy checks play for trend_slope and
    knn_label_accuracy."""
    import collections
    import hashlib

    import pyarrow.parquet as pq

    from tripgogo_vector_search_spark.plans.registry import (
        _SIMHASH_POSTING_CAP, QUERIES)

    radius, cap = 3, _SIMHASH_POSTING_CAP
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    high = set("89abcdef")

    def simhash(text):
        counts = [0] * 32
        for tok in text.split(" "):
            h = hashlib.md5(tok.encode()).hexdigest()
            for j in range(32):
                counts[j] += 1 if h[j] in high else -1
        return "".join("1" if c > 0 else "0" for c in counts)

    sig = {}
    for did, text in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        sig[did] = simhash(text)
    buckets = collections.defaultdict(list)
    for did, s in sig.items():
        for b in range(4):
            buckets[f"{b}:{s[8 * b:8 * b + 8]}"].append(did)
    edges = collections.defaultdict(set)   # dup -> {src}
    for ids in buckets.values():
        if len(ids) < 2:
            continue
        if len(ids) > cap:
            by_sig = collections.defaultdict(list)
            for did in ids:
                by_sig[sig[did]].append(did)
            for group in by_sig.values():
                m = min(group)
                for did in group:
                    if did > m:
                        edges[did].add(m)
            continue
        for i, a in enumerate(ids):
            for b2 in ids[i + 1:]:
                lo, hi = min(a, b2), max(a, b2)
                ham = sum(x != y for x, y in zip(sig[lo], sig[hi]))
                if ham <= radius:
                    edges[hi].add(lo)
    want = {}
    for did in sig:
        srcs = edges.get(did)
        want[did] = (bool(srcs), min(srcs) if srcs else did)
    got = {r.doc_id: (r.is_dup, r.canonical_id)
           for r in QUERIES["simhash_hamming_dedup"](spark, SF).collect()}
    assert got == want


def test_dedup_components_matches_union_find(spark):
    """Third implementation of the transitive near-dup grouping in pure
    Python: MinHash signatures recomputed from scratch with hashlib
    (the executable spec — i-prefixed md5 minima over 3-word shingles),
    LSH banding, star edges to the bucket min, then UNION-FIND — an
    entirely different closure algorithm than both the Spark iterative
    min-label propagation and the DuckDB recursive CTE. Components must
    assign every doc the min doc_id of its transitive group."""
    import collections
    import hashlib

    import pyarrow.parquet as pq

    from tripgogo_vector_search_spark.plans.registry import QUERIES

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])

    def minhash_bands(text):
        ws = text.split(" ")
        if len(ws) < 3:
            return []
        shingles = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
        sig = []
        for i in range(16):
            p = f"{i}|".encode()
            sig.append(min(hashlib.md5(p + s.encode()).hexdigest()
                           for s in shingles))
        return [hashlib.md5(
            (f"{b}," + ",".join(sig[4 * b:4 * b + 4])).encode()).hexdigest()
            for b in range(4)]

    buckets = collections.defaultdict(list)
    ids = t.column(0).to_pylist()
    for did, text in zip(ids, t.column(1).to_pylist()):
        for key in minhash_bands(text):
            buckets[key].append(did)

    parent = {d: d for d in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for members in buckets.values():
        m = min(members)
        for d in members:
            union(m, d)
    want = {d: find(d) for d in ids}
    got = {r.doc_id: r.component_id
           for r in QUERIES["dedup_components"](spark, SF).collect()}
    assert got == want


def test_ngram_jaccard_matches_python_reference(spark):
    """Third implementation of the full-pair shingle Jaccard join in
    pure Python sets (no hashing, no postings, no SQL): for every doc
    pair sharing >= 1 shingle, jaccard = |A&B| / |A|B|-union, rounded
    to 6 dp — pins the r5 `_posting_intersections` join stage against
    an algorithm with no shared machinery (the Spark side hashes
    shingles to int64 and counts posting matches; this compares the
    actual string sets). Rounding is HALF_UP via Decimal — python's
    builtin round() is banker's and diverges at exact 6-dp midpoints
    (1/128 = 0.0078125 occurs in the fixture)."""
    import itertools
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq

    from tripgogo_vector_search_spark.plans.registry import QUERIES

    def r6(x):
        return float(Decimal(x).quantize(Decimal("0.000001"),
                                         rounding=ROUND_HALF_UP))

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    sets = {}
    for did, text in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        ws = text.split(" ")
        sh = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
        if sh:
            sets[did] = sh
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter:
            want[(a, b)] = r6(
                inter / (len(sets[a]) + len(sets[b]) - inter))
    got = {(r.id_a, r.id_b): r.jaccard
           for r in QUERIES["ngram_jaccard"](spark, SF).collect()}
    assert got == want


def test_embedding_near_dup_matches_python_reference(spark):
    """Third implementation of the sign-prefix embedding near-dedup in
    pure Python/float arithmetic: 8-bit sign bucket, in-bucket cosine
    >= 0.95 pairs, min-source link — independent of both the Catalyst
    higher-order folds and the DuckDB list_transform oracle. The
    fixture corpus has no cosine>=0.95 pair on its own, so a cloned
    vector is appended to make the positive path bite; the operator
    (the same function the registry query calls) runs on the augmented
    frame."""
    import math

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = list(t.column(0).to_pylist())
    vecs = {i: [float(x) for x in v]
            for i, v in zip(ids, t.column(1).to_pylist())}
    clone_id = min(ids) + 1_000_000
    vecs[clone_id] = vecs[min(ids)]
    ids.append(clone_id)
    buckets = {}
    for i, v in vecs.items():
        b = "".join("1" if x >= 0 else "0" for x in v[:8])
        buckets.setdefault(b, []).append(i)
    mins = {}
    for members in buckets.values():
        members.sort()
        for j, bid in enumerate(members):
            for aid in members[:j]:
                va, vb = vecs[aid], vecs[bid]
                dot = sum(x * y for x, y in zip(va, vb))
                na = math.sqrt(sum(x * x for x in va))
                nb = math.sqrt(sum(x * x for x in vb))
                if na and nb and dot / (na * nb) >= 0.95:
                    mins[bid] = min(mins.get(bid, aid), aid)
    want = {i: (i in mins, mins.get(i, i)) for i in ids}
    aug = spark.createDataFrame([(i, vecs[i]) for i in ids],
                                "vec_id long, embedding array<double>")
    got = {r.vec_id: (r.is_dup, r.canonical_id)
           for r in DD.embedding_near_dup(aug, "embedding", "vec_id",
                                          prefix_bits=8,
                                          threshold=0.95).collect()}
    assert got == want
    assert want[clone_id][0] and want[clone_id][1] == min(ids)


# ---- minhash_probe (r8 incremental near-dup) -----------------------------


def test_minhash_probe_equals_full_dedup_restricted_to_batch(spark):
    """Probe contract: for a batch doc, is_dup/canonical vs the CORPUS
    equals what the full band self-join would say about (batch doc,
    corpus docs) pairs — computed here by a python reference over the
    band index itself, so the star/min shortcut is independently
    checked."""
    docs = _docs(spark)
    bands = DD.minhash_bands(docs, "text", "doc_id")
    rows = [(r.doc_id, r.band_key) for r in bands.collect()]
    batch = {i for (i, _b) in rows if i % 7 == 0}
    corpus_min: dict[str, int] = {}
    for i, b in rows:
        if i not in batch:
            corpus_min[b] = min(corpus_min.get(b, i), i)
    want = {}
    for i in sorted({r.doc_id for r in docs.select("doc_id").collect()}):
        if i not in batch:
            continue
        hits = [corpus_min[b] for (j, b) in rows
                if j == i and b in corpus_min]
        want[i] = (bool(hits), min(hits) if hits else i)
    is_new = F.col("doc_id") % 7 == 0
    got = {r.doc_id: (r.is_dup, r.canonical_id) for r in
           DD.minhash_probe(bands.filter(is_new), bands.filter(~is_new),
                            docs.filter(is_new).select("doc_id"),
                            "doc_id").collect()}
    assert got == want


def test_minhash_probe_degenerate_batches(spark):
    """Empty batch -> empty result; a batch doc colliding only with
    OTHER BATCH docs is not a dup (the corpus is the reference set);
    short docs with no signature never collide but still appear."""
    docs = _docs(spark)
    bands = DD.minhash_bands(docs, "text", "doc_id")
    nothing = F.lit(False)
    out = DD.minhash_probe(bands.filter(nothing), bands,
                           docs.filter(nothing).select("doc_id"),
                           "doc_id")
    assert out.count() == 0
    # two identical NEW docs + one short new doc, empty corpus index
    new = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta epsilon"),
         (3, "hi")], "doc_id long, text string")
    nb = DD.minhash_bands(new, "text", "doc_id")
    got = {r.doc_id: (r.is_dup, r.canonical_id) for r in
           DD.minhash_probe(nb, bands.filter(nothing),
                            new.select("doc_id"), "doc_id").collect()}
    assert got == {1: (False, 1), 2: (False, 2), 3: (False, 3)}
