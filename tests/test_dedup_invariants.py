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
