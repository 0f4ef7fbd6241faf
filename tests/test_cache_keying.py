"""Materialized state (ANN/band indexes, sink scratch, streaming
checkpoints) must not survive a fixture regeneration: the cache path is
keyed on a fingerprint of the corpus parquet files. Pure-Python test —
no Spark session needed.
"""

from __future__ import annotations

import os

from tripgogo_vector_search_spark.plans.registry import (_cache_dir,
                                                         _corpus_fingerprint)


def _write(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def test_fingerprint_changes_when_a_table_is_rewritten(tmp_path):
    d = str(tmp_path)
    _write(os.path.join(d, "events.parquet"), b"v1")
    _write(os.path.join(d, "documents.parquet"), b"docs")
    fp1 = _corpus_fingerprint(d)
    assert fp1 == _corpus_fingerprint(d)  # stable while untouched
    # regeneration: same name, new content/mtime
    _write(os.path.join(d, "events.parquet"), b"v2!")
    assert _corpus_fingerprint(d) != fp1


def test_cache_dir_embeds_fingerprint_and_sf_name(tmp_path):
    d = str(tmp_path / "sf0.42")
    os.makedirs(d)
    _write(os.path.join(d, "events.parquet"), b"v1")
    p1 = _cache_dir(d, "some_index")
    assert "sf0.42-" in p1 and p1.endswith("some_index")
    _write(os.path.join(d, "events.parquet"), b"v2!")
    p2 = _cache_dir(d, "some_index")
    assert p2 != p1  # a regenerated corpus can never hit the old index


def test_stale_cache_generations_pruned_on_regen(tmp_path):
    """ADVICE r3: fingerprinted generations of the SAME sf must not
    accumulate — a regeneration prunes prior-fingerprint siblings (they
    can never be reused), while other scale factors' caches survive."""
    d = str(tmp_path / "sf0.42")
    other = str(tmp_path / "sf0.07")
    os.makedirs(d)
    os.makedirs(other)
    _write(os.path.join(d, "events.parquet"), b"v1")
    _write(os.path.join(other, "events.parquet"), b"keep")
    p1 = _cache_dir(d, "some_index")
    p_other = _cache_dir(other, "some_index")
    _write(os.path.join(d, "events.parquet"), b"v2!")
    p2 = _cache_dir(d, "some_index")
    base = os.path.dirname(os.path.dirname(p2))
    gens = [g for g in os.listdir(base) if g.startswith("sf0.42-")]
    assert len(gens) == 1  # exactly one surviving generation
    assert not os.path.exists(p1)
    assert os.path.exists(p_other)  # other sf untouched


def test_materialized_leaf_versioned_by_builder_source(tmp_path):
    """r8: `src=` bakes the builder functions' transitive source-
    closure digest (introspect.py) into the cache leaf, so a kernel or
    builder edit rebuilds the index instead of serving one computed by
    old code. Stability and src-sensitivity of the leaf derivation;
    'an edit moves the digest' itself is pinned by
    tests/test_source_closure.py on synthetic graphs."""
    import re

    from tripgogo_vector_search_spark.operators import dedup as DD
    from tripgogo_vector_search_spark.plans.registry import (
        _materialized_index)

    d = str(tmp_path / "sf0.5")
    os.makedirs(d)
    _write(os.path.join(d, "documents.parquet"), b"docs")
    built = []

    def build(p):
        os.makedirs(p, exist_ok=True)
        _write(os.path.join(p, "_SUCCESS"), b"")
        built.append(p)

    p_plain = _materialized_index(None, d, "idx", build)
    p_src = _materialized_index(None, d, "idx", build,
                                src=(DD.minhash_bands,))
    # versioned leaf: 8-hex digest suffix, distinct from the plain path
    assert re.search(r"idx-[0-9a-f]{8}$", p_src) and p_src != p_plain
    # deterministic: same src -> same path, and _SUCCESS short-circuits
    assert _materialized_index(None, d, "idx", build,
                               src=(DD.minhash_bands,)) == p_src
    assert len(built) == 2
    # different builder code -> different generation
    assert _materialized_index(None, d, "idx", build,
                               src=(DD.ngram_docset,)) != p_src


def test_stale_leaf_generations_pruned_on_rebuild(tmp_path):
    """A leaf built by a different code version (or the pre-versioning
    bare leaf) is removed when the current version's leaf is derived —
    stale index generations cannot be read again, so they must not
    accumulate across edits."""
    from tripgogo_vector_search_spark.operators import dedup as DD
    from tripgogo_vector_search_spark.plans.registry import (
        _materialized_index)

    d = str(tmp_path / "sf0.7")
    os.makedirs(d)
    _write(os.path.join(d, "documents.parquet"), b"docs")

    def build(p):
        os.makedirs(p, exist_ok=True)
        _write(os.path.join(p, "_SUCCESS"), b"")

    bare = _materialized_index(None, d, "idx", build)          # pre-versioning
    fake_old = os.path.join(os.path.dirname(bare), "idx-0123abcd")
    build(fake_old)                                            # other version
    keep = os.path.join(os.path.dirname(bare), "idx2")         # OTHER leaf
    build(keep)
    cur = _materialized_index(None, d, "idx", build,
                              src=(DD.minhash_bands,))
    assert os.path.isdir(cur)
    assert not os.path.exists(bare)        # bare leaf pruned
    assert not os.path.exists(fake_old)    # other-version leaf pruned
    assert os.path.isdir(keep)             # unrelated leaf untouched
