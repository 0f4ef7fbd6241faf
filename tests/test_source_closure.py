"""tripgogo_vector_search_spark/introspect.py — the per-key stream-fingerprint basis.

The drift gate's guarantee for ``stream_*`` keys is only as strong as
this closure: it must (a) reach every package definition a stream key
can execute, across modules — the r8 soundness fix (the old
whole-ingest.py hash missed stream_minhash_probe's probe logic in
operators/dedup.py); and (b) NOT reach unrelated definitions — the
precision fix (the old hash re-flagged all ten stream keys on any
ingest.py edit, burning 10 of r8's 50 driver-window slots). Both
directions are pinned here on synthetic module graphs plus the real
package."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plan_manifest import _unwrap  # noqa: E402
from tripgogo_vector_search_spark.introspect import (WHOLE, SourceGraph,  # noqa: E402
                                                    package_graph)  # noqa: E402

SRC_A = '''\
import os
from .b import helper, CONST
from . import c as CC


def top(x):
    return helper(x) + CONST + CC.leaf(x)


def other(x):
    return os.path.join("x", str(x))
'''

SRC_B = '''\
CONST = 7


def _inner(x):
    return x * CONST


def helper(x):
    return _inner(x) + 1


def unrelated(x):
    return x - 1
'''

SRC_C = '''\
def leaf(x):
    return x + 2


def ignored(x):
    return x - 2
'''


def _graph(**over) -> SourceGraph:
    return SourceGraph({"a": SRC_A, "b": SRC_B, "c": SRC_C} | over)


def test_closure_reaches_transitive_cross_module_defs():
    c = _graph().closure("a", "top")
    assert {("a", "top"), ("b", "helper"), ("b", "CONST"),
            ("b", "_inner"), ("c", "leaf")} <= c


def test_closure_excludes_unreferenced_defs():
    c = _graph().closure("a", "top")
    assert ("b", "unrelated") not in c
    assert ("c", "ignored") not in c
    assert ("a", "other") not in c
    # and the other direction: `other` touches nothing in b/c
    c2 = _graph().closure("a", "other")
    assert not {m for m, _ in c2} - {"a"}


def test_digest_moves_with_reachable_edit_only():
    base = _graph().digest("a", "top")
    # editing a REACHABLE helper body moves the digest
    edited = _graph(b=SRC_B.replace("return _inner(x) + 1",
                                    "return _inner(x) + 2"))
    assert edited.digest("a", "top") != base
    # editing an UNREACHABLE def does not — per-key precision, the
    # property the whole-module hash lacked
    unrel = _graph(b=SRC_B.replace("return x - 1", "return x - 3"))
    assert unrel.digest("a", "top") == base
    # the unreachable def IS covered for keys that use it
    assert unrel.digest("b", "unrelated") != _graph().digest(
        "b", "unrelated")


def test_unresolvable_symbol_degrades_to_whole_module():
    # d re-exports helper; a2 imports it from d — d has no top-level
    # def `h2`, so coverage degrades to ALL of d, never to silence
    src_d = "from .b import helper as h2\n"
    src_a2 = ("from .d import h2\n\n\ndef top2(x):\n    return h2(x)\n")
    g = SourceGraph({"a2": src_a2, "b": SRC_B, "d": src_d})
    c = g.closure("a2", "top2")
    assert ("d", WHOLE) in c
    # any edit to d moves the digest
    g2 = SourceGraph({"a2": src_a2, "b": SRC_B,
                      "d": src_d + "X = 1\n"})
    assert g.digest("a2", "top2") != g2.digest("a2", "top2")


def test_bare_module_alias_hashes_whole_module():
    src = "from . import c as CC\n\n\ndef f(g):\n    return g(CC)\n"
    g = SourceGraph({"m": src, "c": SRC_C})
    assert ("c", WHOLE) in g.closure("m", "f")


def test_import_block_changes_move_digest():
    # swapping an EXTERNAL alias target can change semantics without
    # changing any reachable def's body — the import block hash covers it
    g1 = _graph()
    g2 = _graph(a=SRC_A.replace("import os", "import posixpath as os"))
    assert g1.digest("a", "other") != g2.digest("a", "other")


def test_registry_external_alias_swap_moves_digest_internal_noise_does_not():
    """ADVICE r8 (introspect.py digest soundness gap): plans/registry.py
    contributes ONLY its external import lines — so a per-round registry
    edit that appends package-internal imports moves nothing, while
    repointing an external binding (the alias-swap hole) flags every
    key that can reach registry code."""
    reg = '''\
import os
from .b import helper


def regkey(x):
    return helper(os.sep + str(x))
'''
    def graph(reg_src):
        return SourceGraph({"plans.registry": reg_src, "plans": "",
                            "plans.b": SRC_B, "b": SRC_B})
    # the registry module must resolve .b relative to plans/
    g1 = graph(reg)
    base = g1.digest("plans.registry", "regkey")
    # appending an INTERNAL import (per-round key-adding churn): no move
    g2 = graph(reg.replace("from .b import helper",
                           "from .b import helper\nfrom . import b as BB"))
    assert g2.digest("plans.registry", "regkey") == base
    # swapping the EXTERNAL binding: must move
    g3 = graph(reg.replace("import os", "import posixpath as os"))
    assert g3.digest("plans.registry", "regkey") != base


def test_real_package_stream_keys_are_covered_and_independent():
    from tripgogo_vector_search_spark.plans import registry
    g = package_graph()

    def closure_of(key):
        fn = _unwrap(registry.QUERIES[key])
        mod = fn.__module__.split("tripgogo_vector_search_spark.")[-1]
        return g.closure(mod, fn.__name__), fn

    # soundness: the probe logic in operators/dedup.py and the minhash
    # kernel are IN stream_minhash_probe's closure (the r7 scheme's hole)
    c_probe, fn_probe = closure_of("stream_minhash_probe")
    assert ("operators.dedup", "minhash_probe") in c_probe
    assert ("operators.dedup", "minhash_bands") in c_probe
    assert ("functions.kernels", "minhash_signature_udf") in c_probe
    # precision: the plain window agg does not reach dedup at all
    c_wagg, fn_wagg = closure_of("stream_window_agg")
    assert not {m for m, _ in c_wagg} & {"operators.dedup",
                                         "functions.kernels"}
    # no degraded whole-module coverage anywhere in the stream closures:
    # every reference in the real package resolves to a named definition
    for key in [k for k in registry.QUERIES if k.startswith("stream_")]:
        c, _fn = closure_of(key)
        degraded = sorted(m for m, n in c if n == WHOLE)
        assert not degraded, (key, degraded)
    # distinct reachable sets -> distinct digests
    assert (g.digest_for_function(fn_probe)
            != g.digest_for_function(fn_wagg))


# ---------------------------------------------------------------------------
# Property: on ARBITRARY module/reference graphs, the digest moves iff
# the edited definition is reachable — checked against an independent
# ground-truth BFS over the generating structure, not the AST.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def _module_graphs(draw):
    n_mods = draw(st.integers(2, 3))
    n_defs = [draw(st.integers(2, 4)) for _ in range(n_mods)]
    all_defs = [(m, f"d{m}_{k}") for m in range(n_mods)
                for k in range(n_defs[m])]
    refs = {}
    for sym in all_defs:
        others = [s for s in all_defs if s != sym]
        refs[sym] = draw(st.sets(st.sampled_from(others), max_size=3))
    target = draw(st.sampled_from(all_defs))
    edited = draw(st.sampled_from(all_defs))
    return n_mods, all_defs, refs, target, edited


def _render(n_mods, all_defs, refs, bump):
    """Generate module sources; `bump` maps a symbol to a literal
    offset so a 'source edit' is a one-literal change."""
    sources = {}
    for m in range(n_mods):
        lines = []
        mine = [s for s in all_defs if s[0] == m]
        foreign = sorted({r for s in mine for r in refs[s] if r[0] != m})
        for fm, fd in foreign:
            lines.append(f"from .m{fm} import {fd}")
        for _, name in mine:
            body = " + ".join([str(100 + bump.get((m, name), 0))]
                              + [d for _, d in sorted(refs[(m, name)])])
            lines.append(f"def {name}(arg):\n    return {body}")
        sources[f"m{m}"] = "\n".join(lines) + "\n"
    return sources


def _truth_closure(refs, seed):
    seen, todo = set(), [seed]
    while todo:
        s = todo.pop()
        if s in seen:
            continue
        seen.add(s)
        todo.extend(refs[s])
    return seen


@settings(max_examples=60, deadline=None)
@given(_module_graphs())
def test_digest_moves_iff_edit_is_reachable(case):
    n_mods, all_defs, refs, target, edited = case
    g1 = SourceGraph(_render(n_mods, all_defs, refs, {}))
    g2 = SourceGraph(_render(n_mods, all_defs, refs, {edited: 1}))
    tmod, tname = f"m{target[0]}", target[1]
    truth = _truth_closure(refs, target)
    # closure symbol set matches the independent ground truth exactly
    got = {s for s in g1.closure(tmod, tname) if s[1] != WHOLE}
    assert got == {(f"m{m}", d) for m, d in truth}
    moved = g1.digest(tmod, tname) != g2.digest(tmod, tname)
    if edited in truth:
        assert moved, (target, edited, "reachable edit must move digest")
    else:
        # a def-body literal bump never touches import lines, so the
        # only way an unreachable edit could move the digest is a
        # resolution bug pulling the def into the closure
        assert not moved, (target, edited, "unreachable edit moved digest")


def test_digest_for_unknown_callable_fails_loud():
    """A digest over an empty closure would be a fingerprint that never
    moves — the gate must refuse, not silently accept."""
    import pytest
    with pytest.raises(ValueError):
        package_graph().digest_for_function(os.path.join)


def test_index_reader_fingerprints_chain_to_builder_digest(spark):
    """A key that reads a materialized index must carry the index's
    source-versioned leaf in its fingerprint text: the leaf digest is
    the builder's closure digest, so (with
    test_digest_moves_iff_edit_is_reachable) a builder/kernel edit
    moves every reader's fingerprint. Without the INDEXES line the
    optimized plan shows only `Relation [...] parquet` — the index
    would rebuild under a new leaf and the readers' evidence would
    stay green over changed results."""
    import re

    from tools.plan_manifest import plan_text

    txt = plan_text(spark, "minhash_dedup")
    assert re.search(r"INDEXES .*minhash_band_index-[0-9a-f]{8}", txt)
    txt2 = plan_text(spark, "ann_lsh")
    assert re.search(r"INDEXES .*ann_lsh_index-[0-9a-f]{8}", txt2)
    # a key with no materialized index gets no INDEXES line
    assert "INDEXES" not in plan_text(spark, "filtered_knn")


def test_simulated_dedup_edit_flags_exactly_the_reaching_keys():
    """End-to-end mutation check on the REAL package: rebuild the
    source graph with operators/dedup.py edited and verify the digest
    moves for precisely the callables whose closure reaches that
    module — the stream keys that probe the band index and the
    band-index BUILDER (whose digest is the readers' cache-leaf
    version), and for nothing else."""
    from tripgogo_vector_search_spark.operators.ann import (
        materialize_lsh_index)
    from tripgogo_vector_search_spark.operators.dedup import minhash_bands
    from tripgogo_vector_search_spark.plans import registry

    g1 = package_graph()
    sources = {m: info.source for m, info in g1._mods.items()}
    # edit the BODY of minhash_bands (an APPENDED unused definition
    # correctly moves nothing — per-def precision)
    marker = "rows_per_band = num_hashes // bands"
    assert marker in sources["operators.dedup"]
    sources["operators.dedup"] = sources["operators.dedup"].replace(
        marker, marker + "  # edited")
    g2 = SourceGraph(sources)

    def moved(fn):
        return g1.digest_for_function(fn) != g2.digest_for_function(fn)

    # the band-index builder's own digest moves -> every reader key's
    # cache leaf + INDEXES fingerprint line moves with it
    assert moved(minhash_bands)
    # an index builder that never touches dedup is unaffected
    assert not moved(materialize_lsh_index)
    # stream keys: flagged iff their closure includes the edited def
    for key in [k for k in registry.QUERIES if k.startswith("stream_")]:
        fn = _unwrap(registry.QUERIES[key])
        mod = fn.__module__.split("tripgogo_vector_search_spark.")[-1]
        reaches = (("operators.dedup", "minhash_bands")
                   in g1.closure(mod, fn.__name__))
        assert moved(fn) == reaches, (key, reaches)
    # and exactly one stream key reaches it — the probe
    probes = [k for k in registry.QUERIES if k.startswith("stream_")
              and moved(_unwrap(registry.QUERIES[k]))]
    assert probes == ["stream_minhash_probe"]
