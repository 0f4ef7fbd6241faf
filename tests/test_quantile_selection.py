"""Distributed exact quantile selection (operators/quantile.py) — the
r8 re-plan of the exact-quantile family (VERDICT r7 "What's wrong #1").

Contract: exact equality with the definitions the oracles use —
``quantiles_cont`` with ANSI PERCENTILE_CONT (== F.percentile's
interpolation at q*(n-1)), ``quantiles_disc`` with the value at rank
ceil(q*n) — verified against single-partition reference computations
on inputs small enough that those are safe, including tie-heavy and
single-value groups (the bucket-degenerate cases)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from tripgogo_vector_search_spark.operators.quantile import (
    grouped_order_statistics, quantiles_cont, quantiles_disc)

QS = [("q25", 0.25), ("q50", 0.50), ("q90", 0.90)]


def _ref_cont(vals: list[float], q: float) -> float:
    s = sorted(vals)
    pos = q * (len(s) - 1)
    lo, hi = s[math.floor(pos)], s[math.ceil(pos)]
    return lo + (pos - math.floor(pos)) * (hi - lo)


def _ref_disc(vals: list[float], q: float) -> float:
    s = sorted(vals)
    return s[max(math.ceil(q * len(s)), 1) - 1]


def _cases():
    rng = random.Random(3)
    yield "uniform", [(i % 4, rng.uniform(-100, 100)) for i in range(500)]
    # tie-heavy: many equal values, including across decile boundaries
    yield "ties", [(i % 3, float(rng.randint(0, 5))) for i in range(300)]
    # point mass: one group entirely a single value (mn == mx)
    yield "pointmass", ([(0, 42.0)] * 50
                        + [(1, rng.uniform(0, 1)) for _ in range(60)])
    # tiny groups: n == 1 and n == 2
    yield "tiny", [(0, 7.5), (1, 1.0), (1, 2.0)]


@pytest.mark.parametrize("label,rows", list(_cases()))
def test_cont_matches_reference(spark, label, rows):
    df = spark.createDataFrame(rows, "grp int, v double").repartition(8)
    got = {r["grp"]: tuple(r[name] for name, _ in QS)
           for r in quantiles_cont(df, ["grp"], "v", QS).collect()}
    by_grp: dict[int, list[float]] = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    for g, vals in by_grp.items():
        want = tuple(_ref_cont(vals, q) for _, q in QS)
        assert got[g] == pytest.approx(want, abs=1e-12), (label, g)


@pytest.mark.parametrize("label,rows", list(_cases()))
def test_disc_matches_reference(spark, label, rows):
    df = spark.createDataFrame(rows, "grp int, v double").repartition(8)
    got = {r["grp"]: tuple(r[name] for name, _ in QS)
           for r in quantiles_disc(df, ["grp"], "v", QS).collect()}
    by_grp: dict[int, list[float]] = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    for g, vals in by_grp.items():
        want = tuple(_ref_disc(vals, q) for _, q in QS)
        assert got[g] == want, (label, g)


def test_cont_matches_spark_percentile(spark):
    """Same interpolation as the F.percentile aggregate this operator
    replaced in median_agg (so the oracle contract is unchanged)."""
    rng = random.Random(9)
    rows = [(i % 3, rng.uniform(0, 1000)) for i in range(400)]
    df = spark.createDataFrame(rows, "grp int, v double")
    got = {r["grp"]: (r["q50"], r["q90"]) for r in
           quantiles_cont(df, ["grp"], "v",
                          [("q50", 0.5), ("q90", 0.9)]).collect()}
    want = {r["grp"]: (r["p"][0], r["p"][1]) for r in
            df.groupBy("grp")
            .agg(F.percentile("v", F.array(F.lit(0.5), F.lit(0.9)))
                 .alias("p")).collect()}
    for g in want:
        assert got[g] == pytest.approx(want[g], abs=1e-9)


def test_disc_preserves_decimal_type(spark):
    df = spark.createDataFrame([(0, i) for i in range(10)],
                               "grp int, v bigint") \
        .select("grp", F.col("v").cast("decimal(12,2)").alias("v"))
    out = quantiles_disc(df, ["grp"], "v", [("q50", 0.5)])
    assert dict(out.dtypes)["q50"] == "decimal(12,2)"
    assert out.collect()[0]["q50"] == 4  # rank ceil(0.5*10)=5 -> value 4.00


@pytest.mark.parametrize("nb", [1, 2, 7])
def test_bucket_count_invariance(spark, nb):
    """The selection must be exact for ANY bucket count — tiny B
    forces many distinct values per bucket, stressing the in-bucket
    value-histogram cumulative ranks (with the default B ≈ shuffle
    partitions, most test buckets hold 0-2 values and that path
    barely runs). B=1 degenerates to a single whole-group histogram."""
    rng = random.Random(17)
    rows = [(i % 4, rng.uniform(-10, 10)) for i in range(300)]
    # ties across groups too
    rows += [(i % 4, float(rng.randint(-3, 3))) for i in range(100)]
    df = spark.createDataFrame(rows, "grp int, v double").repartition(8)
    by_grp: dict[int, list[float]] = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    got_c = {r["grp"]: tuple(r[name] for name, _ in QS) for r in
             quantiles_cont(df, ["grp"], "v", QS, num_buckets=nb)
             .collect()}
    got_d = {r["grp"]: tuple(r[name] for name, _ in QS) for r in
             quantiles_disc(df, ["grp"], "v", QS, num_buckets=nb)
             .collect()}
    for g, vals in by_grp.items():
        assert got_c[g] == pytest.approx(
            tuple(_ref_cont(vals, q) for _, q in QS), abs=1e-12), (nb, g)
        assert got_d[g] == tuple(_ref_disc(vals, q) for _, q in QS), (nb, g)


def test_quantiles_leave_nothing_cached(spark):
    spark.catalog.clearCache()
    df = spark.createDataFrame([(i % 2, float(i)) for i in range(100)],
                               "grp int, v double")
    quantiles_cont(df, ["grp"], "v", [("q50", 0.5)]).collect()
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty()


# ---------------------------------------------------------------------------
# property-based: arbitrary value sets vs the python reference
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# values drawn from a small integer lattice TIMES a float jitter set:
# guarantees heavy ties AND near-continuous values in the same frame,
# plus negative/zero/identical-group corners
_VALS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),
              st.one_of(st.integers(min_value=-5, max_value=5)
                        .map(float),
                        st.floats(min_value=-100.0, max_value=100.0,
                                  allow_nan=False, allow_infinity=False,
                                  width=32))),
    min_size=1, max_size=60)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_VALS, q=st.sampled_from([0.0, 0.01, 0.25, 0.5, 0.9, 1.0]))
def test_property_selection_matches_reference(spark, rows, q):
    df = spark.createDataFrame(rows, "grp int, v double").repartition(4)
    by_grp: dict[int, list[float]] = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    got_c = {r["grp"]: r["qq"] for r in
             quantiles_cont(df, ["grp"], "v", [("qq", q)],
                            num_buckets=5).collect()}
    got_d = {r["grp"]: r["qq"] for r in
             quantiles_disc(df, ["grp"], "v", [("qq", q)],
                            num_buckets=5).collect()}
    for g, vals in by_grp.items():
        assert got_c[g] == pytest.approx(_ref_cont(vals, q),
                                         abs=1e-9), ("cont", g, vals)
        assert got_d[g] == _ref_disc(vals, q), ("disc", g, vals)


def test_split_cell_selection_exact(spark):
    """r10 path, split branch forced: a tight cluster of DISTINCT
    values (1e-5 relative spread — inside one ~0.1%-relative fine
    cell) overfills its cell, so the owning-cell probe must refine
    through the min/max-snapped sub-cell split (_sub > 0) and still
    pick the exact order statistics. A spread group rides along to
    keep the stats frame heterogeneous."""
    rng = random.Random(9)
    rows = ([(0, 1e9 * (1.0 + k * 1e-8)) for k in range(2000)]
            + [(1, rng.uniform(0, 1000)) for _ in range(100)])
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "grp int, v double").repartition(8)
    got = {r["grp"]: tuple(r[name] for name, _ in QS)
           for r in quantiles_cont(df, ["grp"], "v", QS).collect()}
    by_grp: dict[int, list[float]] = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    for g, vals in by_grp.items():
        want = tuple(_ref_cont(vals, q) for _, q in QS)
        assert got[g] == pytest.approx(want, rel=1e-12), g


def test_tiny_negative_sliver_quantiles_exact(spark):
    """ADVICE r9 regression through the QUANTILE path: values in
    (-5.6e-17, 0) hit the frac(t) == 1.0 rounding, so without the
    clamp their fine-cell id would overflow into the next e-fold
    cell's slot and the owning-cell offsets would disorder. Exact
    disc/cont selection across the negative/non-negative boundary."""
    vals = [-k * 2.5e-20 for k in range(1, 1001)] + \
           [k * 0.001 for k in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "v double") \
        .repartition(8)
    qs = [("q10", 0.10), ("q50", 0.50), ("q95", 0.95)]
    got = quantiles_disc(df, [], "v", qs).collect()[0]
    for name, q in qs:
        assert got[name] == _ref_disc(vals, q), (name, got[name])
    gotc = quantiles_cont(df, [], "v", qs).collect()[0]
    for name, q in qs:
        assert gotc[name] == pytest.approx(_ref_cont(vals, q),
                                           abs=1e-18), name


def test_quantile_runtime_two_scans_one_reuse(spark):
    """r10 plan economics, pinned on the EXECUTED plan: the selection
    reads the source exactly twice — the stats pass and the probe pass
    — and AQE collapses the probe's duplicated lineage (the sub-cell
    totals branch and the value-pick branch both derive from the same
    histogram) into a ReusedExchange. If this regresses, the plan pays
    the r9 shape's extra corpus aggregate or an additional scan."""
    rng = random.Random(4)
    df = spark.createDataFrame(
        [(i % 3, rng.uniform(0, 1000.0)) for i in range(4000)],
        "grp int, v double").repartition(8)
    out = quantiles_cont(df, ["grp"], "v", QS)
    out.collect()
    final = (out._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert "isFinalPlan=true" in final
    scans = [ln for ln in final.splitlines()
             if "Scan ExistingRDD" in ln or "LocalTableScan" in ln]
    assert len(scans) <= 2, final
    assert "ReusedExchange" in final, final


def test_weighted_grid_equals_exploded_rows(spark):
    """r12 `weight_col`: order statistics over a (value, count)
    histogram must equal the unweighted grid over the exploded rows —
    the multiset-expansion contract ccnet_ppl_buckets relies on.
    Mixed magnitudes, point masses, and a heavy-multiplicity value
    exercise the cell/sub-cell paths."""
    rng = random.Random(7)
    hist = [(round(rng.uniform(0.1, 40.0), 3), rng.randrange(1, 9))
            for _ in range(60)]
    hist += [(7.777, 500), (0.004, 3), (39999.5, 2)]   # mass + outlier
    h = spark.createDataFrame(hist, "v double, cnt bigint")
    rows = spark.createDataFrame(
        [(v,) for v, c in hist for _ in range(c)], "v double")
    qs = [("p10", 0.1), ("t1", 1 / 3), ("med", 0.5), ("p95", 0.95)]
    got_w = {r["_tag"]: (r["_v"], r["_n"]) for r in
             grouped_order_statistics(h, [], "v", qs, mode="disc",
                                      weight_col="cnt").collect()}
    got_u = {r["_tag"]: (r["_v"], r["_n"]) for r in
             grouped_order_statistics(rows, [], "v", qs,
                                      mode="disc").collect()}
    assert got_w == got_u
    # and both equal the plain-Python rank-at-ceil(q*n) definition
    flat = sorted(v for v, c in hist for _ in range(c))
    n = len(flat)
    for name, q in qs:
        rk = max(math.ceil(q * n), 1)
        assert got_w[name] == (flat[rk - 1], n), name
