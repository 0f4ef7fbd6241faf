"""VERDICT r7 "What's wrong #3": no registry query may leave frames
cached after its action completes. The r7 tree had three leak sites —
with_global_rank's persisted range frame, quality_by_length_decile's
bounds persist, and connected_components returning its final cached
label frame — all removed in r8 (deterministic bucket rank /
ReuseExchange / eager localCheckpoint). This pins the contract on the
exact keys that used to leak, via the cache manager itself."""

from __future__ import annotations

import pytest

from tripgogo_vector_search_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"

# the former leak sites plus one representative per family that builds
# on them (rank: ntile_bands/orders_rfm; quantile selection:
# median_agg/quartile_agg; histogram bounds: quality_by_length_decile;
# connected components: dedup_components)
FORMER_LEAKERS = ["ntile_bands", "orders_rfm", "median_agg",
                  "quartile_agg", "quality_by_length_decile",
                  "dedup_components"]


@pytest.mark.parametrize("name", FORMER_LEAKERS)
def test_query_leaves_nothing_cached(spark, name):
    spark.catalog.clearCache()
    QUERIES[name](spark, SF).collect()
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty(), (
        f"{name} left a frame cached after its action completed — "
        "a long-lived pipeline composing registry queries would leak "
        "executor storage")
