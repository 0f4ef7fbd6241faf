"""Scoped lifecycle for per-run eager localCheckpoints (ADVICE r16 #1).

Some builders materialize an intermediate ONCE PER RUN with an eager
``localCheckpoint`` (quality_gate's scored projection, the quantile
family's celled value histogram). The blocks live OUTSIDE the cache
manager, so the sweep's cache gate cannot see them, and without help
they are only released when the driver's periodic GC lets the
ContextCleaner's weak references fire — so a bench min-of-N loop or a
test suite accumulates one superseded frame per rebuild in the
meantime.

This module makes the release deterministic for the common lifecycle
(build -> act -> drop -> rebuild) without ever breaking a frame a
caller still holds:

* ``checkpoint_tracked(df, scope)`` performs the eager localCheckpoint
  and records the resulting RDD id under the caller-chosen scope
  (builders pass their registry key). ``scope=None`` is a plain
  untracked checkpoint — what direct operator-level callers get.
* ``adopt(scope, result)`` — called by the registry builder on its
  FINAL DataFrame — claims the scope's pending ids and supersedes the
  scope's previous build: the previous build's checkpoint blocks are
  unpersisted iff its result DataFrame has been garbage-collected
  (weakref dead — the caller provably cannot recompute through those
  blocks anymore). If the previous result is still alive (a harness
  holding two builds of one key), release defers to the
  ContextCleaner exactly as before.

Only RDD ids are retained (looked up in ``getPersistentRDDs`` at
release time), never py4j object references — holding those would pin
the JVM objects and defeat the ContextCleaner path for the final
build of a session.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

# scope -> checkpoint RDD ids created by the build in flight
_PENDING: dict[str, list[int]] = {}
# scope -> (checkpoint RDD ids of the last adopted build, weakref to
# its result DataFrame)
_LIVE: dict[str, tuple[list[int], weakref.ref]] = {}


def checkpoint_tracked(df: DataFrame, scope: str | None) -> DataFrame:
    """Eager localCheckpoint, registered under ``scope`` so a later
    rebuild of the same scope can release its blocks deterministically
    (``adopt``). On a long-lived cluster swap for a reliable checkpoint
    / persisted table (executor-local blocks are not fault-tolerant;
    same caveat and escape as operators/dedup._checkpoint)."""
    out = df.localCheckpoint(eager=True)
    if scope is not None:
        try:
            _PENDING.setdefault(scope, []).append(
                out._jdf.queryExecution().analyzed().rdd().id())
        except Exception:  # noqa: BLE001 - tracking is best-effort
            pass
    return out


def _release(spark, ids: list[int]) -> None:
    """Unpersist still-persistent checkpoint RDDs by id; ids whose
    blocks the ContextCleaner already freed simply aren't in the map."""
    for rid in ids:
        try:
            jrdd = spark.sparkContext._jsc.getPersistentRDDs().get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
        except Exception:  # noqa: BLE001 - release is best-effort
            pass


def adopt(scope: str, result: DataFrame) -> DataFrame:
    """Attach ``scope``'s pending checkpoints to ``result``'s lifetime:
    the next ``adopt`` of the same scope releases these blocks iff this
    ``result`` has been garbage-collected by then. Builders call this
    on the final frame they return; passing the result through keeps
    the call a one-line wrap of the return expression."""
    ids = _PENDING.pop(scope, [])
    if not ids:
        return result
    spark = result.sparkSession
    prev = _LIVE.pop(scope, None)
    if prev is not None:
        pids, ref = prev
        if ref() is None:
            _release(spark, pids)
    _LIVE[scope] = (ids, weakref.ref(result))
    return result
