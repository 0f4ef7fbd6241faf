"""Temporal operators Spark lacks natively: sessionization and as-of join.

Both are single-window designs (no pair blow-up):

* **sessionize** — lag() gap detection + running sum of session starts.
  One shuffle on the entity key; state is one row per event.
* **asof_join** — the sorted-union trick: union left (probe) and right
  (reference) rows, window-scan per key ordered by time with the
  reference rows sorted first at equal timestamps, and carry the last
  reference value forward. One shuffle total — no range join, no
  per-key quadratic pairing, so it survives hot keys at 100 TB.
  (`pd.merge_asof` via applyInPandas is the per-group alternative when
  custom tolerance/direction logic is needed.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_minutes: int = 30) -> DataFrame:
    """Per-user session counts: a new session starts when the gap from
    the previous event exceeds `gap_minutes`."""
    w = W.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(ts_col).over(w)
    new_s = F.when(prev.isNull()
                   | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_us),
                   1).otherwise(0)
    return (events.withColumn("new_s", new_s)
            .groupBy(user_col)
            .agg(F.sum("new_s").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))


def asof_join(probe: DataFrame, reference: DataFrame, key: str, ts_col: str,
              probe_cols: list[str], ref_ts_as: str = "asof_ts") -> DataFrame:
    """For each probe row, the latest reference timestamp at or before its
    own (per key); NULL when none precedes it."""
    p = probe.select(F.col(key), F.col(ts_col), F.lit(0).alias("_is_ref"),
                     *[F.col(c) for c in probe_cols])
    r = reference.select(F.col(key), F.col(ts_col), F.lit(1).alias("_is_ref"),
                         *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
                           for c in probe_cols])
    u = p.unionByName(r)
    # reference rows sort first at equal ts => "at or before" semantics
    w = (W.partitionBy(key)
         .orderBy(F.col(ts_col).asc(), F.col("_is_ref").desc())
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    carried = u.withColumn(
        ref_ts_as, F.max(F.when(F.col("_is_ref") == 1, F.col(ts_col))).over(w))
    return carried.filter(F.col("_is_ref") == 0).select(*probe_cols, ref_ts_as)
