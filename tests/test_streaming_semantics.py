"""Streaming semantics under late data: once the watermark has closed and
emitted a window, a straggler for that window must be DROPPED — the
property that bounds state at 100 TB (without it every window lives
forever) and keeps append-mode output exactly-once.

The file source is driven one file per micro-batch (maxFilesPerTrigger=1,
mtime-ordered), so the watermark advances between batches exactly like a
live stream. Note the flip side, also pinned here: a row that is "late"
but arrives in the SAME batch that finalizes its window still counts —
Spark drops rows only for windows already evicted from state.
"""

from __future__ import annotations

import os
import time
from datetime import datetime

from tripgogo_vector_search_spark.streaming.ingest import windowed_event_agg

SCHEMA = "ts timestamp, event_type string, value double"


def _write_batch(spark, path: str, rows: list, mtime: float) -> None:
    rows = [(datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), et, v)
            for ts, et, v in rows]
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))


def test_drop_duplicates_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark — the scale-correct streaming dedup:
    a duplicate key arriving within the watermark horizon is suppressed,
    but once the watermark passes the first occurrence's expiry its state
    entry is EVICTED, so a much-later re-occurrence emits again. That
    re-emission is precisely the bounded-state trade: per-key state lives
    O(watermark), not O(stream), which is what survives an unbounded
    100 TB stream (the plain dropDuplicates variant keeps state forever)."""
    base = str(tmp_path / "dd")
    os.makedirs(base)
    t0 = time.time()
    # batch 0: first A -> emitted; watermark after = 09:50
    _write_batch(spark, os.path.join(base, "f1"),
                 [("2024-01-01 10:00:00", "A", 1.0)], t0 - 100)
    # batch 1: duplicate A within horizon -> suppressed; B emitted;
    # watermark after = 10:20 (past A's 10:00+10min expiry)
    _write_batch(spark, os.path.join(base, "f2"),
                 [("2024-01-01 10:01:00", "A", 2.0),
                  ("2024-01-01 10:30:00", "B", 3.0)], t0 - 75)
    # batch 2: A at 11:00. Subtle but pinned: state eviction runs at
    # batch END, so even though A's entry is past expiry under this
    # batch's watermark (10:20 > 10:10), the still-present entry
    # suppresses this record; eviction then removes it. Watermark -> 10:50.
    _write_batch(spark, os.path.join(base, "f3"),
                 [("2024-01-01 11:00:00", "A", 4.0)], t0 - 50)
    # batch 3: A again — state was evicted at the end of batch 2, so this
    # re-occurrence emits: per-key state lives O(watermark), not O(stream).
    _write_batch(spark, os.path.join(base, "f4"),
                 [("2024-01-01 11:30:00", "A", 5.0)], t0 - 25)

    src = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1)
           .parquet(os.path.join(base, "*")))
    dedup = (src.withWatermark("ts", "10 minutes")
             .dropDuplicatesWithinWatermark(["event_type"]))
    q = (dedup.writeStream.outputMode("append")
         .format("memory").queryName("ddw_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted((r.event_type, str(r.ts), r.value)
                 for r in spark.table("ddw_out").collect())
    assert got == [("A", "2024-01-01 10:00:00", 1.0),   # first occurrence
                   ("A", "2024-01-01 11:30:00", 5.0),   # post-eviction rerun
                   ("B", "2024-01-01 10:30:00", 3.0)]
    # the 10:01 dup (within horizon) and the 11:00 one (same batch as
    # eviction) were both suppressed: exactly 3 rows
    assert len(got) == 3


def test_watermark_drops_late_event(spark, tmp_path):
    base = str(tmp_path / "stream")
    os.makedirs(base)
    t0 = time.time()
    # batch 0: three events in the 10:00 window plus an 11:00 event ->
    # watermark after the batch = 11:00 - 10min = 10:50.
    _write_batch(spark, os.path.join(base, "f1"),
                 [("2024-01-01 10:01:00", "click", 1.0),
                  ("2024-01-01 10:04:00", "click", 2.0),
                  ("2024-01-01 10:07:00", "view", 3.0),
                  ("2024-01-01 11:00:00", "click", 4.0)], t0 - 100)
    # batch 1: processed under watermark 10:50 -> the 10:00 window
    # (end 10:10) is finalized, emitted, and evicted; watermark -> 11:50.
    _write_batch(spark, os.path.join(base, "f2"),
                 [("2024-01-01 12:00:00", "view", 5.0)], t0 - 50)
    # batch 2: a straggler for the already-emitted 10:00 window -> must
    # be dropped (never re-emitted, never a duplicate window row).
    _write_batch(spark, os.path.join(base, "f3"),
                 [("2024-01-01 10:03:00", "click", 100.0)], t0 - 10)

    src = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1)
           .parquet(os.path.join(base, "*")))
    agg = windowed_event_agg(src, window="10 minutes", watermark="10 minutes")
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName("wm_out").start())
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()

    rows = spark.table("wm_out").collect()
    got = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
           for r in rows}
    # the straggler's 100.0 is NOT in the 10:00 click window
    assert got[("2024-01-01 10:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 10:00:00", "view")] == (1, 3.0)
    # the 11:00 window closed when 12:00 advanced the watermark past it
    assert got[("2024-01-01 11:00:00", "click")] == (1, 4.0)
    # exactly one row per (window, type): no duplicate re-emission
    assert len(rows) == len(got) == 3
    # the 12:00 window never closed before end-of-stream: append mode
    # holds it in state, unemitted
    assert ("2024-01-01 12:00:00", "view") not in got
    # the engine itself accounted the drop
    dropped = sum(p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
                  for p in progress)
    assert dropped == 1


def test_stream_session_window_emission_boundary_is_nonstrict(spark,
                                                              tmp_path):
    """The stream_session_window oracle's closed-session filter
    (`s_end <= max(ts) - delay`), pinned against the ENGINE with a
    constructed tie: with final watermark exactly 10:30:00, a session
    ending exactly 10:30:00 EMITS in append mode, one ending 1us later
    does not (it is still open in state when the stream drains)."""
    from pyspark.sql import functions as F, types as T

    base = str(tmp_path / "swe")
    os.makedirs(base)
    t0 = time.time()
    sch = T.StructType([T.StructField("user_id", T.StringType()),
                        T.StructField("ts", T.TimestampType())])

    def write(name, rows, mtime):
        import datetime as dt
        df = spark.createDataFrame(
            [(u, dt.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S.%f"))
             for u, ts in rows], sch).coalesce(1)
        p = os.path.join(base, name)
        df.write.mode("overwrite").parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (mtime, mtime))

    # A's session ends 10:00:00 + 30min = 10:30:00 == final watermark;
    # B's ends 1us after it
    write("f1", [("A", "2024-01-01 10:00:00.000000"),
                 ("B", "2024-01-01 10:00:00.000001")], t0 - 100)
    write("f2", [("Z", "2024-01-01 11:00:00.000000")], t0 - 50)
    src = (spark.readStream.schema(sch)
           .option("maxFilesPerTrigger", 1).parquet(base + "/*"))
    s = (src.withWatermark("ts", "30 minutes")
         .groupBy(F.session_window("ts", "30 minutes"), "user_id")
         .agg(F.count(F.lit(1)).alias("n")))
    q = (s.writeStream.outputMode("append")
         .format("memory").queryName("swe_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = sorted(r.user_id for r in spark.table("swe_out").collect())
    assert emitted == ["A"]  # the tie emits; +1us stays open; Z open


def test_session_window_boundary_gap_merges(spark):
    """The session_window_agg oracle's island-break convention (> not
    >=), pinned against the ENGINE, not assumed: an event arriving
    EXACTLY the gap duration after its predecessor MERGES into the
    session (Spark extends a session window when next.ts <= prev.end);
    one microsecond later starts a new one."""
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00"), (1, "2026-01-01 00:30:00"),
         (2, "2026-01-01 00:00:00"), (2, "2026-01-01 00:30:00.000001")],
        "user_id bigint, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"))
    g = (ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
         .agg(F.count(F.lit(1)).alias("n")))
    per_user = {r["user_id"]: r["cnt"] for r in
                g.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
                .collect()}
    assert per_user == {1: 1, 2: 2}  # boundary merges; +1us splits
