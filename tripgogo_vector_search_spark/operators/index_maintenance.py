"""Partitioned-index maintenance: apply a retirement (evict) list to an
id-range-partitioned on-disk index by rewriting ONLY the partitions
that contain retired ids.

This is the missing EXECUTE half of the r8 incremental-refresh
protocol (VERDICT r8 "Next round" #4): `embed_evict_list` computes
which stored ids must go; this module actually removes them from a
persisted index without touching the partitions that carry no retired
rows — at 100 TB a full index rewrite per refresh is the difference
between a nightly job and an impossible one. Retirements cluster by
ingest batch in practice (ids are roughly time-ordered), so an
id-range partition key localizes them by construction.

Mechanics, all standard Spark:

* the evict set = stored ids LEFT ANTI the current corpus ids — one
  id-keyed join, co-partitionable with an id-bucketed store;
* survivor rows come from a join of the store against the BOUNDED
  affected-range frame — broadcast, so Spark's dynamic partition
  pruning skips every unaffected partition at the scan;
* the write uses ``partitionOverwriteMode=dynamic``: only partitions
  present in the survivor frame are replaced; untouched partitions'
  files are never rewritten (asserted byte-for-byte in
  tests/test_index_compact.py);
* a partition whose every row was retired produces NO survivor rows,
  so dynamic overwrite cannot touch it — those directories are removed
  explicitly from the driver (a bounded filesystem op over the
  affected-range list, not a data collect);
* survivors are eagerly local-checkpointed before the write because
  Spark refuses to overwrite a path its own input plan is reading;
  the checkpoint holds only the affected partitions' rows (bounded by
  the evict batch's range spread) and its blocks are released as soon
  as the write lands.

The routine is idempotent: a second run finds an empty evict set and
returns without writing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import _release_local_checkpoint


def compact_partitioned_store(spark: SparkSession, path: str,
                              current_ids: DataFrame, *,
                              id_col: str = "doc_id",
                              part_col: str = "id_range") -> dict:
    """Remove every row of the ``part_col``-partitioned parquet store at
    ``path`` whose ``id_col`` is absent from ``current_ids``, rewriting
    only affected partitions. Returns counters
    ``{"evicted_rows", "affected_partitions", "removed_partitions"}``
    (driver-side ints — all derived from bounded frames)."""
    import os
    import shutil

    store = spark.read.parquet(path)
    evict = (store.select(id_col, part_col)
             .join(current_ids.select(id_col), id_col, "left_anti"))
    # the affected-range frame is bounded by construction (ranges of
    # one retirement batch); collecting it is a metadata op that the
    # explicit directory removal below needs anyway
    by_range = {r[part_col]: r["n"] for r in
                evict.groupBy(part_col).agg(F.count(F.lit(1)).alias("n"))
                .collect()}
    if not by_range:
        return {"evicted_rows": 0, "affected_partitions": 0,
                "removed_partitions": 0}
    affected = spark.createDataFrame(
        [(k,) for k in sorted(by_range)], f"{part_col} bigint")
    # broadcast the bounded range frame -> dynamic partition pruning
    # keeps the survivor scan off every unaffected partition
    survivors = (store.join(F.broadcast(affected), part_col)
                 .join(current_ids.select(id_col), id_col, "left_semi")
                 .localCheckpoint(eager=True))
    surviving_ranges = {r[part_col] for r in
                        survivors.select(part_col).distinct().collect()}
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, None)
    try:
        spark.conf.set(mode_key, "dynamic")
        if surviving_ranges:
            (survivors.write.mode("overwrite")
             .partitionBy(part_col).parquet(path))
    finally:
        if prev is None:
            spark.conf.unset(mode_key)
        else:
            spark.conf.set(mode_key, prev)
        _release_local_checkpoint(survivors)
    removed = 0
    for rng in sorted(set(by_range) - surviving_ranges):
        # fully-retired partition: dynamic overwrite wrote no rows for
        # it, so its stale files must go explicitly
        part_dir = os.path.join(path, f"{part_col}={rng}")
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
            removed += 1
    return {"evicted_rows": int(sum(by_range.values())),
            "affected_partitions": len(by_range),
            "removed_partitions": removed}
