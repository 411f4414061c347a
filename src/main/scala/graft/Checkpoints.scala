package graft

import org.apache.spark.sql.DataFrame

/** Deterministic release of LOCALLY-CHECKPOINTED frames.
  *
  * `Dataset.unpersist` routes to the CacheManager, which only tracks
  * `persist()/cache()` entries — it silently NO-OPS on the storage blocks
  * a `localCheckpoint` materialized. Those blocks are otherwise freed only
  * when a driver GC lets the ContextCleaner observe the RDD as
  * unreachable, which on a large-heap driver can be arbitrarily late — a
  * long session stacks every retired staging frame in executor
  * memory-and-disk until then (measured in the round-12 bench forensics:
  * the pressure taxed every later operator). [[release]] frees the blocks
  * NOW by unpersisting the `LogicalRDD` leaves' underlying RDDs.
  *
  * CALLER CONTRACT: every consumer of the frame — and of anything derived
  * from it — must already be materialized. A released local checkpoint
  * cannot be recomputed (checkpointing truncated its lineage), so a later
  * read fails with a missing-block error: release is for frames that are
  * provably dead, exactly like `free()`.
  */
object Checkpoints {
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }
}
