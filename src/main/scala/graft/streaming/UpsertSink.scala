package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Packing

/** Streaming upsert — "MERGE INTO the serving table" for a keyed stream:
  * each micro-batch unions with the current snapshot, keeps the latest row
  * per key ([[Packing.latestPerKey]] — deterministic total order), and
  * atomically swaps in a new snapshot version. `foreachBatch` runs batches
  * serially with exactly-once semantics per batch id, so the
  * read-merge-swap sequence needs no further locking; a replayed batch
  * (restart after the write, before the checkpoint commit) rewrites the
  * same version directory idempotently.
  *
  * Scale honesty: plain parquet has no ACID metadata, so the snapshot is
  * REWRITTEN per merge — the dependency-free semantics statement. On a
  * production lake the same `latestPerKey` compaction rides an ACID table
  * format's MERGE, which rewrites only the files containing touched keys;
  * with a directory-partitioned snapshot this implementation too rewrites
  * only touched partitions if callers pre-filter. The versioned-directory +
  * marker-file swap means readers never observe a half-written snapshot:
  * they resolve `_CURRENT` (one small file, atomically replaced) to a
  * fully-written immutable directory.
  */
object UpsertSink {

  private def markerPath(tableDir: String) = Paths.get(tableDir, "_CURRENT")

  /** The current snapshot, or None before the first commit. */
  def readSnapshot(spark: SparkSession, tableDir: String): Option[DataFrame] = {
    val m = markerPath(tableDir)
    if (Files.exists(m))
      Some(spark.read.parquet(
        s"$tableDir/${new String(Files.readAllBytes(m), UTF_8).trim}"))
    else None
  }

  /** Run the streaming upsert to completion over a bounded source
    * (`AvailableNow`); long-running deployments pass a processing-time
    * trigger instead via `trigger`. */
  def upsertToParquet(stream: DataFrame, tableDir: String,
      checkpointDir: String, keyCols: Seq[String], orderCols: Seq[String],
      trigger: Trigger = Trigger.AvailableNow()): Unit = {
    Files.createDirectories(Paths.get(tableDir))
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val version = s"v$batchId"
        val m = markerPath(tableDir)
        // Replay guard: the marker is written strictly AFTER the version
        // directory is complete, so marker == v$batchId proves this batch
        // already committed (crash landed between marker write and
        // checkpoint commit). Re-running the merge would overwrite the
        // very directory the snapshot read resolves to — Spark refuses
        // ("Cannot overwrite a path that is also being read from").
        // Skipping is the idempotent replay.
        val alreadyCommitted = Files.exists(m) &&
          new String(Files.readAllBytes(m), UTF_8).trim == version
        if (!alreadyCommitted && !batch.isEmpty) {
          val spark = batch.sparkSession
          val unioned = readSnapshot(spark, tableDir)
            .map(_.unionByName(batch)).getOrElse(batch)
          Packing.latestPerKey(unioned, keyCols, orderCols)
            .write.mode("overwrite").parquet(s"$tableDir/$version")
          // swap AFTER the full write: readers resolve the marker to an
          // immutable, complete directory or the previous one — never a
          // partial write
          Files.write(m, version.getBytes(UTF_8))
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming incremental view maintenance for a JOIN-view aggregate
    * ([[graft.operators.Cdc.signedJoinAgg]] made continuous): the input
    * is a CDC stream of SIGNED fact rows (insert +1, delete −1; an update
    * = delete ⊕ insert), `dim` is the static/broadcast side, and the
    * maintained state is the per-group `(n, sum)` of `fact ⋈ dim`.
    *
    * Each micro-batch computes `signedJoinAgg(batch, dim)` — cost ∝ batch
    * size, never the accumulated fact — adds it onto the snapshot's exact
    * long/decimal state, drops groups whose `n` reaches 0, and commits
    * through the same versioned-directory + marker swap (and replay
    * guard) as [[upsertToParquet]]. The snapshot is group-cardinality
    * sized, so the rewrite-per-batch is small regardless of stream
    * volume. State columns: `groupCols`, `n` (long), `sum`
    * (decimal(18,2) — bit-exact, subtractable).
    *
    * Ordering contract: deltas must arrive in commit order (a delete
    * never precedes its insert) — which ordered CDC sources provide and
    * foreachBatch's serial batches preserve; then `n` never goes
    * negative and the `n > 0` drop is exactly "group vanished". */
  def maintainJoinAggToParquet(stream: DataFrame, dim: DataFrame,
      key: String, groupCols: Seq[String], value: String, tableDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): Unit = {
    import org.apache.spark.sql.functions._
    Files.createDirectories(Paths.get(tableDir))
    val dimSigned = dim.withColumn("sign", lit(1))
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val version = s"v$batchId"
        val m = markerPath(tableDir)
        val alreadyCommitted = Files.exists(m) &&
          new String(Files.readAllBytes(m), UTF_8).trim == version
        if (!alreadyCommitted && !batch.isEmpty) {
          val spark = batch.sparkSession
          val delta = graft.operators.Cdc.signedJoinAgg(batch, dimSigned,
              key, groupCols, col(value))
            .select(groupCols.map(col) :+ col("dn").as("n") :+
              col("dsum").as("sum"): _*)
          val merged = readSnapshot(spark, tableDir)
            .map(_.unionByName(delta)).getOrElse(delta)
            .groupBy(groupCols.map(col): _*)
            .agg(sum(col("n")).as("n"),
              sum(col("sum")).cast("decimal(18,2)").as("sum"))
            .filter(col("n") > 0)
          merged.write.mode("overwrite").parquet(s"$tableDir/$version")
          Files.write(m, version.getBytes(UTF_8))
        }
        ()
      }
      .start()
    q.awaitTermination()
  }
}
