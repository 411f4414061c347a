package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Ann

/** Streaming ingest into a persisted IVF index — the serving-store twin
  * of [[graft.streaming.StreamingCuration]]: embedding vectors arrive as
  * a stream (crawl drops, re-embeddings) and land in the
  * [[Ann.buildIvfIndex]] layout incrementally, so ANN search serves
  * old ∪ new with the same directory-level pruning after every batch.
  *
  * Per micro-batch:
  *   - an EMPTY batch (possible with some sources/triggers) is skipped
  *     outright — training on zero rows would either crash the stream or
  *     permanently bake degenerate centroids into the persisted index;
  *     the first NON-EMPTY batch trains;
  *   - first (non-empty) batch against an empty path TRAINS the index
  *     ([[Ann.buildIvfIndex]] — centroids come from the first drop;
  *     retraining cadence stays the caller's offline decision, same
  *     contract as [[Ann.appendToIvfIndex]]'s drift caveat);
  *   - later batches UPSERT ([[Ann.upsertIntoIvfIndex]]): recrawled ids
  *     replace their stale vectors, and because the upsert commits as ONE
  *     manifest-pointer swap the batch is IDEMPOTENT and ATOMIC —
  *     foreachBatch's at-least-once redelivery converges to the same
  *     index state instead of double-inserting, and a crash mid-upsert
  *     leaves the old state fully live (never a delete-committed/
  *     append-pending gap);
  *   - every `compactEvery` batches, [[Ann.compactIvfIndex]] folds
  *     append-fragmented inverted lists back to few files (the same
  *     small-files decay budget as
  *     [[StreamingCuration.compactState]]).
  *
  * 100 TB posture: per batch, one (id, cid)-column scan for the delete
  * leg, one assignment scan of the batch, writes touch only the assigned
  * cid directories. Nothing unbounded reaches the driver (touched-cid
  * collects are ≤ numCentroids). */
object StreamingIndexIngest {

  /** One micro-batch against the index at `indexPath` — the foreachBatch
    * body, public so the empty-batch / first-build / upsert routing is
    * directly spec-testable without a streaming harness. */
  def ingestBatch(batch: DataFrame, batchId: Long, indexPath: String,
      idCol: String, vecCol: String, numCentroids: Int = 64,
      codec: String = "float", compactEvery: Option[Int] = None,
      maxFilesPerList: Int = 32): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // "built" = a committed index manifest exists. buildIvfIndex writes
    // centroids and corpus BEFORE the manifest, so a crashed first build
    // leaves no manifest — that retry must REBUILD (overwrite,
    // idempotent); any committed manifest means the upsert path converges
    // (a replayed batch-0 upserts its own rows to the same state).
    if (!Ann.indexExists(spark, indexPath)) {
      Ann.buildIvfIndex(batch, idCol, vecCol, indexPath,
        numCentroids = numCentroids, codec = codec)
    } else {
      Ann.upsertIntoIvfIndex(batch, idCol, vecCol, indexPath)
    }
    compactEvery.foreach(n =>
      if (batchId > 0 && batchId % n == 0)
        Ann.compactIvfIndex(spark, indexPath, maxFilesPerList))
  }

  def runStream(vecs: DataFrame, indexPath: String, idCol: String,
      vecCol: String, numCentroids: Int = 64, codec: String = "float",
      compactEvery: Option[Int] = None,
      maxFilesPerList: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(batch, id, indexPath, idCol, vecCol, numCentroids,
          codec, compactEvery, maxFilesPerList)
      }
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$indexPath/_checkpoint")
      .start()
}
