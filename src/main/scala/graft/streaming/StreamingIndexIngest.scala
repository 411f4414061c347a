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
  *   - first batch against an empty path TRAINS the index
  *     ([[Ann.buildIvfIndex]] — centroids come from the first drop;
  *     retraining cadence stays the caller's offline decision, same
  *     contract as [[Ann.appendToIvfIndex]]'s drift caveat);
  *   - later batches UPSERT ([[Ann.upsertIntoIvfIndex]]): recrawled ids
  *     replace their stale vectors, and because upsert = delete + append
  *     the batch is IDEMPOTENT — foreachBatch's at-least-once redelivery
  *     converges to the same index state instead of double-inserting,
  *     the crash-safety property bare append lacks;
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

  def runStream(vecs: DataFrame, indexPath: String, idCol: String,
      vecCol: String, numCentroids: Int = 64, codec: String = "float",
      compactEvery: Option[Int] = None,
      maxFilesPerList: Int = 32,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        // "built" = at least one inverted list committed. buildIvfIndex
        // writes centroids BEFORE corpus, so centroid existence alone
        // could be a crashed first build — that retry must REBUILD
        // (overwrite, idempotent), while any committed cid dir means the
        // upsert path converges even over a partially-committed corpus
        // (its rows are batch-0 rows, which the upsert's delete leg
        // removes before re-appending).
        val corpusPath = new org.apache.hadoop.fs.Path(s"$indexPath/corpus")
        val fs = corpusPath.getFileSystem(spark.sessionState.newHadoopConf())
        val built = fs.exists(corpusPath) && fs.listStatus(corpusPath)
          .exists(st => st.isDirectory && st.getPath.getName.startsWith("cid="))
        if (!built) {
          Ann.buildIvfIndex(batch, idCol, vecCol, indexPath,
            numCentroids = numCentroids, codec = codec)
        } else {
          Ann.upsertIntoIvfIndex(batch, idCol, vecCol, indexPath)
        }
        compactEvery.foreach(n =>
          if (id > 0 && id % n == 0)
            Ann.compactIvfIndex(spark, indexPath, maxFilesPerList))
        ()
      }
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$indexPath/_checkpoint")
      .start()
}
