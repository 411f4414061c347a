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

  /** Per-type tumbling-window volume in EXACT decimal — the streaming
    * producer for trend/anomaly monitoring: feed the (small) maintained
    * rollup to [[graft.operators.Rolling.ewmaFlags]] per micro-batch (or
    * on read) and the verdicts are bit-identical to the batch q155 pass
    * over the same events, because the rollup rows themselves are exact.
    * The EWMA pass runs OVER the rollup, not the stream — trend detection
    * needs completed consecutive windows, and the rollup is bounded by
    * types × windows, so the trend pass costs nothing at any scale. */
  def windowedTypedVolume(events: DataFrame, windowDur: String,
      watermarkDelay: String = "10 minutes",
      typeCol: String = "event_type"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col(typeCol), window(col("ts"), windowDur))
      .agg(sum(col("value").cast("decimal(18,2)")).as("x"))
      .select(col(typeCol), col("window.start").as("h"), col("x"))

  /** Windowed approximate distinct-user count (HyperLogLog++) — the
    * streaming shape of per-window COUNT(DISTINCT): exact distinct needs
    * the window's whole key set in state, HLL keeps a constant-size sketch
    * per window. Batch twin with exact semantics: q47 (skew-safe salted
    * exact distinct). */
  def windowedApproxDistinct(events: DataFrame, windowDur: String,
      watermarkDelay: String = "10 minutes", keyCol: String = "user_id",
      rsd: Double = 0.02): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur))
      .agg(approx_count_distinct(col(keyCol), rsd).as("n_distinct_est"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_distinct_est"), col("n_events"))

  /** Per-window mergeable moment sketch — the streaming PRODUCER of the
    * batch rollup-maintenance pattern ([[graft.exec.Estimators.momentSketch]]
    * / `mergeMoments`, q87): emits `(window, n, s1, s2)` with the sums as
    * exact scale-0 decimals, so downstream jobs merge closed-window
    * partials to any coarser rollup (hourly → daily → total) by plain
    * addition, no rescan, zero error. The aggregation is algebraic, so
    * state per open window is three numbers regardless of rate. `value`
    * must be integer-valued (quantize money to cents first — house rule). */
  def windowedMoments(events: DataFrame, windowDur: String,
      value: org.apache.spark.sql.Column,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val vd = value.cast("decimal(18,0)")
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n"),
        sum(vd).cast("decimal(38,0)").as("s1"),
        sum(vd * vd).cast("decimal(38,0)").as("s2"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n"), col("s1"), col("s2"))
  }

  /** Per-window Count-Min sketch — the streaming PRODUCER of the
    * mergeable-frequency pattern ([[graft.functions.CountMin]], q98):
    * emits `(window, hash_idx, bucket, cnt)` rows whose counts ADD across
    * windows, so closed windows roll up to any coarser grain (or into a
    * serving CMS via [[UpsertSink]]-style merges) without reprocessing the
    * stream. State per open window is bounded by depth × width cells
    * regardless of event rate — the aggregation is algebraic (a count per
    * cell), never a per-key map. Keys must be non-negative longs
    * (CountMin's cross-engine hashing contract). */
  def windowedCountMin(events: DataFrame, windowDur: String,
      key: org.apache.spark.sql.Column, width: Int,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), posexplode(array(
        graft.functions.CountMin.params.map { case (a, b) =>
          graft.functions.CountMin.bucket(key, a, b, width)
        }: _*)).as(Seq("hash_idx", "bucket")))
      .groupBy(window(col("ts"), windowDur), col("hash_idx"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("hash_idx"), col("bucket"), col("cnt"))

  /** Per-window equi-width histogram — the streaming PRODUCER for
    * [[graft.exec.HistQuantile]] (q100): emits `(window, bin, cnt)` whose
    * exact integer counts ADD across windows, so closed windows roll up to
    * any grain and `HistQuantile.quantiles` reads percentiles off the
    * merged sketch with zero reprocessing. State per open window ≤ nBins
    * cells. Completes the mergeable trio: moments ([[windowedMoments]]),
    * frequencies ([[windowedCountMin]]), quantiles (this). */
  def windowedHistogram(events: DataFrame, windowDur: String,
      value: org.apache.spark.sql.Column, lo: Double, width: Double,
      nBins: Int, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"),
        graft.exec.HistQuantile.binOf(value, lo, width, nBins).as("bin"))
      .groupBy(window(col("ts"), windowDur), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("bin"), col("cnt"))

  /** Streaming exact dedup on `keyCols` within the watermark horizon —
    * the ingest-side twin of batch `Dedup.dropExactDups`: state holds one
    * entry per key only until the watermark passes, so memory is bounded by
    * the horizon's key cardinality, not the stream's lifetime. */
  def dedupStream(events: DataFrame, watermarkDelay: String = "30 minutes",
      keyCols: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-stream equi-join within an event-time band: left rows match
    * right rows with the same `key` and `r.ts ∈ [l.ts − before, l.ts +
    * after]`. Both sides are watermarked and the join condition bounds both
    * event-time columns, so Spark can expire join state: each side holds
    * only `band + watermarkDelay` of history per key — state is O(rate ×
    * horizon), not O(stream). Output columns are prefixed `l_` / `r_`; the
    * batch twin of this shape is `RangeJoin.bandJoin` (q53). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, beforeSec: Long, afterSec: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
      .withWatermark(s"l_$tsCol", watermarkDelay)
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$tsCol", watermarkDelay)
    l.join(r, col(s"l_$key") === col(s"r_$key") &&
      col(s"r_$tsCol") >= col(s"l_$tsCol") - expr(s"INTERVAL $beforeSec SECONDS") &&
      col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $afterSec SECONDS"))
  }

  // -- windowed heavy hitters (bounded Misra-Gries state) ------------------

  case class HHOut(window_start: Timestamp, window_end: Timestamp,
      key: String, est_count: Long, window_total: Long)
  private case class HHState(counters: Map[String, Long], total: Long)

  /** Per-window heavy hitters over an unbounded key domain with BOUNDED
    * state: each open window holds one Misra–Gries sketch of
    * `m = ceil(2/support)` counters (not the window's whole key set — the
    * exact-count shape would be O(distinct keys) state and is what q50 does
    * in batch, where a second pass can rescope counts). On event-time
    * timeout (watermark past window end) the window emits every surviving
    * key with `est_count ≥ support·total/2`, largest first.
    *
    * Guarantees (standard MG): every key with true frequency ≥
    * support·total IS emitted (its counter survives with estimate ≥
    * true − total/m ≥ support·total/2), and `est_count` is a lower bound
    * within total/m of the truth. Exact counts, if needed, come from
    * rescanning the archived batch data scoped to the emitted keys —
    * the q50 pattern.
    *
    * Works on batch Datasets too (groups emit at end-of-fold), which is how
    * the spec anchors it against the exact batch answer. */
  def windowedHeavyHitters(events: DataFrame, windowDur: String,
      keyCol: String, support: Double,
      watermarkDelay: String = "10 minutes"): Dataset[HHOut] = {
    require(support > 0 && support < 1, s"support=$support")
    val spark = events.sparkSession
    import spark.implicits._
    val m = math.max(2, math.ceil(2.0 / support).toInt)
    val streaming = events.isStreaming
    val src0 = if (streaming) events.withWatermark("ts", watermarkDelay) else events
    val keyed = src0
      .select(window(col("ts"), windowDur).as("w"), col(keyCol).cast("string").as("key"))
      .select(col("w.start").as("wstart"), col("w.end").as("wend"), col("key"))
      .as[(Timestamp, Timestamp, String)]
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout

    def mgAdd(c: Map[String, Long], k: String): Map[String, Long] =
      if (c.contains(k)) c.updated(k, c(k) + 1L)
      else if (c.size < m) c.updated(k, 1L)
      else c.collect { case (kk, v) if v > 1L => kk -> (v - 1L) }

    def emit(ws: Long, we: Long, s: HHState): Iterator[HHOut] =
      s.counters.toSeq
        .filter { case (_, v) => v.toDouble >= support * s.total / 2.0 }
        .sortBy { case (k, v) => (-v, k) }
        .map { case (k, v) => HHOut(new Timestamp(ws), new Timestamp(we), k, v, s.total) }
        .iterator

    keyed
      .groupByKey(r => (r._1.getTime, r._2.getTime))
      .flatMapGroupsWithState[HHState, HHOut](OutputMode.Append, timeoutConf) {
        case ((ws, we), batch, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            emit(ws, we, s)
          } else {
            var s = state.getOption.getOrElse(HHState(Map.empty, 0L))
            batch.foreach { r => s = HHState(mgAdd(s.counters, r._3), s.total + 1L) }
            if (streaming) {
              state.update(s)
              // close once the watermark passes the window end (clamped
              // forward: a timeout timestamp must exceed the watermark)
              state.setTimeoutTimestamp(math.max(we, state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            } else emit(ws, we, s)
          }
      }
  }

  // -- stateful sessionization (mapGroupsWithState) ------------------------

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, lastSeen: Long, nEvents: Long, sumValue: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  private def toOut(userId: Long, s: SessionState): SessionOut =
    SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen),
      s.nEvents, s.sumValue)

  /** Per-user gap sessionization via `flatMapGroupsWithState` — the
    * custom-state path the north star asks for, with correct emission
    * semantics: a gap inside one batch emits the finished session
    * immediately (nothing is ever discarded), and an idle session closes
    * through an event-time timeout once the watermark passes
    * `lastSeen + gapMillis`.
    *
    * Works on batch Datasets too (state machinery is identical); since no
    * later batch can extend a batch group's trailing session, it is closed
    * and emitted as well — making batch sessionization deterministic and
    * oracle-expressible (lag/gap-flag/cumulative-count in ANSI SQL). */
  def sessionize(events: Dataset[Event], gapMillis: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermarkDelay) else events
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](OutputMode.Append, timeoutConf) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(toOut(userId, s))
          } else {
            // deterministic fold order: event time, then id as tiebreak
            val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMillis =>
                  cur = Some(SessionState(s.start, math.max(s.lastSeen, t),
                    s.nEvents + 1, s.sumValue + e.value))
                case Some(s) => // gap exceeded: close the old session NOW
                  closed += toOut(userId, s)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            if (streaming) {
              cur.foreach { s =>
                state.update(s)
                // a very-late group may sit behind the watermark; the timeout
                // timestamp must not (Spark rejects it) — clamp forward so the
                // session closes on the next watermark advance instead
                state.setTimeoutTimestamp(
                  math.max(s.lastSeen + gapMillis, state.getCurrentWatermarkMs() + 1))
              }
            } else {
              cur.foreach(s => closed += toOut(userId, s))
            }
            closed.result().iterator
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
