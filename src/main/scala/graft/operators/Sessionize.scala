package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the gap-based session assignment over an event
  * log (the batch twin of `StreamingAgg.sessionize`, and the form every
  * backfill runs: streaming handles the live tail, this handles history).
  *
  * Scale shape: ONE shuffle on the key; the lag-flag window and the
  * running-sum window share the same (key, order) sort, so Spark plans a
  * single Exchange + Sort feeding two stacked WindowExecs, then the
  * per-session rollup aggregates with map-side combine. Nothing driver-side,
  * nothing quadratic; cost is the one keyed sort any sessionizer needs.
  * Skew note: a single hyperactive key serializes its own window pass at
  * any engine — cap per-key history upstream if that is a real risk.
  */
object Sessionize {

  /** Assign gap-based sessions: a new session starts when the time since
    * the key's previous event exceeds `gapUs`. Adds `session` (0-based
    * per-key index). `tsCol` must be a monotonic numeric (epoch micros);
    * `tieCol` breaks equal timestamps so the assignment is total-ordered. */
  def assignSessions(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapUs: Long): DataFrame = {
    require(gapUs > 0)
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(order)
    val newSession = when(
      prev.isNull || col(tsCol) - prev > gapUs, 1L).otherwise(0L)
    df.withColumn("__new", newSession)
      .withColumn("session",
        sum(col("__new")).over(order
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .drop("__new")
  }

  /** Per-session rollup: `(key, session, n_events, start, end, span)`. */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapUs: Long): DataFrame =
    assignSessions(df, keyCol, tsCol, tieCol, gapUs)
      .groupBy(col(keyCol), col("session"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start"),
        max(col(tsCol)).as("end"))
      .withColumn("span", col("end") - col("start"))
}
