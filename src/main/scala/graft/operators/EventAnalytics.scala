package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics over an append-only (user, ts, type, ...) stream —
  * the product-analytics trio (transition matrix, retention cohorts, gap
  * detection) that complements the funnel/sessionization operators.
  *
  * Scale shapes: every operator here shuffles on the user key exactly once
  * (window or groupBy), then reduces to a small cube (type×type,
  * cohort×offset, or per-user row). No driver state, no collect; AQE
  * splits skewed (bot) users on the window exchanges.
  */
object EventAnalytics {

  /** First-order transition matrix: counts and conditional probability of
    * `next` given `prev` over each user's event sequence (ordered by
    * `tsCol`, tie-broken by `tieCol` so the sequence — and therefore the
    * matrix — is deterministic). One window shuffle on the user key, then
    * a groupBy of |types|² rows; the probability is a single BIGINT/BIGINT
    * division (deterministic across engines). */
  def transitions(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("cnt"))
    val wp = Window.partitionBy(col("prev_type"))
    pairs
      .withColumn("p_next",
        col("cnt").cast("double") / sum(col("cnt")).over(wp))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Weekly retention cohorts: users are cohorted by the ISO week of their
    * first event; for every (cohort, week-offset) cell, how many of the
    * cohort's users were active that week. Two aggregations over the user
    * key (first-seen week, distinct active weeks) and a broadcast-size
    * join — the classic retention triangle, all integer arithmetic.
    * Offsets are exact because date_trunc('week') pins both ends to
    * Mondays (ISO weeks in Spark AND DuckDB). */
  def retentionCohorts(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val firstWeek = df.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val activeWeeks = df
      .select(col(userCol), date_trunc("week", col(tsCol)).as("week"))
      .distinct()
    activeWeeks.join(firstWeek, userCol)
      .select(col("cohort_week"),
        (datediff(col("week").cast("date"), col("cohort_week").cast("date"))
          .cast("bigint") / lit(7L)).cast("bigint").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Per-user inactivity gaps: for every user, the number of consecutive-
    * event gaps exceeding `gapMicros` and the largest gap observed. One
    * window shuffle on the user key; emits only users with at least one
    * over-threshold gap. Gaps are exact integer microsecond differences —
    * deterministic in any engine. */
  def timeGaps(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    df.withColumn("__gap", us - lag(us, 1).over(w))
      .filter(col("__gap").isNotNull)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(when(col("__gap") > gapMicros, 1L).otherwise(0L)).as("n_gaps"),
        max(col("__gap")).as("max_gap_us"))
      .filter(col("n_gaps") > 0)
      .orderBy(col(userCol))
  }
}
