package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling (trailing-window) features over an ordered per-key event stream —
  * the standard featurization pass before sequence-model training data is
  * cut: "activity in the last k events / last Δt before this one".
  *
  * Scale shape: ONE shuffle on the key columns; every frame below is a
  * streaming window aggregate (Spark evaluates bounded ROWS/RANGE frames
  * incrementally — no per-row rescan), so cost is linear in rows per key and
  * AQE splits skewed keys.
  */
object Rolling {

  /** Trailing ROWS-frame stats: for each row, the count and sum of `value`
    * over the previous `k` rows of its key group (current row excluded), in
    * `orderCols` order (include a unique final column — ties would otherwise
    * make the frame, and thus the result, nondeterministic). Adds
    * `prev_n` and `prev_sum`. */
  def trailingRows(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      value: Column, k: Int): DataFrame = {
    require(k >= 1)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-k.toLong, -1)
    df.withColumn("prev_n", count(value).over(w))
      .withColumn("prev_sum", coalesce(sum(value).over(w), lit(0L)))
  }

  /** Trailing time-RANGE stats over an epoch-numeric order column: count and
    * sum of `value` in `(t - lookback, t - 1]`... i.e. the `lookback`
    * ticks strictly before each row's own tick (rows sharing the exact
    * timestamp are excluded — they are concurrent, not prior). Adds
    * `win_n` and `win_sum`. */
  def trailingRange(df: DataFrame, keyCols: Seq[String], tickCol: String,
      value: Column, lookback: Long): DataFrame = {
    require(lookback >= 1)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tickCol))
      .rangeBetween(-lookback, -1)
    df.withColumn("win_n", count(value).over(w))
      .withColumn("win_sum", coalesce(sum(value).over(w), lit(0L)))
  }

  /** Resample an irregular per-key event stream onto a fixed `stepSec`
    * grid with forward-fill — the gap-filling pass before any
    * constant-rate model input or join-on-time. Per key: bucket each
    * observation (last one in a bucket wins, ranked by the composite
    * `epoch·10⁸ + tieCol` so the winner is deterministic), span the grid
    * from the key's first to last bucket (`sequence` + explode — no
    * driver loop), left-join observations, and carry the last non-null
    * value forward (`last(..., ignoreNulls)` over an unbounded-preceding
    * frame — Spark evaluates it incrementally, one pass per key).
    *
    * Scale shape: one shuffle on the key for the bucket aggregate and one
    * for the fill window; spine size = keys × (horizon/stepSec), a
    * planned, bounded blow-up (pick stepSec accordingly). The first
    * bucket of every key holds an observation by construction, so no
    * leading nulls. Output: (keyCol, bucket — epoch seconds, filled). */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
      value: Column, tieCol: String, stepSec: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gridJoin(df, keyCol, tsCol, value, tieCol, stepSec)
      .withColumn("filled", last(col("__bv"), ignoreNulls = true).over(w))
      .drop("__bv")
  }

  /** Linear-interpolation resample — [[resampleFill]]'s smooth sibling:
    * grid points between two observations take the lerp of their
    * surrounding values; before the first / after the last observation the
    * nearest one is held. Two extra unbounded window passes (backward
    * carry of (v₀,t₀), forward first of (v₁,t₁)) — still one keyed sort,
    * both frames evaluate incrementally. The lerp is written in the exact
    * operation order `v0 + (v1−v0)·((t−t0)/(t1−t0))` so any IEEE engine
    * reproduces it bit-for-bit. Output: (keyCol, bucket, interp). */
  def resampleInterp(df: DataFrame, keyCol: String, tsCol: String,
      value: Column, tieCol: String, stepSec: Long): DataFrame = {
    val w0 = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w1 = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("__bv").isNotNull, col("bucket"))
    val withEnds = gridJoin(df, keyCol, tsCol, value, tieCol, stepSec)
      .withColumn("__v0", last(col("__bv"), ignoreNulls = true).over(w0))
      .withColumn("__t0", last(obsBucket, ignoreNulls = true).over(w0))
      .withColumn("__v1", first(col("__bv"), ignoreNulls = true).over(w1))
      .withColumn("__t1", first(obsBucket, ignoreNulls = true).over(w1))
    val frac = (col("bucket") - col("__t0")).cast("double") /
      (col("__t1") - col("__t0")).cast("double")
    withEnds.withColumn("interp",
        when(col("__bv").isNotNull, col("__bv"))
          .when(col("__t1").isNull, col("__v0"))
          .when(col("__t0").isNull, col("__v1"))
          .otherwise(col("__v0") + (col("__v1") - col("__v0")) * frac))
      .select(col(keyCol), col("bucket"), col("interp"))
  }

  /** Shared by the resamplers: deterministic last-in-bucket aggregate,
    * per-key first..last grid spine, left-join of observations. */
  private def gridJoin(df: DataFrame, keyCol: String, tsCol: String,
      value: Column, tieCol: String, stepSec: Long): DataFrame = {
    require(stepSec >= 1)
    val es = col(tsCol).cast("long")
    val obs = df.select(col(keyCol), es.as("__es"), value.as("__v"),
      col(tieCol).cast("long").as("__tie"))
    val buckets = obs
      .withColumn("bucket", col("__es") - pmod(col("__es"), lit(stepSec)))
      .groupBy(col(keyCol), col("bucket"))
      .agg(max_by(col("__v"),
        col("__es") * lit(100000000L) + col("__tie")).as("__bv"))
    val spine = buckets.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), lit(stepSec))).as("bucket"))
    spine.join(buckets, Seq(keyCol, "bucket"), "left")
  }

  /** Bounded-horizon exponential smoothing + anomaly flagging over an
    * ordered per-key series — the monitoring pass over ingest/metric
    * streams ("is this hour's volume wildly off its recent trend?").
    *
    * EWMA here is the H-term truncation of exponential smoothing with
    * decay 0.9: `ewma_prev = Σ_{k=1..H} 0.9^(k-1)·x_{t-k} / Σ 0.9^(k-1)`
    * over the lags that exist (series heads use the shorter window; a row
    * with no predecessor is flagged `warmup`). The 0.9^k weights are EXACT
    * decimal literals and `x` is exact integer cents, so numerator and
    * denominator are exact decimals: the anomaly comparisons (x more than
    * double, or less than half, the trend) are decimal inequalities —
    * bit-reproducible in any engine — and only the reported `ewma_prev`
    * does one final double division.
    *
    * Scale shape: ONE shuffle on the key columns, then H window lags
    * evaluated in a single streaming frame pass — no self-join, no
    * rescan. Include a coarse time bucket (e.g. the date) in `keyCols` at
    * scale so a key's series never exceeds a partition; the horizon then
    * resets per bucket, which is the documented trade for boundedness. */
  def ewmaFlags(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCents: Column, horizon: Int = 8): DataFrame = {
    require(horizon >= 1 && horizon <= 16, "horizon must be in [1, 16]")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val x = valueCents.cast("decimal(18,2)")
    // 0.9^(k-1) exact: k-1 decimal digits each, well inside decimal range
    val weights: Seq[java.math.BigDecimal] = (0 until horizon)
      .map(k => new java.math.BigDecimal("0.9").pow(k))
    val lags = (1 to horizon).map(k => lag(x, k).over(w))
    val num = lags.zip(weights).map { case (l, wk) =>
      when(l.isNotNull, lit(wk) * l).otherwise(lit(java.math.BigDecimal.ZERO))
    }.reduce(_ + _)
    val den = lags.zip(weights).map { case (l, wk) =>
      when(l.isNotNull, lit(wk)).otherwise(lit(java.math.BigDecimal.ZERO))
    }.reduce(_ + _)
    df.withColumn("__x", x)
      .withColumn("__num", num).withColumn("__den", den)
      .withColumn("ewma_prev",
        when(col("__den") > 0,
          col("__num").cast("double") / col("__den").cast("double")))
      .withColumn("flag",
        when(col("__x").isNull, lit("no_data")) // null measure: no verdict
          .when(col("__den") === 0, lit("warmup"))
          .when(col("__x") * col("__den") > lit(2) * col("__num"), lit("high"))
          .when(lit(2) * col("__x") * col("__den") < col("__num"), lit("low"))
          .otherwise(lit("ok")))
      .drop("__x", "__num", "__den")
  }
}
