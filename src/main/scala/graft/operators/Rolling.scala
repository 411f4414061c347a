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
}
