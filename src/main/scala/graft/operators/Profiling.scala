package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the per-column statistics pass (null counts, exact
  * cardinality, ranges) a pipeline runs before trusting a new drop of data.
  * Long-format output so downstream checks are data, not schema.
  *
  * Scale shape: ONE scan. The per-column aggregates ride a single
  * aggregation; the multiple exact COUNT(DISTINCT)s compile to Spark's
  * Expand-based rewrite (one pass, fan-out = #profiled columns, partial
  * aggregation absorbs it map-side). The wide→long pivot happens on the
  * one-row aggregate result, not on the data. For quick looks at petabyte
  * tables swap the exact distincts for `approx_count_distinct` via
  * `exact = false` — same shape minus the Expand.
  */
object Profiling {

  /** Profile numeric (or numerically-castable) columns: one output row per
    * column — `(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)`
    * with min/max as doubles. */
  def profileNumeric(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', __n, __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stacked) AS " +
      "(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)")
  }

  /** One-row skew diagnosis for a prospective shuffle/join key: key count,
    * row count, the hot key's size, p50/p99 of per-key counts, and
    * `skew_ratio` = max/mean — the number that decides between a plain
    * hash shuffle (≈1), AQE skew splitting (moderate), or explicit salting
    * via [[Skew.saltedJoin]]/[[Skew.topNPerKey]] (pathological). Two
    * aggregations: per-key counts (map-side combined), then a constant-size
    * reduce over one row per key. */
  def keySkew(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"),
      percentile(col("cnt"), lit(0.5)).as("p50_cnt"),
      percentile(col("cnt"), lit(0.99)).as("p99_cnt"),
      (max(col("cnt")).cast("double") /
        (sum(col("cnt")).cast("double") / count(lit(1)).cast("double")))
        .as("skew_ratio"))
  }
}
