package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  /** Per-group least-squares trend (slope + intercept of y on x) from the
    * five OLS moments — ONE aggregation pass, exact scale-0 decimal sums
    * (x and y must be integer-valued: days, cents, counts), closed form
    * evaluated in a fixed IEEE expression over the exact moments (the
    * [[graft.exec.Estimators.momentStats]] discipline) so results are
    * engine-reproducible. The drift detector for "is this source's
    * quality/length/rate trending?" — moments also merge by addition if a
    * rollup needs coarser groups later. Degenerate groups (all x equal)
    * get null slope/intercept rather than a divide-by-zero. */
  def groupTrend(df: DataFrame, groupCols: Seq[String], x: Column,
      y: Column): DataFrame = {
    val xd = x.cast("decimal(18,0)")
    val yd = y.cast("decimal(18,0)")
    val m = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(xd).cast("decimal(38,0)").as("sx"),
        sum(yd).cast("decimal(38,0)").as("sy"),
        sum(xd * yd).cast("decimal(38,0)").as("sxy"),
        sum(xd * xd).cast("decimal(38,0)").as("sxx"))
    val nd = col("n").cast("double")
    val sxd = col("sx").cast("double")
    val syd = col("sy").cast("double")
    val sxyd = col("sxy").cast("double")
    val sxxd = col("sxx").cast("double")
    val den = nd * sxxd - sxd * sxd
    val slope = when(den =!= 0.0, (nd * sxyd - sxd * syd) / den)
    m.select(groupCols.map(col) ++ Seq(col("n"),
      slope.as("slope"),
      when(den =!= 0.0, (syd - ((nd * sxyd - sxd * syd) / den) * sxd) / nd)
        .as("intercept")): _*)
  }

  /** Distribution drift between two snapshots of a column, as the total
    * variation distance between their equi-width histograms:
    * TV = Σ_bins |p_new − p_old| / 2 ∈ [0, 1]. Computed ENTIRELY in
    * integers — Σ |cnt_n·N_old − cnt_o·N_new| as exact decimals, ONE
    * final division — so the score is bit-reproducible anywhere (no
    * transcendentals: TV instead of the traditional PSI/KL precisely
    * because ln() bits differ across engines). Each side is one bounded
    * histogram aggregation ([[graft.exec.HistQuantile]]); the bin join is
    * ≤ nBins rows. The monitoring gate between yesterday's corpus and
    * today's. */
  def histDrift(oldDf: DataFrame, newDf: DataFrame, x: Column, lo: Double,
      width: Double, nBins: Int): DataFrame = {
    val ho = graft.exec.HistQuantile.histogram(oldDf, x, lo, width, nBins)
      .withColumnRenamed("cnt", "cnt_o")
    val hn = graft.exec.HistQuantile.histogram(newDf, x, lo, width, nBins)
      .withColumnRenamed("cnt", "cnt_n")
    val no = ho.agg(sum(col("cnt_o")).as("n_old"))
    val nn = hn.agg(sum(col("cnt_n")).as("n_new"))
    val joined = ho.join(hn, Seq("bin"), "full_outer")
      .select(coalesce(col("cnt_o"), lit(0L)).as("cnt_o"),
        coalesce(col("cnt_n"), lit(0L)).as("cnt_n"))
      .crossJoin(no).crossJoin(nn)
    joined.agg(max(col("n_old")).as("n_old"), max(col("n_new")).as("n_new"),
        sum(abs(col("cnt_n").cast("decimal(18,0)") * col("n_old").cast("decimal(18,0)") -
          col("cnt_o").cast("decimal(18,0)") * col("n_new").cast("decimal(18,0)")))
          .cast("decimal(38,0)").as("num"))
      .select(col("n_old"), col("n_new"),
        (col("num").cast("double") /
          (lit(2.0) * col("n_old").cast("double") * col("n_new").cast("double")))
          .as("tv_distance"))
  }

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

  /** Per-group winsorized/robust statistics: clip `v` at its group's
    * [`pLo`, `pHi`] percentiles and report `n`, tail counts, the bounds,
    * the winsorized mean (tails replaced by the bounds) and the trimmed
    * mean (tails dropped) — the outlier-robust location estimates a
    * cleaning pass gates on before trusting a column.
    *
    * Cross-engine float discipline: the interior sum runs on `vDec`, the
    * caller-supplied EXACT decimal twin of `v` (order-independent); the
    * clipped tails contribute `count × bound` — one multiply each, never a
    * float sum over rows. The only roundings are the final fixed-order
    * add chain and divisions, identical expression text in any engine.
    * (Decimal→double stays one-rounding as long as the per-group sum in
    * minor units fits 2^53 — at scale keep `vDec` at scale ≤ 2.)
    *
    * Scale shape: two passes over the group — an exact-percentile
    * aggregate producing one bounds row per group (small: broadcast back),
    * then one counting/summing aggregate. Exact group percentiles
    * fundamentally need the group's values; for a one-pass approximate
    * variant feed [[graft.exec.HistQuantile]] bounds in instead. */
  def winsorizedStats(df: DataFrame, groupCols: Seq[String], v: Column,
      vDec: Column, pLo: Double, pHi: Double): DataFrame = {
    require(groupCols.nonEmpty && pLo >= 0.0 && pHi <= 1.0 && pLo < pHi)
    val keyCs = groupCols.map(col)
    val bounds = df.groupBy(keyCs: _*).agg(
      percentile(v, lit(pLo)).as("lo"),
      percentile(v, lit(pHi)).as("hi"))
    val inside = col("__v") >= col("lo") && col("__v") <= col("hi")
    df.select(keyCs ++ Seq(v.as("__v"), vDec.as("__vd")): _*)
      .join(broadcast(bounds), groupCols)
      .groupBy(keyCs: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__v") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("__v") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        first(col("lo")).as("lo"),
        first(col("hi")).as("hi"),
        sum(when(inside, col("__vd"))).as("__sum_in"),
        count(when(inside, lit(1))).as("n_in"))
      .withColumn("winsorized_mean",
        (col("__sum_in").cast("double")
          + col("n_lo").cast("double") * col("lo")
          + col("n_hi").cast("double") * col("hi"))
          / col("n").cast("double"))
      .withColumn("trimmed_mean",
        col("__sum_in").cast("double") / col("n_in").cast("double"))
      .drop("__sum_in")
  }

  /** Robust per-group outlier census via MAD (median absolute deviation):
    * a row is an outlier when |x − median| > k·MAD — the estimator that
    * survives the contamination that wrecks mean/stddev z-scores (a 50%
    * breakdown point vs 0%). Emits `group…, n, med, mad, n_outliers`.
    *
    * Scale shape: two exact-percentile aggregations (median needs the
    * group's values by definition — same cost class as
    * [[winsorizedStats]]), each followed by a broadcast join of the
    * one-row-per-group bounds back onto the fact side; the fact side never
    * reshuffles. All comparisons are double-exact (subtract + compare, no
    * accumulation), so any engine reproduces the counts bit-for-bit. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], value: Column,
      k: Double = 3.0): DataFrame = {
    val keyCs = groupCols.map(col)
    val v = value.cast("double")
    val med = df.groupBy(keyCs: _*)
      .agg(percentile(v, lit(0.5)).as("med"))
    val withDev = df.select(keyCs :+ v.as("__v"): _*)
      .join(broadcast(med), groupCols)
      .withColumn("__dev", abs(col("__v") - col("med")))
    val mad = withDev.groupBy(keyCs: _*)
      .agg(percentile(col("__dev"), lit(0.5)).as("mad"))
    withDev
      .join(broadcast(mad), groupCols)
      .groupBy(keyCs: _*)
      .agg(count(lit(1)).as("n"), first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Rank-normalize a value within each group: adds `pct_rank` =
    * percent_rank (0 for the group minimum, 1 for the maximum, (rank−1)/
    * (n−1) between — the distribution-free feature transform). Ties share
    * a rank; a 1-row group maps to 0.0 in every engine.
    *
    * Scale shape: one hash exchange on the group key + a per-group sort —
    * the same cost as any windowed transform; nothing is driver-side. */
  def rankNormalize(df: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame =
    df.withColumn("pct_rank", percent_rank().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*).orderBy(value)))
}
