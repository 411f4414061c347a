package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable equi-width histogram quantiles — the rollup-friendly
  * complement to `percentile` (exact, needs the rows) and
  * `percentile_approx` (KLL-ish, not SQL-oracle-able). Bin counts are
  * exact integers, so histograms over disjoint row sets MERGE BY ADDING —
  * per-partition/per-day histograms roll up to any coarser grain with zero
  * extra error — and the quantile estimate is a deterministic
  * interpolation inside the bracketing bin, reproducible bit-for-bit in
  * any engine (all doubles derive from integers < 2^53 through a fixed
  * expression tree).
  *
  * Error bound: an estimate is off by at most one bin width. Pick
  * `width` from the domain you care about (e.g. 64 × $2000 covers TPC-H
  * prices); out-of-domain values clamp into the edge bins.
  *
  * Scale shape: build is a scan + hash-groupBy on ≤ `nBins` groups
  * (map-side combined — shuffle bounded by nBins regardless of input);
  * the quantile step runs on the ≤ nBins-row sketch, so its global window
  * sort is O(nBins log nBins) on one task, not a data-scale sort.
  */
object HistQuantile {

  /** Bin index of `x`: floor((x − lo) / width), clamped to [0, nBins). */
  def binOf(x: Column, lo: Double, width: Double, nBins: Int): Column =
    least(greatest(floor((x - lit(lo)) / lit(width)).cast("long"), lit(0L)),
      lit(nBins - 1L))

  /** Build the histogram `(bin, cnt)` — only non-empty bins appear. */
  def histogram(df: DataFrame, x: Column, lo: Double, width: Double,
      nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0, "width and nBins must be positive")
    df.select(binOf(x, lo, width, nBins).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** Merge histograms with identical (lo, width, nBins): counts add. */
  def merge(hists: Seq[DataFrame]): DataFrame = {
    require(hists.nonEmpty, "nothing to merge")
    hists.reduce(_ unionAll _)
      .groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
  }

  /** WEIGHTED histogram `(bin, wsum)` — the design-weighted form: each row
    * contributes its weight (exact decimal cents, so bin sums are exact
    * integers-in-decimal and merge/compare cross-engine) instead of 1.
    * This is what a quantile over an HT/PPS/priority-weighted sample — or
    * a "median price by QUANTITY" / "median length by tokens" question —
    * needs; the unweighted [[histogram]] is the weight≡1 special case.
    * Weights must be non-negative (quantiles of a signed measure are
    * undefined). */
  def weightedHistogram(df: DataFrame, x: Column, weight: Column,
      lo: Double, width: Double, nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0, "width and nBins must be positive")
    df.select(binOf(x, lo, width, nBins).as("bin"),
        weight.cast("decimal(18,2)").as("w"))
      .groupBy(col("bin")).agg(sum(col("w")).as("wsum"))
  }

  /** Merge weighted histograms with identical (lo, width, nBins):
    * weight sums add (exact decimal). */
  def mergeWeighted(hists: Seq[DataFrame]): DataFrame = {
    require(hists.nonEmpty, "nothing to merge")
    hists.reduce(_ unionAll _)
      .groupBy(col("bin")).agg(sum(col("wsum")).as("wsum"))
  }

  /** Quantiles from a weighted histogram: identical interpolation to
    * [[quantiles]] with cumulative WEIGHT in place of cumulative count.
    * All doubles derive from exact decimals through a fixed expression
    * tree — bit-reproducible in any engine. */
  def weightedQuantiles(hist: DataFrame, lo: Double, width: Double,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), "need 0 < p <= 1")
    val w = Window.orderBy(col("bin")) // ≤ nBins rows: bounded
    val cum = hist
      .withColumn("cum", sum(col("wsum")).over(w))
      .withColumn("cum_before", col("cum") - col("wsum"))
    val n = hist.agg(sum(col("wsum")).as("n"))
    val probe = hist.sparkSession.range(1)
      .select(explode(array(ps.map(lit): _*)).as("p"))
    val t = col("p") * col("n").cast("double")
    probe.crossJoin(n)
      .join(cum, col("cum").cast("double") >= t &&
        col("cum_before").cast("double") < t)
      .select(col("p"),
        (lit(lo) + lit(width) * col("bin").cast("double") +
          lit(width) * ((t - col("cum_before").cast("double")) /
            col("wsum").cast("double"))).as("est"))
      .orderBy(col("p"))
  }

  /** Quantile estimates from a histogram: for each p, locate the bin whose
    * cumulative count brackets t = p·n and interpolate linearly inside it:
    * est = lo + width·bin + width·(t − cum_before)/cnt. Output `(p, est)`
    * ordered by p; requires 0 < p ≤ 1 and a non-empty histogram. */
  def quantiles(hist: DataFrame, lo: Double, width: Double,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), "need 0 < p <= 1")
    val w = Window.orderBy(col("bin")) // ≤ nBins rows: bounded, not data-scale
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("cum_before", col("cum") - col("cnt"))
    val n = hist.agg(sum(col("cnt")).as("n"))
    val probe = hist.sparkSession.range(1)
      .select(explode(array(ps.map(lit): _*)).as("p"))
    val t = col("p") * col("n").cast("double")
    probe.crossJoin(n)
      .join(cum, col("cum").cast("double") >= t &&
        col("cum_before").cast("double") < t)
      .select(col("p"),
        (lit(lo) + lit(width) * col("bin").cast("double") +
          lit(width) * ((t - col("cum_before").cast("double")) /
            col("cnt").cast("double"))).as("est"))
      .orderBy(col("p"))
  }
}
