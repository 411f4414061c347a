package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (range) join — pairs of rows with equal key whose numeric ordering
  * values lie within `band` of each other. Spark's planner turns a raw
  * `|a.t − b.t| <= band` predicate into a per-key nested loop (every pair
  * enumerated then filtered — quadratic in per-key history); the classic
  * fix is bin bucketing:
  *
  *   bin = floor(ord / band); a right row can only band-match left rows in
  *   its own or an adjacent bin, so replicating the RIGHT side into bins
  *   {b−1, b, b+1} and equi-joining on (key, bin) finds every qualifying
  *   pair — exactly once, because the left row's bin is single-valued and
  *   the three replicas are distinct bins — while the planner runs a plain
  *   hash/sort-merge equi-join.
  *
  * Cost: shuffle of |L| + 3·|R| rows co-partitioned on (key, bin), join
  * fan-out ∝ true pair density within each bin — never O(N²) across bins.
  * AQE handles hot (key, bin) buckets like any skewed equi-join.
  */
object RangeJoin {

  /** All (left, right) pairs with equal `key` and |leftOrd − rightOrd| ≤
    * `band`. Ordering columns must be integral (e.g. epoch micros). Output
    * carries every left column as `l_<name>` and right column as
    * `r_<name>`. For a self-join, filter `l_<id> < r_<id>` afterwards to
    * keep each unordered pair once. */
  def bandJoin(left: DataFrame, right: DataFrame, key: String,
      leftOrd: String, rightOrd: String, band: Long): DataFrame = {
    require(band > 0, "band must be positive")
    // exact floor division in long arithmetic (no double rounding at
    // epoch-micro magnitudes): (x − pmod(x, band)) / band
    def bin(c: Column): Column = (c - pmod(c, lit(band))) / lit(band)
    val l = left.select(
      (left.columns.toIndexedSeq.map(c => col(c).as(s"l_$c")) :+
        bin(col(leftOrd)).as("__bin")): _*)
    val r0 = right.select(
      (right.columns.toIndexedSeq.map(c => col(c).as(s"r_$c")) :+
        bin(col(rightOrd)).as("__b")): _*)
    val r = r0.select(
      (r0.columns.toIndexedSeq.filter(_ != "__b").map(col) :+
        explode(array(col("__b") - 1, col("__b"), col("__b") + 1)).as("__bin")): _*)
    // equi-join keys are EXPLICITLY (key, bin) so the hash partitioning
    // spreads hot bins across keys and hot keys across bins
    l.join(r,
        col(s"l_$key") === col(s"r_$key") && l("__bin") === r("__bin"))
      .filter(abs(col(s"l_$leftOrd") - col(s"r_$rightOrd")) <= band)
      .drop("__bin")
  }
}
