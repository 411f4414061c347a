package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap error estimation (the BlinkDB/EARL-style alternative
  * to closed-form CLT intervals — no counterpart in the reference, whose
  * only interval machinery is the CLT path, custom_bplus_db.cpp:885-1043).
  *
  * Instead of resampling n rows B times (which cannot stream), each row
  * gets B independent Poisson(1) multipliers — the standard streaming
  * approximation of the multinomial bootstrap. Replica b's estimate is
  * `step · Σ m(r,b)·x(r)`; the percentile interval of the B replica
  * estimates is the CI. One scan, B+2 partially-aggregated sums, no extra
  * shuffle, no data explosion — the multipliers are computed inline from a
  * universal hash of the sampling key, so the whole construction is a pure
  * function of the data: deterministic, replayable by DuckDB, oracle-gated
  * (q148) rather than bound-gated.
  *
  * Multipliers: h_b = (h0·1299709 + b·104729 + 17) mod P with
  * h0 = key mod P, P = 1000003; m = Poisson(1) inverse CDF of h_b/P via an
  * integer threshold ladder (floor(cdf·P)) — integer comparisons only, no
  * float edge cases across engines. Why Poisson(1): E[m]=Var[m]=1 matches
  * the multinomial bootstrap to O(1/n), the de-facto standard for
  * distributed bootstrap.
  *
  * Value column discipline: pass an exact DECIMAL column — replica sums
  * stay order-independent (decimal algebra), one final double cast; the
  * percentile over B replica values uses Spark `percentile` ≡ DuckDB
  * `quantile_cont` (the q52-proven identity). */
object Bootstrap {

  val P: Long = 1000003L

  /** Cumulative Poisson(1) probabilities P(X ≤ k), k = 0..7 (≥ 8 has mass
    * ~1e-5·δ — the ladder's `otherwise`). Hardcoded so both engines use the
    * same constants rather than a platform exp(). */
  private val poissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  /** Integer thresholds floor(cdf·P) — shared with [[multiplierSql]]. */
  val thresholds: Seq[Long] = poissonCdf.map(c => math.floor(c * P).toLong)

  /** Poisson(1) multiplier from an integer hash in [0, P). */
  def multiplier(h: Column): Column =
    thresholds.tail.zipWithIndex
      .foldLeft(when(h < lit(thresholds.head), lit(0))) {
        case (acc, (t, i)) => acc.when(h < lit(t), lit(i + 1))
      }
      .otherwise(lit(thresholds.size))

  /** The identical ladder as SQL text (for DuckDB oracles). */
  def multiplierSql(hExpr: String): String =
    thresholds.zipWithIndex
      .map { case (t, i) => s"WHEN $hExpr < $t THEN $i" }
      .mkString("(CASE ", " ", s" ELSE ${thresholds.size} END)")

  /** Per-replica hash in [0, P) from the base hash `h0 = key mod P`. */
  def replicaHash(h0: Column, b: Int): Column =
    pmod(h0 * lit(1299709L) + lit(b.toLong * 104729L + 17L), lit(P))

  def replicaHashSql(h0Expr: String, bExpr: String): String =
    s"(($h0Expr * 1299709 + $bExpr * 104729 + 17) % $P)"

  /** Scaled-sum estimate over the deterministic 1-in-`step` systematic
    * sample of `key`, with a percentile-bootstrap CI from `replicas`
    * Poisson replicas. `lowerQ`/`upperQ` are the percentile points
    * (defaults = the 95% interval) — passed as exact literals, NOT derived
    * from a level by arithmetic, so the oracle's `0.025` parses to the
    * bit-identical double.
    * Output: `sum_est, ci_lower, ci_upper, n_samples, n_replicas`. */
  def bootstrapSumCi(df: DataFrame, value: Column, key: Column, step: Long,
      replicas: Int = 50, lowerQ: Double = 0.025,
      upperQ: Double = 0.975): DataFrame = {
    require(replicas >= 4, "need at least 4 replicas for a percentile CI")
    val sampled = df.filter(pmod(key, lit(step)) === 0)
    val h0 = pmod(key, lit(P))
    // replica sums ride LONG CENTS, not decimals: 50 decimal multiplies per
    // row dominate the scan (measured 14× a plain sum; cents cut it to a
    // few ×). Exact decimal → ×100 → long is lossless for (18,2) money;
    // long×int products and the running sum are ANSI-guarded (overflow
    // throws rather than wrapping — at ~9.2e18 cents ≈ $92 quadrillion
    // per replica, far past any real partition).
    val cents = (value * lit(100)).cast("long")
    val repSums: Seq[Column] = (0 until replicas).map { b =>
      (sum(cents * multiplier(replicaHash(h0, b))).cast("double") / lit(100.0))
        .as(s"__r$b")
    }
    val aggd = sampled.agg(
      (sum(value).cast("double") * step).as("sum_est"),
      count(lit(1)).as("n_samples") +: repSums: _*)
    aggd
      .select(col("sum_est"), col("n_samples"),
        explode(array((0 until replicas).map(b => col(s"__r$b") * step): _*))
          .as("__rep"))
      .groupBy(col("sum_est"), col("n_samples"))
      .agg(percentile(col("__rep"), lit(lowerQ)).as("ci_lower"),
        percentile(col("__rep"), lit(upperQ)).as("ci_upper"))
      .select(col("sum_est"), col("ci_lower"), col("ci_upper"),
        col("n_samples"), lit(replicas).as("n_replicas"))
  }
}
