package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Confidence-interval result of a single-pass moment aggregation. */
final case class Ci(value: Double, ciLower: Double, ciUpper: Double, n: Long)

/** Moment buffer: (n, Σx, Σx²). */
final case class Moments(n: Long, s: Double, s2: Double)

/** Single-pass CLT confidence-interval aggregate as a typed Spark
  * `Aggregator` — the reusable form of the reference's CI computation
  * (executor.cpp:130-200: one pass computing COUNT/SUM/SUM(x·x), then
  * mean, var = (Σx²−(Σx)²/n)/(n−1), se = √(var/n), margin = z·se), usable
  * inside any `agg`/`groupBy` and registered for SQL as `ci_avg`/`ci_sum`.
  *
  * `scale` > 1 produces the SUM estimate for a 1/scale sample with bug B2
  * corrected (SURVEY §2.6): value = Σx·scale, margin = z·se·scale·n.
  * `scale` = 1 with `isSum=false` is a plain mean CI.
  *
  * Merge is associative/commutative on the raw moments — Spark's
  * partial/final aggregation (thread-local accumulate + merge in the
  * reference, custom_bplus_db.cpp:1962-2048) applies unchanged.
  */
final class CiAggregator(isSum: Boolean, scale: Double, z: Double = 1.96)
    extends Aggregator[Double, Moments, Ci] {

  override def zero: Moments = Moments(0L, 0.0, 0.0)

  override def reduce(b: Moments, x: Double): Moments =
    Moments(b.n + 1, b.s + x, b.s2 + x * x)

  override def merge(a: Moments, b: Moments): Moments =
    Moments(a.n + b.n, a.s + b.s, a.s2 + b.s2)

  override def finish(m: Moments): Ci = {
    if (m.n == 0) return Ci(0.0, 0.0, 0.0, 0L)
    val n = m.n.toDouble
    val mean = m.s / n
    val variance = if (m.n > 1) (m.s2 - m.s * m.s / n) / (n - 1.0) else 0.0
    val se = math.sqrt(variance / n)
    val (value, margin) =
      if (isSum) (m.s * scale, z * se * scale * n)
      else (mean, z * se)
    Ci(value, value - margin, value + margin, m.n)
  }

  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[Ci] = Encoders.product[Ci]
}

object CiAggregator {
  import org.apache.spark.sql.{SparkSession, TypedColumn, functions => F}

  /** Typed column: CI of the mean. */
  def ciAvg(z: Double = 1.96): TypedColumn[Double, Ci] =
    new CiAggregator(isSum = false, scale = 1.0, z).toColumn

  /** Typed column: CI of a scaled SUM over a 1/scale sample. */
  def ciSum(scale: Double, z: Double = 1.96): TypedColumn[Double, Ci] =
    new CiAggregator(isSum = true, scale, z).toColumn

  /** Register `ci_avg(x)` and `ci_sum(x, scale)` for SQL use. The SQL form
    * fixes scale at registration (SQL UDAF params must be data columns). */
  def register(spark: SparkSession, sumScale: Double = 1.0): Unit = {
    spark.udf.register("ci_avg",
      F.udaf(new CiAggregator(isSum = false, 1.0), Encoders.scalaDouble))
    spark.udf.register("ci_sum",
      F.udaf(new CiAggregator(isSum = true, sumScale), Encoders.scalaDouble))
  }
}
