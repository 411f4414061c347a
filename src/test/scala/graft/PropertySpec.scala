package graft

import org.apache.spark.sql.functions._

import graft.exec.{Estimators, Sampling}
import graft.model.AggKind

/** Property-style tests for the estimator algebra (SURVEY §5 test plan):
  * scale-invariance, degeneracy at full sampling, partition property, CI
  * shape — over seeded random tables (no scalatest↔scalacheck bridge in the
  * offline cache, so cases are generated with a fixed-seed RNG). */
class PropertySpec extends SparkSpec {

  private def table(values: Seq[Double]) = {
    import spark.implicits._
    values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
  }

  private val rng = new scala.util.Random(20260812L)
  private def randomValues(): List[Double] =
    List.fill(50 + rng.nextInt(250))(rng.nextDouble() * 2000.0 - 1000.0)

  test("systematic step=1 is exact for any data (property)") {
    (1 to 5).foreach { _ =>
      val vs = randomValues()
      val sf = Sampling.systematic(table(vs), col("id"), 1L)
      val got = Estimators.scaledAgg(sf, AggKind.Sum, col("x"), "s").head.getDouble(0)
      val want = vs.sum
      assert(math.abs(got - want) <= 1e-6 * math.max(1.0, math.abs(want)))
    }
  }

  test("systematic samples over all offsets partition the table (property)") {
    (1 to 5).foreach { _ =>
      val vs = randomValues()
      val step = 2L + rng.nextInt(6)
      val df = table(vs)
      val total = (0L until step).map(off =>
        Sampling.systematic(df, col("id"), step, off).df.count()).sum
      assert(total === vs.size.toLong, s"offsets at step $step must partition")
    }
  }

  test("scaled COUNT under systematic sampling on dense keys is near-exact") {
    (1 to 5).foreach { _ =>
      val vs = randomValues()
      val step = 2L + rng.nextInt(9)
      val sf = Sampling.systematic(table(vs), col("id"), step)
      val est = sf.df.count() * step
      // dense ids: residue-class count differs from n/step by < 1
      assert(math.abs(est - vs.size.toLong) < step * step)
    }
  }

  test("CI is centered on the estimate with non-negative width (property)") {
    (1 to 5).foreach { _ =>
      val vs = randomValues()
      val sf = Sampling.systematic(table(vs), col("id"), 2L)
      val r = Estimators.ciAgg(sf, AggKind.Avg, col("x"), "a").head
      val (v, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(lo <= v && v <= hi)
      assert(math.abs((v - lo) - (hi - v)) < 1e-9)
    }
  }

  test("uniform estimator is unbiased across seeds (mean of estimates ≈ truth)") {
    val vs = randomValues().map(math.abs) // positive for stable relative error
    val df = table(vs)
    val want = vs.sum
    val ests = (1 to 20).map { s =>
      Estimators.scaledAgg(Sampling.uniform(df, 0.3, seed = s.toLong),
        AggKind.Sum, col("x"), "s").head.getDouble(0)
    }
    val meanEst = ests.sum / ests.size
    assert(math.abs(meanEst - want) / want < 0.15,
      s"mean of 20 seeded estimates $meanEst vs $want")
  }
}
