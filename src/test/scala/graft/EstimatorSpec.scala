package graft

import org.apache.spark.sql.functions._

import graft.exec.{Estimators, Sampling}
import graft.model.AggKind

class EstimatorSpec extends SparkSpec {

  private def li = Tables.lineitem(spark, sf0001)
  private def liKey = col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L)

  lazy val exactSum: Double =
    li.agg(sum(col("l_extendedprice"))).head.getDouble(0)
  lazy val exactCount: Long = li.count()
  lazy val exactAvg: Double =
    li.agg(avg(col("l_quantity"))).head.getDouble(0)

  test("systematic step=1 degenerates to exact") {
    val sf = Sampling.systematic(li, liKey, step = 1L)
    val got = Estimators.scaledAgg(sf, AggKind.Sum, col("l_extendedprice"), "s")
      .head.getDouble(0)
    assert(math.abs(got - exactSum) / exactSum < 1e-12)
    assert(sf.df.count() === exactCount)
  }

  test("uniform fraction=1.0 degenerates to exact count") {
    val sf = Sampling.uniform(li, 1.0, seed = 7L)
    assert(sf.df.count() === exactCount)
  }

  test("systematic scaled SUM within 10% of exact at step=10") {
    val sf = Sampling.systematic(li, liKey, step = 10L)
    val got = Estimators.scaledAgg(sf, AggKind.Sum, col("l_extendedprice"), "s")
      .head.getDouble(0)
    assert(math.abs(got - exactSum) / exactSum < 0.10, s"got $got vs $exactSum")
  }

  test("systematic scaled COUNT within 10% of exact at step=10") {
    val sf = Sampling.systematic(li, liKey, step = 10L)
    val got = Estimators.scaledAgg(sf, AggKind.Count, col("l_extendedprice"), "c")
      .head.getDouble(0)
    assert(math.abs(got - exactCount) / exactCount < 0.10)
  }

  test("AVG is never scaled (contract parser.h:4-16)") {
    val sf = Sampling.systematic(li, liKey, step = 10L)
    val got = Estimators.scaledAgg(sf, AggKind.Avg, col("l_quantity"), "a")
      .head.getDouble(0)
    assert(math.abs(got - exactAvg) / exactAvg < 0.15)
  }

  test("CI covers the exact SUM at 95% for systematic offsets (coverage sweep)") {
    // seed-sweep analogue: different systematic offsets are independent-ish
    // samples of the same design; expect the 95% CI to cover the truth for
    // the clear majority of offsets.
    val step = 10L
    val covered = (0L until step).count { off =>
      val sf = Sampling.systematic(li, liKey, step, off)
      val r = Estimators.ciAgg(sf, AggKind.Sum, col("l_extendedprice"), "s").head
      r.getDouble(1) <= exactSum && exactSum <= r.getDouble(2)
    }
    assert(covered >= 8, s"only $covered/10 offsets covered the exact sum")
  }

  test("CI width shrinks roughly as 1/sqrt(n)") {
    def width(step: Long): Double = {
      val sf = Sampling.systematic(li, liKey, step)
      val r = Estimators.ciAgg(sf, AggKind.Avg, col("l_quantity"), "a").head
      r.getDouble(2) - r.getDouble(1)
    }
    val w4 = width(4L) // n ~ N/4
    val w64 = width(64L) // n ~ N/64 => width ~ 4x larger
    assert(w64 / w4 > 2.0 && w64 / w4 < 8.0, s"w4=$w4 w64=$w64 ratio=${w64 / w4}")
  }

  test("uniform sampling is deterministic under a fixed seed") {
    val a = Sampling.uniform(li, 0.2, seed = 42L).df.agg(sum("l_extendedprice")).head.getDouble(0)
    val b = Sampling.uniform(li, 0.2, seed = 42L).df.agg(sum("l_extendedprice")).head.getDouble(0)
    assert(a === b)
  }

  test("stratified sampleBy returns all strata at fraction 0.5") {
    val sf = Sampling.stratified(li, "l_returnflag", 0.5, seed = 42L)
    assert(sf.df.select("l_returnflag").distinct().count() === 3)
  }

  test("block sampling keeps whole blocks and scales counts") {
    val sf = Sampling.block(li, col("l_orderkey"), blockSize = 16L, skip = 4L)
    val est = sf.df.count() * 4
    assert(math.abs(est.toDouble - exactCount) / exactCount < 0.15)
  }

  test("dual-rate inclusion probability is honest") {
    val sf = Sampling.dualRate(li, liKey, coarseStep = 10L, fineStep = 5L)
    val est = sf.df.count() * sf.scaleFactor
    assert(math.abs(est - exactCount) / exactCount < 0.10, s"est=$est exact=$exactCount")
  }

  test("Neyman allocation samples high-variance strata harder and stays unbiased") {
    val (sf, scales) = Sampling.neymanStratified(li, "l_returnflag",
      col("l_extendedprice"), totalFraction = 0.2, seed = 7L)
    // per-stratum HT estimate with per-stratum scales
    val est = sf.df.join(scales, "l_returnflag")
      .agg(sum(col("l_extendedprice") * col("strata_scale"))).head().getDouble(0)
    assert(math.abs(est - exactSum) / exactSum < 0.15, s"est=$est exact=$exactSum")
    // all strata present, scales positive
    assert(scales.count() === 3)
    assert(scales.collect().forall(_.getDouble(1) >= 1.0))
  }

  test("confidence heuristic matches reference custom_scheduler.cpp:296-305") {
    assert(Estimators.confidenceForSampleSize(1500) === 0.95)
    assert(Estimators.confidenceForSampleSize(600) === 0.90)
    assert(Estimators.confidenceForSampleSize(200) === 0.85)
    assert(Estimators.confidenceForSampleSize(60) === 0.80)
    assert(Estimators.confidenceForSampleSize(10) === 0.70)
  }

  test("quality validator thresholds relative error") {
    assert(Estimators.validateQuality(100.0, 103.0, 5.0))
    assert(!Estimators.validateQuality(100.0, 110.0, 5.0))
    assert(Estimators.validateQuality(0.0, 0.0, 5.0))
  }

  test("byIndex gathers exactly the requested keys") {
    val got = Sampling.byIndex(li, col("l_orderkey"), Seq(1L, 2L, 3L))
      .select("l_orderkey").distinct().collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(Set(1L, 2L, 3L)) && got.nonEmpty)
  }

  test("zScore table matches reference executor.cpp:188-189") {
    assert(Estimators.zScore(0.99) === 2.576)
    assert(Estimators.zScore(0.95) === 1.96)
    assert(Estimators.zScore(0.90) === 1.645)
  }
}
