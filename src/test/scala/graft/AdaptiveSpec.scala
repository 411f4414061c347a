package graft

import org.apache.spark.sql.functions._

import graft.exec.AdaptiveExecutor
import graft.model.{AggKind, ApproximationStatus, SamplingStrategy}

class AdaptiveSpec extends SparkSpec {

  private def li = Tables.lineitem(spark, sf0001)

  test("adaptive SUM converges within threshold and reports STABLE") {
    val exact = li.agg(sum("l_extendedprice")).head.getDouble(0)
    val out = AdaptiveExecutor.run(li, col("l_extendedprice"), AggKind.Sum,
      SamplingStrategy.Adaptive(errorThresholdPct = 5.0, initialFraction = 0.05))
    assert(out.result.status === ApproximationStatus.Stable)
    assert(out.result.relativeErrorPct <= 5.0 + 1e-9)
    assert(math.abs(out.result.value - exact) / exact < 0.15)
    assert(out.rounds.nonEmpty && out.rounds.size <= 6)
  }

  test("tight threshold grows the fraction across rounds") {
    val out = AdaptiveExecutor.run(li, col("l_extendedprice"), AggKind.Sum,
      SamplingStrategy.Adaptive(errorThresholdPct = 0.5, initialFraction = 0.01,
        maxRounds = 4))
    assert(out.rounds.size > 1, "should need more than one round at 0.5%")
    assert(out.rounds.map(_.fraction).distinct.size === out.rounds.size,
      "fractions should grow")
  }

  test("AVG adaptive is unscaled and near exact") {
    val exact = li.agg(avg("l_quantity")).head.getDouble(0)
    val out = AdaptiveExecutor.run(li, col("l_quantity"), AggKind.Avg,
      SamplingStrategy.Adaptive(errorThresholdPct = 5.0, initialFraction = 0.1))
    assert(math.abs(out.result.value - exact) / exact < 0.10)
  }
}
