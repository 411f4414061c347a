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

  private def liKey = col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L)

  test("deterministic ladder: bit-identical across runs, CI covers exact, early stop") {
    val exact = li.agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
      .cast("double")).head.getDouble(0)
    val a = AdaptiveExecutor.runDeterministic(li, col("l_extendedprice"),
      liKey, steps = Seq(20L, 10L, 5L), errorThresholdPct = 5.0)
    val b = AdaptiveExecutor.runDeterministic(li, col("l_extendedprice"),
      liKey, steps = Seq(20L, 10L, 5L), errorThresholdPct = 5.0)
    // pure function of the data: every field identical, including doubles
    assert(a.result.value == b.result.value &&
      a.result.ciLower == b.result.ciLower &&
      a.result.ciUpper == b.result.ciUpper &&
      a.result.status == b.result.status &&
      a.rounds == b.rounds)
    assert(a.result.ciLower <= exact && exact <= a.result.ciUpper,
      s"CI [${a.result.ciLower}, ${a.result.ciUpper}] misses exact $exact")
    // 5% at sf0.001 (~6k rows): the 5% round (n≈300) shouldn't converge,
    // later rounds refine — rounds are nested so estimates tighten
    assert(a.rounds.size >= 1 && a.rounds.size <= 3)
    assert(a.rounds.map(_.n).zip(a.rounds.tail.map(_.n)).forall {
      case (n1, n2) => n2 > n1 }, "nested rounds must grow")
  }

  test("grouped ladder: exact routing below the floor, replayable, CIs bracket, sampled groups converge per group") {
    import spark.implicits._
    // planted strata: two big groups (ladder) + one tiny group (exact)
    val grp = when(pmod(col("l_orderkey"), lit(997L)) === 0, lit("RARE"))
      .otherwise(col("l_returnflag"))
    def once() = AdaptiveExecutor.runGroupedDeterministic(li,
        col("l_extendedprice"), liKey, grp,
        steps = Seq(20L, 10L, 5L), errorThresholdPct = 5.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getInt(6),
        r.getString(7)))
    val a = once(); val b = once()
    assert(a.toSeq === b.toSeq, "pure function of the data")
    val byGroup = a.map(t => t._1 -> t).toMap
    val exact = li.groupBy(grp.as("g"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    a.foreach { case (g, nRows, est, lo, hi, nUsed, rounds, status) =>
      assert(lo <= est && est <= hi, s"$g CI malformed")
      if (nRows < 250) {
        // sub-floor groups answer EXACTLY with a zero-width CI
        assert(status === "Exact" && rounds === 0 && nUsed === nRows)
        assert(est === exact(g) && lo === est && hi === est)
      } else {
        assert(rounds >= 1 && rounds <= 3 && nUsed < nRows,
          s"$g should have sampled, not scanned")
        assert(math.abs(est - exact(g)) / math.abs(exact(g)) < 0.25,
          s"$g estimate $est far from ${exact(g)}")
      }
    }
    assert(a.exists(_._8 == "Exact") && a.exists(_._8 != "Exact"),
      "fixture must exercise both routes")
  }

  test("grouped ladder keys NULL groups as __null__ instead of dropping them") {
    import spark.implicits._
    // round-6 ADVICE: isin() never matches SQL NULL, so an un-coalesced
    // null group either reported est=0 (ladder) or vanished (exact route).
    // 2000 null + 2000 'g' rows of a constant value: both ride the ladder
    // (>= exactCut 250) and a constant has zero variance, so the estimate
    // must be EXACTLY n*10 — a null group that lost its moments cannot
    // fake that.
    val df = spark.range(4000).select(col("id").as("k"), lit(10.0).as("v"),
      when(pmod(col("id"), lit(2)) === 0, lit(null).cast("string"))
        .otherwise(lit("g")).as("g"))
    val out = AdaptiveExecutor.runGroupedDeterministic(df, col("v"),
        col("k"), col("g"), steps = Seq(20L, 10L, 5L),
        errorThresholdPct = 5.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getString(7)))).toMap
    assert(out.keySet === Set("__null__", "g"))
    val (nNull, estNull, stNull) = out("__null__")
    assert(nNull === 2000L && estNull === 20000.0)
    assert(stNull != "InsufficientData")
    assert(out("g")._2 === 20000.0)
  }

  test("deterministic ladder rejects non-nested steps and flags tiny samples") {
    intercept[IllegalArgumentException] {
      AdaptiveExecutor.runDeterministic(li, col("l_extendedprice"), liKey,
        steps = Seq(20L, 7L))
    }
    // a sample too small for the CLT gate reports InsufficientData
    val tiny = li.limit(40)
    val out = AdaptiveExecutor.runDeterministic(tiny, col("l_extendedprice"),
      liKey, steps = Seq(1L), errorThresholdPct = 50.0)
    assert(out.result.status === ApproximationStatus.InsufficientData)
  }
}
