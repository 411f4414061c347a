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

  test("jackknife CI is centered on the expansion estimate and covers truth") {
    val samp = li.filter(pmod(liKey, lit(10L)) === 0)
    val r = Estimators.jackknifeSum(samp,
      pmod(expr("(l_orderkey * 8191 + l_linenumber * 131) div 10"), lit(8L)),
      col("l_extendedprice"), scale = 10.0, k = 8, alias = "s").head
    val (est, se, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    assert(se > 0.0)
    assert(math.abs((lo + hi) / 2 - est) < 1e-6 * math.abs(est))
    assert(lo <= exactSum && exactSum <= hi,
      s"95% jackknife CI [$lo, $hi] misses truth $exactSum")
  }

  test("ratio estimator beats plain expansion on correlated price/quantity") {
    val samp = li.filter(pmod(liKey, lit(10L)) === 0)
    val r = Estimators.ratioSum(samp, li, col("l_extendedprice"),
      col("l_quantity"), scale = 10.0, alias = "s").head
    val (ratioEst, htEst) = (r.getDouble(0), r.getDouble(1))
    // both estimates are consistent; the ratio-adjusted one should sit at
    // least as close to truth given the positive price/quantity correlation
    assert(math.abs(ratioEst - exactSum) / exactSum < 0.10)
    assert(math.abs(htEst - exactSum) / exactSum < 0.10)
    assert(math.abs(ratioEst - exactSum) <= math.abs(htEst - exactSum) * 1.5,
      s"ratio $ratioEst vs ht $htEst vs truth $exactSum")
  }

  test("GREG regression estimator is consistent and fits a finite slope") {
    val samp = li.filter(pmod(liKey, lit(10L)) === 0)
    val r = Estimators.regressionSum(samp, li, col("l_extendedprice"),
      col("l_quantity"), scale = 10.0, alias = "s").head
    val (greg, ht, b) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    // the synthetic fixture's price is nearly independent of quantity, so
    // the slope's SIGN is data, not contract — only finiteness is
    assert(!b.isNaN && !b.isInfinite)
    assert(math.abs(greg - exactSum) / exactSum < 0.10, s"greg $greg")
    assert(math.abs(ht - exactSum) / exactSum < 0.10)
  }

  test("hybrid group sum routes by size and is exact for small groups") {
    // suppkey groups at sf0.001 are ~50-70 rows: threshold above forces
    // all-exact; threshold 1 forces all-sampled
    val allExact = Estimators.hybridGroupSum(li, "l_suppkey",
      col("l_extendedprice"), liKey, step = 5L, minGroupSize = 1000000L)
    assert(allExact.filter(col("method") =!= "exact").count() == 0)
    val truth = li.groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
        .as("t")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    allExact.collect().foreach { r =>
      assert(math.abs(r.getDouble(3) - truth(r.getLong(0))) < 1e-6)
    }
    val allSampled = Estimators.hybridGroupSum(li, "l_suppkey",
      col("l_extendedprice"), liKey, step = 5L, minGroupSize = 1L)
    assert(allSampled.filter(col("method") =!= "sampled").count() == 0)
    // 20% sample scaled by 5: each group's estimate lands near truth
    val offs = allSampled.collect().map { r =>
      math.abs(r.getDouble(3) - truth(r.getLong(0))) / truth(r.getLong(0))
    }
    assert(offs.sum / offs.length < 0.25, "mean per-group rel error too big")
  }

  test("estimator ladder offset sweep: jackknife covers, ratio/GREG stay consistent") {
    // every offset of the 10% systematic design is an equally-valid
    // sample; sweeping all 10 turns one anecdote into a coverage check
    val results = (0L until 10L).map { off =>
      val samp = li.filter(pmod(liKey, lit(10L)) === off)
      val jk = Estimators.jackknifeSum(samp,
        pmod(expr("(l_orderkey * 8191 + l_linenumber * 131) div 10"), lit(8L)),
        col("l_extendedprice"), scale = 10.0, k = 8, alias = "s").head
      val ratio = Estimators.ratioSum(samp, li, col("l_extendedprice"),
        col("l_quantity"), scale = 10.0, alias = "s").head.getDouble(0)
      val greg = Estimators.regressionSum(samp, li, col("l_extendedprice"),
        col("l_quantity"), scale = 10.0, alias = "s").head.getDouble(0)
      (jk.getDouble(2), jk.getDouble(3), ratio, greg)
    }
    val covered = results.count { case (lo, hi, _, _) =>
      lo <= exactSum && exactSum <= hi }
    assert(covered >= 8, s"jackknife 95% CI covered only $covered/10 offsets")
    results.foreach { case (_, _, ratio, greg) =>
      assert(math.abs(ratio - exactSum) / exactSum < 0.10)
      assert(math.abs(greg - exactSum) / exactSum < 0.10)
    }
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

  test("stratified fails loudly above the MaxStrata cap instead of OOMing the driver") {
    import spark.implicits._
    val wide = spark.range(Sampling.MaxStrata * 2L).toDF("k")
    val ex = intercept[IllegalArgumentException] {
      Sampling.stratified(wide, "k", 0.5)
    }
    assert(ex.getMessage.contains("stratifiedSystematic"))
    val ex2 = intercept[IllegalArgumentException] {
      Sampling.neymanStratified(wide, "k", col("k"), 0.5)
    }
    assert(ex2.getMessage.contains("stratifiedSystematic"))
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

  test("dualRate reports its own strategy tag, not Exact") {
    val sf = Sampling.dualRate(li, liKey, coarseStep = 10L, fineStep = 7L)
    assert(sf.strategy === graft.model.SamplingStrategy.DualRate(10L, 7L))
    assert(math.abs(sf.scaleFactor - 1.0 / (0.1 + 1.0 / 7 - 1.0 / 70)) < 1e-12)
  }

  test("COUNT CI margin is zero for deterministic-n designs, nonzero for Bernoulli") {
    val sys = Sampling.systematic(li, liKey, step = 10L)
    val sysRow = Estimators.ciAgg(sys, AggKind.Count, lit(1L), "cnt").head()
    assert(sysRow.getDouble(0) === sysRow.getDouble(1) &&
      sysRow.getDouble(0) === sysRow.getDouble(2),
      "systematic n is deterministic: margin must be 0")
    val uni = Sampling.uniform(li, 0.1, seed = 11L)
    val uniRow = Estimators.ciAgg(uni, AggKind.Count, lit(1L), "cnt").head()
    assert(uniRow.getDouble(1) < uniRow.getDouble(0) &&
      uniRow.getDouble(0) < uniRow.getDouble(2),
      "Bernoulli realized n is binomial: margin must be > 0")
  }

  test("design-aware block CI covers on clustered data where SRS CI under-covers") {
    // 40 blocks of 100 rows; value constant WITHIN a block, pseudo-random
    // ACROSS blocks -> all variance is between-cluster. An SRS formula sees
    // n=1000 'independent' rows and shrinks the margin by ~sqrt(100) too much.
    val df = spark.range(0, 4000)
      .select(col("id"),
        (pmod(floor(col("id") / lit(100L)) * lit(2654435761L), lit(997L)))
          .cast("double").as("v"))
    val exact = df.agg(sum(col("v"))).head().getDouble(0)
    val sf = Sampling.block(df, col("id"), blockSize = 100L, skip = 4L)
    val srs = Estimators.ciAgg(sf, AggKind.Sum, col("v"), "s").head()
    val blk = Estimators.blockCiSum(sf.df, floor(col("id") / lit(100L)),
      col("v"), skip = 4.0, alias = "s").head()
    val srsMargin = (srs.getDouble(2) - srs.getDouble(1)) / 2.0
    val blkMargin = (blk.getDouble(2) - blk.getDouble(1)) / 2.0
    assert(blkMargin > 2.0 * srsMargin,
      s"design effect must widen the CI: block=$blkMargin srs=$srsMargin")
    assert(blk.getDouble(1) <= exact && exact <= blk.getDouble(2),
      s"block CI [${blk.getDouble(1)}, ${blk.getDouble(2)}] must cover exact=$exact")
    // same story for the MEAN: ratio-estimator CI vs the SRS AVG formula
    val exactAvg = df.agg(avg(col("v"))).head().getDouble(0)
    val srsAvg = Estimators.ciAgg(sf, AggKind.Avg, col("v"), "a").head()
    val blkAvg = Estimators.blockCiAvg(sf.df, floor(col("id") / lit(100L)),
      col("v"), skip = 4.0, alias = "a").head()
    val srsAvgMargin = (srsAvg.getDouble(2) - srsAvg.getDouble(1)) / 2.0
    val blkAvgMargin = (blkAvg.getDouble(2) - blkAvg.getDouble(1)) / 2.0
    assert(blkAvgMargin > 2.0 * srsAvgMargin,
      s"AVG design effect: block=$blkAvgMargin srs=$srsAvgMargin")
    assert(blkAvg.getDouble(1) <= exactAvg && exactAvg <= blkAvg.getDouble(2),
      s"block AVG CI [${blkAvg.getDouble(1)}, ${blkAvg.getDouble(2)}] must cover $exactAvg")
  }

  test("equal-allocation value-ntile stratification takes the same n from each stratum") {
    val sampled = Sampling.equalAllocationStratified(li,
      col("l_extendedprice"), liKey, strataCount = 4, samplesPerStratum = 300)
    val perStratum = sampled.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perStratum.keySet === Set(1, 2, 3, 4))
    assert(perStratum.values.forall(_ === 300L),
      s"equal allocation violated: $perStratum")
    // stratified mean-of-per-stratum-estimates stays near the exact AVG
    val est = sampled
      .groupBy(col("stratum"), col("n_h"))
      .agg((sum(col("l_extendedprice")) / count(lit(1))).as("avg_h"))
      .agg(sum(col("avg_h") * col("n_h"))).head().getDouble(0) / exactCount
    assert(math.abs(est - li.agg(avg(col("l_extendedprice"))).head().getDouble(0)) /
      li.agg(avg(col("l_extendedprice"))).head().getDouble(0) < 0.05)
  }

  test("deterministic Neyman systematic allocates more sampling to high-variance strata") {
    val (sampled, steps) = Sampling.neymanSystematic(li, "l_returnflag",
      col("l_extendedprice"), liKey, totalFraction = 0.1)
    assert(steps.map(_._1).sorted === Seq("A", "N", "R"))
    assert(steps.forall(_._2 >= 1L))
    // realized sample ≈ Σ n_h/step_h; should land near 10% of the table
    val n = sampled.count().toDouble
    assert(math.abs(n / exactCount - 0.1) < 0.05, s"sampled $n of $exactCount")
    // estimate with per-stratum scale step_h
    val stepCol = steps.tail.foldLeft(
      when(col("l_returnflag") === steps.head._1, lit(steps.head._2))) {
      case (acc, (k, st)) => acc.when(col("l_returnflag") === k, lit(st))
    }.otherwise(lit(1L))
    val est = sampled.agg(sum(col("l_extendedprice") * stepCol.cast("double")))
      .head().getDouble(0)
    assert(math.abs(est - exactSum) / exactSum < 0.1, s"est=$est exact=$exactSum")
  }

  test("PPS sample hits the target size and the HT estimator lands near the exact sum") {
    val (sampled, n, _) = Sampling.pps(li, col("l_quantity"), liKey, targetFraction = 0.1)
    val got = sampled.count()
    assert(math.abs(got - 0.1 * n) / (0.1 * n) < 0.15, s"E[n]=${0.1 * n} got=$got")
    val ht = sampled.agg(sum(col("l_extendedprice") / col("pps_p")))
      .head().getDouble(0)
    // y = qty x unit-price with ~10x unit-price spread, so HT keeps the
    // unit-price variance: ~600 draws at sf0.001 puts 2 s.e. near 8%
    assert(math.abs(ht - exactSum) / exactSum < 0.10, s"ht=$ht exact=$exactSum")
    // every inclusion probability is in (0, 1]
    assert(sampled.filter(col("pps_p") <= 0 || col("pps_p") > 1).isEmpty)
  }

  test("moment sketches merge exactly: fine partials ≡ direct coarse sketch") {
    val docs = Tables.documents(spark, sf0001)
    val fine = graft.exec.Estimators.momentSketch(docs, col("n_chars"),
      Seq("source", "lang"))
    val mergedOfFine = graft.exec.Estimators.mergeMoments(fine, Seq("source"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2), r.getDecimal(3)))).toMap
    val direct = graft.exec.Estimators.momentSketch(docs, col("n_chars"),
      Seq("source"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2), r.getDecimal(3)))).toMap
    assert(mergedOfFine === direct) // bit-exact, not approximate
    assert(direct.nonEmpty)
    // stats projection: mean matches plain avg on a group
    val (src, (n, s1, _)) = direct.head
    val stats = graft.exec.Estimators.momentStats(
        graft.exec.Estimators.mergeMoments(fine, Seq("source")))
      .filter(col("source") === src).head()
    assert(stats.getLong(1) === n)
    assert(math.abs(stats.getDouble(2) - s1.doubleValue / n) < 1e-12)
    // variance is non-negative and zero only for constant groups
    assert(stats.getDouble(3) >= 0.0)
  }

  test("poisson bootstrap: deterministic, brackets the estimate, covers the truth") {
    import graft.exec.Bootstrap
    val li = Tables.lineitem(spark, sf001)
    val key = col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L)
    val value = col("l_extendedprice").cast("decimal(18,2)")
    def run() = Bootstrap.bootstrapSumCi(li, value, key, step = 10L,
      replicas = 50).head
    val a = run(); val b = run()
    assert(a === b, "pure function of the data: two runs must be identical")
    val (est, lo, hi) = (a.getDouble(0), a.getDouble(1), a.getDouble(2))
    assert(lo < est && est < hi, s"percentile CI must bracket the estimate: $lo $est $hi")
    val exact = li.agg(sum(value).cast("double")).head.getDouble(0)
    // 10% systematic sample of ~600k rows: the bootstrap interval should
    // comfortably cover the exact sum on this fixture
    assert(lo <= exact && exact <= hi, s"CI [$lo, $hi] misses exact $exact")
    // replica spread ~ ±0.5%: sane, not degenerate
    assert((hi - lo) / est < 0.05 && hi > lo)
    // multiplier ladder: mean multiplier over the sample ≈ E[Poisson(1)] = 1
    val meanMult = li.filter(pmod(key, lit(10L)) === 0)
      .select(Bootstrap.multiplier(
        Bootstrap.replicaHash(pmod(key, lit(Bootstrap.P)), 0))
        .cast("double").as("m"))
      .agg(avg(col("m"))).head.getDouble(0)
    assert(math.abs(meanMult - 1.0) < 0.02, s"mean multiplier $meanMult")
  }
}
