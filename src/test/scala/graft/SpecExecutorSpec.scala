package graft

import graft.exec.SpecExecutor
import graft.parser.QueryParser

/** End-to-end tests of the parse→plan→execute path (reference entry B:
  * SQL string + flags in, result rows out). */
class SpecExecutorSpec extends SparkSpec {

  private def ensureTables(): Unit = Tables.registerAll(spark, sf0001)

  test("exact SUM query end to end") {
    ensureTables()
    val spec = QueryParser.parse("SELECT SUM(l_extendedprice) FROM lineitem")
    val r = SpecExecutor.run(spark, spec)
    assert(r.columns.toSeq === Seq("sum_l_extendedprice"))
    val direct = spark.table("lineitem")
      .agg(org.apache.spark.sql.functions.sum("l_extendedprice")).head().getDouble(0)
    assert(r.head().getDouble(0) === direct)
  }

  test("WHERE + GROUP BY query end to end") {
    ensureTables()
    val spec = QueryParser.parse(
      "SELECT AVG(l_quantity) FROM lineitem WHERE l_linestatus = 'F' GROUP BY l_returnflag")
    val rows = SpecExecutor.run(spark, spec).collect()
    assert(rows.length === 3)
  }

  test("APPROX() query samples and scales") {
    ensureTables()
    val spec = QueryParser.parse("SELECT APPROX(SUM(l_extendedprice)) FROM lineitem")
    val est = SpecExecutor.run(spark, spec).head().getDouble(0)
    val exact = spark.table("lineitem")
      .agg(org.apache.spark.sql.functions.sum("l_extendedprice")).head().getDouble(0)
    assert(math.abs(est - exact) / exact < 0.5, s"est=$est exact=$exact")
  }

  test("CI flag adds interval columns") {
    ensureTables()
    val spec = QueryParser.parse("SELECT SUM(l_extendedprice) FROM lineitem",
      samplePercent = Some(10.0), withCi = true)
    val r = SpecExecutor.run(spark, spec)
    assert(r.columns.toSeq === Seq("sum_l_extendedprice",
      "sum_l_extendedprice_ci_lower", "sum_l_extendedprice_ci_upper",
      "sum_l_extendedprice_n"))
    val row = r.head()
    assert(row.getDouble(1) <= row.getDouble(0) && row.getDouble(0) <= row.getDouble(2))
  }

  test("count-exact-compat answers COUNT from the stored total under sampling (A4)") {
    ensureTables()
    val spec = QueryParser.parse("SELECT COUNT(*) FROM lineitem",
      samplePercent = Some(10.0)).copy(countExactCompat = true)
    val r = SpecExecutor.run(spark, spec).head().getDouble(0)
    assert(r === spark.table("lineitem").count().toDouble)
  }

  test("--compat maps --error to the reference's fixed fraction table") {
    import graft.exec.ApproxPlanner
    import graft.model.SamplingStrategy
    // enhanced_aqe_cli.py:243-250: <=1 -> 20%, <=2 -> 15%, <=5 -> 10%, else 5%
    def planned(err: Double) = ApproxPlanner.plan(
      QueryParser.parse("SELECT SUM(l_extendedprice) FROM lineitem",
        errorThresholdPct = Some(err)),
      method = None, compat = true, seed = None).sampling
    assert(planned(1.0) === SamplingStrategy.Uniform(0.20, 42L))
    assert(planned(2.0) === SamplingStrategy.Uniform(0.15, 42L))
    assert(planned(5.0) === SamplingStrategy.Uniform(0.10, 42L))
    assert(planned(10.0) === SamplingStrategy.Uniform(0.05, 42L))
    // WITHOUT --compat the same flag still runs the adaptive loop
    val noCompat = ApproxPlanner.plan(
      QueryParser.parse("SELECT SUM(l_extendedprice) FROM lineitem",
        errorThresholdPct = Some(2.0)),
      method = None, compat = false, seed = None).sampling
    assert(noCompat.isInstanceOf[SamplingStrategy.Adaptive])
  }

  test("--method routes to the right design; --seed re-seeds Bernoulli") {
    import graft.exec.ApproxPlanner
    import graft.model.SamplingStrategy
    val base = QueryParser.parse("SELECT SUM(l_extendedprice) FROM lineitem",
      samplePercent = Some(10.0))
    assert(ApproxPlanner.plan(base, Some("systematic"), compat = false, seed = None)
      .sampling === SamplingStrategy.Systematic(10L))
    assert(ApproxPlanner.plan(base, Some("block"), compat = false, seed = None)
      .sampling === SamplingStrategy.Block(64L, 10L))
    assert(ApproxPlanner.plan(base, Some("random"), compat = false, seed = Some(7L))
      .sampling === SamplingStrategy.Uniform(0.10, 7L))
    assert(ApproxPlanner.plan(base, None, compat = false, seed = Some(9L))
      .sampling === SamplingStrategy.Uniform(0.10, 9L))
    // size router (enhanced_aqe_cli.py:178-186): big -> stride, medium ->
    // random probe, small -> sequential/cluster
    assert(ApproxPlanner.routeBySize(60000L, 0.1, 42L) === SamplingStrategy.Systematic(10L))
    assert(ApproxPlanner.routeBySize(20000L, 0.1, 42L) === SamplingStrategy.Uniform(0.1, 42L))
    assert(ApproxPlanner.routeBySize(5000L, 0.1, 42L) === SamplingStrategy.Block(64L, 10L))
    // query-shape recommendation (enhanced_aqe_cli.py:116-131)
    assert(ApproxPlanner.optimalMethod("SELECT SUM(x) FROM t", Some(200000L)) === "revolutionary")
    assert(ApproxPlanner.optimalMethod("SELECT SUM(x) FROM t", Some(1000L)) === "clt")
    assert(ApproxPlanner.optimalMethod("SELECT AVG(x) FROM t", None) === "random")
    assert(ApproxPlanner.optimalMethod("SELECT MIN(x) FROM t GROUP BY g", None) === "parallel")
  }

  test("default sampling key is content-based: same rows under any partitioning") {
    import org.apache.spark.sql.functions._
    import graft.model.SamplingStrategy
    val aqe = graft.api.AqeSession(spark)
    val df = Tables.lineitem(spark, sf0001)
    // exact decimal sum: order-independent, so only the selected ROW SET
    // matters (a double sum would drift ~1e-15 with partition order)
    def sampledSum(d: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      aqe.table(d).sampled(SamplingStrategy.Systematic(7L)).df
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")))
        .head().getDecimal(0)
    // monotonically_increasing_id would pick a different row set per layout
    assert(sampledSum(df) === sampledSum(df.repartition(13)))
    assert(sampledSum(df) === sampledSum(df.coalesce(1)))
  }

  test("--error routes through the adaptive executor with status column") {
    ensureTables()
    val spec = QueryParser.parse("SELECT SUM(l_extendedprice) FROM lineitem",
      errorThresholdPct = Some(5.0))
    val r = SpecExecutor.run(spark, spec)
    assert(r.columns.contains("status"))
    assert(Set("Stable", "Drifting", "InsufficientData").contains(r.head().getString(4)))
  }

  test("--error with GROUP BY routes to the per-group ladder for SUM/AVG/COUNT") {
    import org.apache.spark.sql.functions._
    ensureTables()
    val spec = QueryParser.parse(
      "SELECT SUM(l_extendedprice) FROM lineitem GROUP BY l_returnflag",
      errorThresholdPct = Some(5.0))
    val r = SpecExecutor.run(spark, spec)
    assert(r.columns.toSeq === Seq("l_returnflag", "sum_l_extendedprice",
      "sum_l_extendedprice_ci_lower", "sum_l_extendedprice_ci_upper",
      "sum_l_extendedprice_n", "status"))
    val rows = r.collect()
    assert(rows.length === 3) // A / N / R
    rows.foreach { row =>
      assert(Set("Stable", "Drifting", "InsufficientData", "Exact")
        .contains(row.getString(5)), row.toString)
      assert(row.getDouble(2) <= row.getDouble(1) &&
        row.getDouble(1) <= row.getDouble(3), s"CI does not bracket: $row")
    }
    // round-7 verdict item 4: AVG rides the same moment ladder with a
    // ratio CI (no scale factor) — the per-group estimate must track the
    // exact per-group mean and its CI must bracket it
    val exactAvg = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_extendedprice")).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val avgSpec = QueryParser.parse(
      "SELECT AVG(l_extendedprice) FROM lineitem GROUP BY l_returnflag",
      errorThresholdPct = Some(5.0))
    val ar = SpecExecutor.run(spark, avgSpec)
    assert(ar.columns.toSeq === Seq("l_returnflag", "avg_l_extendedprice",
      "avg_l_extendedprice_ci_lower", "avg_l_extendedprice_ci_upper",
      "avg_l_extendedprice_n", "status"))
    val arows = ar.collect()
    assert(arows.length === 3)
    arows.foreach { row =>
      val truth = exactAvg(row.getString(0))
      assert(math.abs(row.getDouble(1) - truth) / truth < 0.2,
        s"avg estimate far from exact: $row vs $truth")
      if (row.getString(5) == "Stable")
        assert(row.getDouble(2) <= truth && truth <= row.getDouble(3),
          s"stable avg CI must bracket exact: $row vs $truth")
    }
    // COUNT is the n-moment alone: estimate ≈ exact group size, CI covers
    val exactCnt = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cntSpec = QueryParser.parse(
      "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag",
      errorThresholdPct = Some(10.0))
    val cr = SpecExecutor.run(spark, cntSpec)
    cr.collect().foreach { row =>
      val truth = exactCnt(row.getString(0)).toDouble
      assert(math.abs(row.getDouble(1) - truth) / truth < 0.3,
        s"count estimate far from exact: $row vs $truth")
    }
    // unsupported aggregates still refuse loudly, not bias
    val minSpec = QueryParser.parse(
      "SELECT MIN(l_extendedprice) FROM lineitem GROUP BY l_returnflag",
      errorThresholdPct = Some(5.0))
    val e = intercept[IllegalArgumentException](SpecExecutor.run(spark, minSpec))
    assert(e.getMessage.contains("grouped adaptive undefined"))
  }

  test("--method file skips part-files physically and brackets the exact sum") {
    import org.apache.spark.sql.functions._
    import graft.exec.ApproxPlanner
    import graft.model.SamplingStrategy
    // a genuinely multi-file table: 8 part-files keyed so files are
    // exchangeable (hash layout), written once per suite run
    val dir = java.nio.file.Files.createTempDirectory("graft_filesamp").toString
    Tables.lineitem(spark, sf0001).repartition(8).write
      .mode("overwrite").parquet(dir)
    val multi = spark.read.parquet(dir)
    multi.createOrReplaceTempView("lineitem_multi")
    val exact = multi.agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
      .cast("double")).head.getDouble(0)

    val planned = ApproxPlanner.strategyForMethod("file", fraction = 0.25)
    assert(planned === SamplingStrategy.FileLevel(4))

    val spec = QueryParser.parse(
      "SELECT SUM(l_extendedprice) FROM lineitem_multi",
      samplePercent = Some(25.0), withCi = true)
      .copy(sampling = planned)
    val r = SpecExecutor.run(spark, spec)
    val row = r.head()
    val est = row.getDouble(0)
    // design-honest CI should bracket exact on an exchangeable layout
    assert(row.getDouble(1) <= exact && exact <= row.getDouble(2),
      s"CI [${row.getDouble(1)}, ${row.getDouble(2)}] misses exact $exact (est $est)")
    assert(row.getLong(3) === 2L, "8 files / step 4 = 2 file-clusters read")
    // the scan itself must touch only the picked files — the I/O skip is
    // the whole point of the design
    val sf = graft.sources.FileSampling.fromFiles(
      spark, multi.inputFiles.toIndexedSeq, 4, 0)
    assert(sf.df.inputFiles.length === 2 && multi.inputFiles.length === 8)
    assert(sf.scaleFactor === 4.0)
    // GROUP BY must refuse loudly (group coverage per file uncontrolled)
    val g = QueryParser.parse(
      "SELECT SUM(l_extendedprice) FROM lineitem_multi GROUP BY l_returnflag")
      .copy(sampling = planned)
    intercept[IllegalArgumentException] { SpecExecutor.run(spark, g) }
  }

  test("--method priority routes to the fixed-size weighted design; estimate tracks the exact sum") {
    import org.apache.spark.sql.functions._
    import graft.exec.ApproxPlanner
    import graft.model.SamplingStrategy
    ensureTables()
    // k from fraction × known size; fallback budget without a count
    assert(ApproxPlanner.strategyForMethod("priority", fraction = 0.1,
      totalRecords = Some(6000L)) === SamplingStrategy.Priority(600))
    assert(ApproxPlanner.strategyForMethod("priority") ===
      SamplingStrategy.Priority(1000))

    val spec = QueryParser.parse("SELECT SUM(l_extendedprice) FROM lineitem")
      .copy(sampling = SamplingStrategy.Priority(500))
    val r1 = SpecExecutor.run(spark, spec).head()
    val exact = spark.table("lineitem")
      .agg(sum(col("l_extendedprice"))).head.getDouble(0)
    assert(math.abs(r1.getDouble(0) / exact - 1.0) < 0.15,
      s"est ${r1.getDouble(0)} vs exact $exact")
    assert(r1.getLong(1) === 500L)
    // deterministic: content-hash priorities, same answer every run
    val r2 = SpecExecutor.run(spark, spec).head()
    assert(r1.getDouble(0) === r2.getDouble(0))
    // COUNT degenerates to uniform-without-replacement, still unbiased-ish
    val cs = QueryParser.parse("SELECT COUNT(*) FROM lineitem")
      .copy(sampling = SamplingStrategy.Priority(500))
    val c = SpecExecutor.run(spark, cs).head().getDouble(0)
    val nTrue = spark.table("lineitem").count().toDouble
    assert(math.abs(c / nTrue - 1.0) < 0.15, s"count est $c vs $nTrue")
    // GROUP BY routes to the group-budgeted design (Skew.priorityPerKey):
    // every group gets its own size-k sample and threshold, and each
    // group's estimate tracks its exact sum
    val g = QueryParser.parse(
      "SELECT SUM(l_extendedprice) FROM lineitem GROUP BY l_returnflag")
      .copy(sampling = SamplingStrategy.Priority(200))
    val grouped = SpecExecutor.run(spark, g).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val exactByGroup = spark.table("lineitem").groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice")).as("s"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(grouped.keySet === exactByGroup.keySet)
    exactByGroup.foreach { case (grpKey, (s, n)) =>
      val (est, used) = grouped(grpKey)
      assert(used === math.min(200L, n))
      assert(math.abs(est / s - 1.0) < 0.2, s"group $grpKey: est $est vs $s")
    }
    // negative weights refuse loudly at execution (silent bias otherwise)
    import spark.implicits._
    Seq((1L, -5.0), (2L, 3.0), (3L, 7.0)).toDF("k", "v")
      .createOrReplaceTempView("neg_weights_t")
    val negSpec = QueryParser.parse("SELECT SUM(v) FROM neg_weights_t")
      .copy(sampling = SamplingStrategy.Priority(2))
    val ex = intercept[Exception] {
      SpecExecutor.run(spark, negSpec).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("non-negative")),
      s"expected the non-negative weight guard, got: ${messages(ex)}")
  }
}
