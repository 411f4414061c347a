package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.exec.HistQuantile
import graft.functions.CountMin
import graft.operators.{Cdc, Packing, Profiling, TextAnalysis, Validation}
import graft.operators.Validation.Check

/** Pipeline-maintenance operators: CountMin (mergeable, overestimate-only),
  * HistQuantile (merge ≡ direct, bin-width error bound), Cdc classification,
  * Validation one-pass checks, argmaxPerKey ≡ window latestPerKey.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def li: DataFrame = Tables.lineitem(spark, sf0001)

  // --- CountMin ----------------------------------------------------------

  test("CountMin estimates are >= true counts, exact for absent keys") {
    val sketch = CountMin.build(li, col("l_suppkey"), width = 256)
    val truth = li.groupBy(col("l_suppkey").as("probe_key"))
      .agg(count(lit(1)).as("true_cnt"))
    val probes = li.select(col("l_suppkey"))
      .unionAll(spark.range(1).select(lit(987654321L).as("l_suppkey")))
    val est = CountMin.estimate(sketch, probes, col("l_suppkey"), width = 256)
    val joined = est.join(truth, Seq("probe_key"), "left")
      .select(col("probe_key"), col("est"), coalesce(col("true_cnt"), lit(0L)).as("true_cnt"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"underestimate for key ${r.getLong(0)}")
    }
    val absent = joined.find(_.getLong(0) == 987654321L).get
    assert(absent.getLong(2) == 0L)
  }

  test("CountMin sketches over disjoint halves merge to the whole-data sketch") {
    val first = li.filter(pmod(col("l_orderkey"), lit(2L)) === 0)
    val second = li.filter(pmod(col("l_orderkey"), lit(2L)) === 1)
    val merged = CountMin.merge(Seq(
        CountMin.build(first, col("l_suppkey"), width = 64),
        CountMin.build(second, col("l_suppkey"), width = 64)))
      .orderBy(col("hash_idx"), col("bucket")).collect()
    val direct = CountMin.build(li, col("l_suppkey"), width = 64)
      .orderBy(col("hash_idx"), col("bucket")).collect()
    assert(merged.toSeq == direct.toSeq)
  }

  test("joinSizeEstimate upper-bounds the true join size; exact when collision-free") {
    val a = li.select(col("l_orderkey").as("k"))
    val b = Tables.orders(spark, sf0001).select(col("o_orderkey").as("k"))
    val truth = a.join(b, Seq("k")).count()
    val est = CountMin.joinSizeEstimate(
        CountMin.build(a, col("k"), width = 128),
        CountMin.build(b, col("k"), width = 128))
      .collect().head.getLong(0)
    assert(est >= truth, s"AMS estimate $est under true $truth")
    // a huge width separates every key at sf0.001 -> estimate is exact
    val estWide = CountMin.joinSizeEstimate(
        CountMin.build(a, col("k"), width = 1 << 20),
        CountMin.build(b, col("k"), width = 1 << 20))
      .collect().head.getLong(0)
    assert(estWide == truth, s"collision-free estimate $estWide != $truth")
  }

  // --- HistQuantile ------------------------------------------------------

  test("histogram halves merge to the direct histogram; quantiles agree") {
    val x = col("l_extendedprice")
    val first = li.filter(pmod(col("l_orderkey"), lit(2L)) === 0)
    val second = li.filter(pmod(col("l_orderkey"), lit(2L)) === 1)
    val merged = HistQuantile.merge(Seq(
      HistQuantile.histogram(first, x, 0.0, 2000.0, 64),
      HistQuantile.histogram(second, x, 0.0, 2000.0, 64)))
    val direct = HistQuantile.histogram(li, x, 0.0, 2000.0, 64)
    assert(merged.orderBy("bin").collect().toSeq ==
      direct.orderBy("bin").collect().toSeq)
    val qm = HistQuantile.quantiles(merged, 0.0, 2000.0, Seq(0.5)).collect()
    val qd = HistQuantile.quantiles(direct, 0.0, 2000.0, Seq(0.5)).collect()
    assert(qm.toSeq == qd.toSeq)
  }

  test("histogram quantile is within one bin width of the exact percentile") {
    val hist = HistQuantile.histogram(li, col("l_extendedprice"), 0.0, 2000.0, 64)
    val est = HistQuantile.quantiles(hist, 0.0, 2000.0, Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = li.agg(
        percentile(col("l_extendedprice"), lit(0.25)),
        percentile(col("l_extendedprice"), lit(0.5)),
        percentile(col("l_extendedprice"), lit(0.75)))
      .collect().head
    Seq(0.25 -> exact.getDouble(0), 0.5 -> exact.getDouble(1),
        0.75 -> exact.getDouble(2)).foreach { case (p, ex) =>
      assert(math.abs(est(p) - ex) <= 2000.0, s"p=$p est=${est(p)} exact=$ex")
    }
  }

  test("weighted histogram: weight 1 reduces to counts; weighted median shifts toward heavy rows") {
    // weight ≡ 1 → wsum equals cnt bin-for-bin, quantiles identical
    val h1 = HistQuantile.weightedHistogram(li, col("l_extendedprice"),
      lit(1.0), 0.0, 2000.0, 64)
    val hc = HistQuantile.histogram(li, col("l_extendedprice"), 0.0, 2000.0, 64)
    val a = h1.orderBy("bin").collect().map(r => (r.getLong(0), r.getDecimal(1).longValue()))
    val b = hc.orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
    val q1 = HistQuantile.weightedQuantiles(h1, 0.0, 2000.0, Seq(0.5)).collect()
    val qc = HistQuantile.quantiles(hc, 0.0, 2000.0, Seq(0.5)).collect()
    assert(q1.map(_.getDouble(1)).toSeq == qc.map(_.getDouble(1)).toSeq)
    // planting all weight on the top bin drags the weighted median there
    val df = Seq((1.0, 1.0), (2.0, 1.0), (99.0, 98.0)).toDF("x", "w")
    val wh = HistQuantile.weightedHistogram(df, col("x"), col("w"), 0.0, 10.0, 10)
    val med = HistQuantile.weightedQuantiles(wh, 0.0, 10.0, Seq(0.5))
      .collect()(0).getDouble(1)
    assert(med >= 90.0, s"weighted median $med should sit in the heavy bin")
    // weighted halves merge to the direct weighted histogram
    val wFirst = HistQuantile.weightedHistogram(
      li.filter(pmod(col("l_orderkey"), lit(2L)) === 0),
      col("l_extendedprice"), col("l_quantity"), 0.0, 2000.0, 64)
    val wSecond = HistQuantile.weightedHistogram(
      li.filter(pmod(col("l_orderkey"), lit(2L)) === 1),
      col("l_extendedprice"), col("l_quantity"), 0.0, 2000.0, 64)
    val wMerged = HistQuantile.mergeWeighted(Seq(wFirst, wSecond))
    val wDirect = HistQuantile.weightedHistogram(li, col("l_extendedprice"),
      col("l_quantity"), 0.0, 2000.0, 64)
    assert(wMerged.orderBy("bin").collect().map(r => (r.getLong(0), r.getDecimal(1)))
      .toSeq == wDirect.orderBy("bin").collect().map(r => (r.getLong(0), r.getDecimal(1))).toSeq)
  }

  test("histogram clamps out-of-domain values into edge bins") {
    val df = Seq(-5.0, 0.5, 1.5, 99.0).toDF("x")
    val bins = HistQuantile.histogram(df, col("x"), 0.0, 1.0, 3)
      .orderBy("bin").as[(Long, Long)].collect().toSeq
    assert(bins == Seq((0L, 2L), (1L, 1L), (2L, 1L)))
  }

  // --- Cdc ---------------------------------------------------------------

  test("snapshotDiff classifies added/removed/changed/unchanged; null-safe compare") {
    val oldDf = Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"),
      (3L, None: Option[Double], "c"), (4L, Some(40.0), "d"))
      .toDF("k", "v", "s")
    val newDf = Seq((2L, Some(21.0), "b"), (3L, None: Option[Double], "c"),
      (4L, Some(40.0), "d"), (5L, Some(50.0), "e"))
      .toDF("k", "v", "s")
    val out = Cdc.snapshotDiff(oldDf, newDf, Seq("k"), Seq("v", "s"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 2L -> "changed",
      3L -> "unchanged", 4L -> "unchanged", 5L -> "added"))
  }

  test("deltaRows emits +new for added/changed, -old for removed/changed, skips unchanged") {
    val oldDf = Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b")).toDF("k", "v", "g")
    val newDf = Seq((2L, 25L, "a"), (3L, 30L, "b"), (4L, 40L, "b")).toDF("k", "v", "g")
    val diff = Cdc.snapshotDiff(oldDf, newDf, Seq("k"), Seq("v", "g"))
    val delta = Cdc.deltaRows(diff, Seq("k"), Seq("v", "g"))
      .as[(Long, Long, String, Long)].collect().toSet
    assert(delta == Set(
      (1L, 10L, "a", -1L),            // removed: -old
      (2L, 25L, "a", 1L), (2L, 20L, "a", -1L), // changed: +new, -old
      (4L, 40L, "b", 1L)))            // added: +new; k=3 unchanged -> absent
  }

  test("old sketch + signed delta reproduces the rebuilt sketch bit-exactly") {
    val oldDf = Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b")).toDF("k", "v", "g")
    val newDf = Seq((2L, 25L, "a"), (3L, 30L, "b"), (4L, 40L, "b")).toDF("k", "v", "g")
    val diff = Cdc.snapshotDiff(oldDf, newDf, Seq("k"), Seq("v", "g"))
    val delta = graft.exec.Estimators.signedMomentSketch(
      Cdc.deltaRows(diff, Nil, Seq("v", "g")), col("v"), col("sign"), Seq("g"))
    val oldSketch = graft.exec.Estimators.momentSketch(oldDf, col("v"), Seq("g"))
    val maintained = graft.exec.Estimators.mergeMoments(
      oldSketch.unionByName(delta), Seq("g")).orderBy("g").collect().toSeq
    val rebuilt = graft.exec.Estimators.momentSketch(newDf, col("v"), Seq("g"))
      .orderBy("g").collect().toSeq
    assert(maintained == rebuilt)
  }

  // --- Validation --------------------------------------------------------

  test("validate compiles all checks into one pass and counts violations") {
    val df = Seq(
      (Some(1L), Some(5.0)), (Some(1L), Some(-2.0)),
      (None: Option[Long], Some(3.0)), (Some(2L), None: Option[Double]))
      .toDF("id", "x")
    val out = Validation.validate(df, Seq(
        Check.NotNull("x"),
        Check.InRange("x", 0.0, 10.0),
        Check.Unique(Seq("id")),
        Check.Satisfies("x_positive", col("x") > 0)))
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("not_null(x)", 1L, 4L),
      ("in_range(x)", 1L, 4L),     // -2 out of range; null x passes range
      ("unique(id)", 1L, 4L),      // id=1 twice -> 1 excess row
      ("satisfies(x_positive)", 2L, 4L))) // -2 fails, null-x is a violation
  }

  test("referentialIntegrity counts orphans, passes null FKs") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val out = Validation.referentialIntegrity(
        child, Seq("fk"), parent, Seq("pk"), "fk")
      .as[(String, Long, Long)].collect().head
    assert(out == (("foreign_key(fk)", 1L, 4L)))
  }

  test("editDistancePairs finds planted typos, excludes far strings, dist-0 = exact dups") {
    import graft.operators.Dedup
    val names = Seq(
      (1L, "small ring"), (2L, "small rings"),   // dist 1
      (3L, "small ring"),                        // dist 0 vs 1
      (4L, "blue bolt"), (5L, "blue belt"),      // dist 1
      (6L, "completely different")).toDF("id", "name")
    val pairs = Dedup.editDistancePairs(names, "id", "name", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 1L)))
    assert(pairs.contains((1L, 3L, 0L)))
    assert(pairs.contains((4L, 5L, 1L)))
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("denseIds is the contiguous 0..n-1 enumeration in key order, gaps and all") {
    import graft.operators.Mixing
    // sparse, clustered, shuffled keys — ids must still be 0..n-1 in order
    val keys = (Seq(5L, 1000000L, 7L, 999999L, 500L) ++
      (100L until 150L)).reverse
    val df = keys.toDF("k")
    val out = Mixing.denseIds(df, col("k"), partitions = 4)
      .orderBy("rid").as[(Long, Long)].collect()
    val sortedKeys = keys.sorted
    out.zipWithIndex.foreach { case ((k, rid), i) =>
      assert(rid == i.toLong && k == sortedKeys(i), s"row $i: ($k, $rid)")
    }
    // empty input -> empty output, schema intact
    val none = Mixing.denseIds(spark.range(0).toDF("k"), col("k"), 4)
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "rid"))
  }

  test("groupTrend recovers an exact planted line; degenerate x gives null slope") {
    import graft.operators.Profiling
    // y = 3x + 10 exactly, plus a one-x group (degenerate)
    val rows = (0L until 20L).map(x => ("lin", x, 3 * x + 10)) ++
      Seq(("flat", 5L, 1L), ("flat", 5L, 9L))
    val df = rows.toDF("g", "x", "y")
    val out = Profiling.groupTrend(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out("lin") == ((Some(3.0), Some(10.0))))
    assert(out("flat") == ((None, None)))
  }

  test("histDrift is 0 for identical snapshots, 1 for disjoint, monotone in between") {
    import graft.operators.Profiling
    val a = (0 until 1000).map(_.toDouble).toDF("v")
    val b = (0 until 1000).map(i => 5000.0 + i).toDF("v")
    def tv(x: DataFrame, y: DataFrame): Double =
      Profiling.histDrift(x, y, col("v"), lo = 0.0, width = 100.0, nBins = 64)
        .collect().head.getDouble(2)
    assert(tv(a, a) == 0.0)
    assert(tv(a, b) == 1.0)
    val mixed = a.unionAll(b) // half mass where a is, half where b is
    val mid = tv(a, mixed)
    assert(mid > 0.0 && mid < 1.0)
  }

  // --- argmaxPerKey ------------------------------------------------------

  test("argmaxPerKey matches the window-based latestPerKey winner") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val viaAgg = Packing.argmaxPerKey(ev, Seq("user_id"),
        Seq("value", "ts_us", "event_id"), Nil)
      .orderBy("user_id").collect().toSeq
    val viaWindow = Packing.latestPerKey(ev, Seq("user_id"),
        Seq("value", "ts_us", "event_id"))
      .select("user_id", "value", "ts_us", "event_id")
      .orderBy("user_id").collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("argmaxViaJoin matches the window winner and plans a broadcast join, no full shuffle") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val viaJoin = Packing.argmaxViaJoin(ev, Seq("user_id"), "value",
        Seq("ts_us", "event_id"))
      .select("user_id", "value", "ts_us", "event_id")
      .orderBy("user_id").collect().toSeq
    val viaWindow = Packing.latestPerKey(ev, Seq("user_id"),
        Seq("value", "ts_us", "event_id"))
      .select("user_id", "value", "ts_us", "event_id")
      .orderBy("user_id").collect().toSeq
    assert(viaJoin == viaWindow)
    // plan shape: no forced hint — AQE converts the small maxima side to a
    // broadcast join at runtime (check the FINAL adaptive plan, post-run);
    // a huge key space would degrade to a shuffle join instead of OOMing.
    val q = Packing.argmaxViaJoin(ev, Seq("user_id"), "value",
      Seq("ts_us", "event_id"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"final plan:\n$plan")
    // and the opt-in forced broadcast produces the same winners
    val hinted = Packing.argmaxViaJoin(ev, Seq("user_id"), "value",
        Seq("ts_us", "event_id"), broadcastMaxes = true)
      .select("user_id", "value", "ts_us", "event_id")
      .orderBy("user_id").collect().toSeq
    assert(hinted == viaWindow)
  }

  test("argmaxViaJoin without tie-break keeps all tied rows") {
    val df = Seq((1L, 10.0, "a"), (1L, 10.0, "b"), (1L, 5.0, "c"),
      (2L, 1.0, "d")).toDF("k", "v", "tag")
    val out = Packing.argmaxViaJoin(df, Seq("k"), "v", Nil)
      .orderBy("k", "tag").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq == Seq((1L, "a"), (1L, "b"), (2L, "d")))
  }

  test("argmaxPerKey plans as aggregation with partial combine, not a window sort") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("value"), col("event_id"))
    val plan = Packing.argmaxPerKey(ev, Seq("user_id"),
      Seq("value", "event_id"), Nil).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  // --- signedJoinAgg (incremental join maintenance) ----------------------

  test("signedJoinAgg: maintained join aggregate equals a from-scratch rebuild") {
    // facts (k, v), dims (k, g); delta adds fact k=3 and deletes k=1,
    // adds dim k=3/g=y and deletes dim k=2
    val a0 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val a1 = Seq((2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val dA = Seq((3L, 30.0, 1), (1L, 10.0, -1)).toDF("k", "v", "sign")
    val b0 = Seq((1L, "x"), (2L, "x")).toDF("k", "g")
    val b1 = Seq((1L, "x"), (3L, "y")).toDF("k", "g") // k=2 deleted, k=3 added
    val dB = Seq((3L, "y", 1), (2L, "x", -1)).toDF("k", "g", "sign")
    val j0 = a0.join(b0, "k").groupBy(col("g"))
      .agg(count(lit(1)).as("dn"),
        sum(col("v").cast("decimal(18,2)")).cast("decimal(18,2)").as("dsum"))
    val d1 = Cdc.signedJoinAgg(dA, b0.withColumn("sign", lit(1)), "k",
      Seq("g"), col("v"))
    val d2 = Cdc.signedJoinAgg(a1.withColumn("sign", lit(1)), dB, "k",
      Seq("g"), col("v"))
    val maintained = j0.unionByName(d1).unionByName(d2)
      .groupBy(col("g"))
      .agg(sum(col("dn")).as("n"), sum(col("dsum")).cast("double").as("s"))
      .filter(col("n") > 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val direct = a1.join(b1, "k").groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(maintained == direct)
    // group x vanished entirely (its only surviving pair was deleted on
    // both sides) — the n>0 filter must have dropped it, like the rebuild
    assert(!maintained.exists(_._1 == "x") || direct.exists(_._1 == "x"))
  }

  // --- scd2 --------------------------------------------------------------

  test("scd2 collapses runs, emits contiguous intervals, flags the current row") {
    val log = Seq(
      (1L, "a", 100L, 1L), (1L, "a", 200L, 2L), (1L, "b", 300L, 3L),
      (1L, "a", 400L, 4L), // back to a state seen before — a NEW version
      (2L, "x", 50L, 5L)
    ).toDF("k", "attr0", "ts", "id")
    val out = Cdc.scd2(log, Seq("k"), col("attr0"), col("ts"), col("id"))
      .orderBy("k", "version")
      .select("k", "version", "attr", "valid_from_us", "valid_to_us", "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, "a", 100L, 300L, false),
      (1L, 2L, "b", 300L, 400L, false),
      (1L, 3L, "a", 400L, -1L, true),
      (2L, 1L, "x", 50L, -1L, true)))
  }

  test("scd2 treats null as a state (null-safe change detection)") {
    val log = Seq((1L, Some("a"), 10L, 1L), (1L, None, 20L, 2L),
      (1L, None, 30L, 3L), (1L, Some("a"), 40L, 4L))
      .toDF("k", "attr0", "ts", "id")
    val out = Cdc.scd2(log, Seq("k"), col("attr0"), col("ts"), col("id"))
      .orderBy("version")
      .collect().map(r => (r.getLong(r.fieldIndex("version")),
        Option(r.getString(r.fieldIndex("attr")))))
    assert(out.toSeq === Seq((1L, Some("a")), (2L, None), (3L, Some("a"))))
  }

  // --- winsorizedStats ----------------------------------------------------

  test("winsorizedStats clips tails and is robust to one huge outlier") {
    // 1..99 plus one 1e9 outlier; p05/p95 over 100 values
    val vals = ((1 to 99).map(_.toDouble) :+ 1e9).map(v => ("g", v))
    val df = vals.toDF("g", "v")
    val out = Profiling.winsorizedStats(df, Seq("g"), col("v"),
      col("v").cast("decimal(18,2)"), 0.05, 0.95).collect().head
    assert(out.getAs[Long]("n") === 100L)
    assert(out.getAs[Long]("n_lo") + out.getAs[Long]("n_hi")
      + out.getAs[Long]("n_in") === 100L)
    // the outlier is clipped to ~p95: winsorized mean stays near 50, the
    // raw mean would be ~1e7
    assert(out.getAs[Double]("winsorized_mean") < 100.0)
    assert(out.getAs[Double]("trimmed_mean") > 40.0 &&
      out.getAs[Double]("trimmed_mean") < 60.0)
  }

  // --- bm25Search ---------------------------------------------------------

  test("bm25 ranks higher-tf docs first and normalizes by document length") {
    val docs = Seq(
      (1L, "join join join pad pad pad pad pad"),
      (2L, "join pad pad pad pad pad pad pad"),
      (3L, "join " * 4 + "pad " * 28), // same tf density as 1 but 4x longer
      (4L, "pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(docs, "doc_id", "text",
      Seq("join"), topK = 10).collect()
    val ids = out.map(_.getLong(0)).toSeq
    // doc 4 has no query term — absent entirely
    assert(!ids.contains(4L) && ids.length === 3)
    // tf=3 beats tf=1 at equal length; length normalization demotes doc 3
    // below doc 1 (same tf/dl ratio, longer doc ⇒ saturation term smaller)
    assert(ids.head === 1L)
    val score = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(score(1L) > score(3L) && score(1L) > score(2L))
  }

  test("bm25 multi-term score is the fixed-order sum of per-term scores") {
    val docs = Seq(
      (1L, "alpha beta gap gap"), (2L, "alpha gap gap gap"),
      (3L, "beta gap gap gap")
    ).toDF("doc_id", "text")
    val both = TextAnalysis.bm25Search(docs, "doc_id", "text",
      Seq("alpha", "beta"), topK = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a = TextAnalysis.bm25Search(docs, "doc_id", "text",
      Seq("alpha"), topK = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = TextAnalysis.bm25Search(docs, "doc_id", "text",
      Seq("beta"), topK = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 1 carries both terms: its combined score is exactly s_a + s_b
    assert(both(1L) === a(1L) + b(1L))
    // single-term docs keep their single-term score in the combined query
    assert(both(2L) === a(2L) && both(3L) === b(3L))
  }

  // --- collocations -------------------------------------------------------

  test("collocations rank a planted phrase above independent co-occurrence") {
    // "new york" always adjacent; "red" and "blue" frequent but never
    // adjacent to each other; filler varies the contexts
    val docs = (1 to 30).map { i =>
      (i.toLong, s"new york f$i red g$i blue h$i new york red k$i blue")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 5L,
      topK = 10).collect()
    val top = out.head
    assert((top.getString(0), top.getString(1)) === ("new", "york"))
    assert(top.getAs[Double]("lift") > 1.0)
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(!pairs.contains(("red", "blue")) && !pairs.contains(("blue", "red")))
  }

  test("collocations tolerate sub-bigram docs and respect minCount") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "rare pair"),
      (4L, "common duo common duo common duo common duo common duo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 5L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_xy")))
    // "rare pair" occurs once (< minCount) — only the duo→common back-edge
    // and common→duo survive
    assert(out.forall(_._3 >= 5L))
    assert(out.map(t => (t._1, t._2)).contains(("common", "duo")))
    assert(!out.map(t => (t._1, t._2)).contains(("rare", "pair")))
  }
}
