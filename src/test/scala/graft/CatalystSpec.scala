package graft

import org.apache.spark.sql.functions._


import graft.functions.CiAggregator

/** Tests for the custom Catalyst surface: the CI Aggregator (typed + SQL)
  * and the sampled-aggregate auto-scaling rule. Uses the shared SparkSpec
  * session, which installs GraftExtensions at build time (a second
  * getOrCreate builder could not add extensions to an existing session). */
class CatalystSpec extends SparkSpec {

  test("ci_avg SQL aggregate matches the closed-form moments") {
    CiAggregator.register(spark)
    Tables.registerAll(spark, sf0001)
    val r = spark.sql(
      "SELECT ci_avg(l_quantity) AS ci FROM lineitem").select("ci.*").head()
    val exact = spark.table("lineitem").agg(avg("l_quantity")).head.getDouble(0)
    assert(math.abs(r.getDouble(0) - exact) < 1e-9) // full-table mean == exact
    assert(r.getDouble(1) <= exact && exact <= r.getDouble(2))
    assert(r.getLong(3) === spark.table("lineitem").count())
  }

  test("typed ciSum column scales and brackets the exact sum") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf0001)
    val exact = li.agg(sum("l_extendedprice")).head.getDouble(0)
    val sampled = li.filter(
      pmod(col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L), lit(10L)) === 0)
    val ci = sampled.select(col("l_extendedprice")).as[Double]
      .select(CiAggregator.ciSum(10.0)).head()
    assert(math.abs(ci.value - exact) / exact < 0.10)
    assert(ci.ciLower <= exact && exact <= ci.ciUpper)
  }

  test("native vec_dot is bit-identical to the higher-order fold, float and mixed") {
    import graft.functions.VectorOps
    val emb = Tables.embeddings(spark, sf0001)
    // float × float (embedding vs itself and vs a shifted self-join twin)
    val selfDiff = emb.select(
      (VectorOps.dot(col("embedding"), col("embedding")) -
        VectorOps.dotFold(col("embedding"), col("embedding"))).as("d"))
      .agg(sum(abs(col("d")))).head().getDouble(0)
    assert(selfDiff === 0.0, "float x float must be bit-identical")
    // float × double-literal plane (the LSH hyperplane case)
    val plane = VectorOps.randomPlanes(1, 64, seed = 5L).head
    val planeCol = array(plane.toIndexedSeq.map(lit): _*)
    val mixDiff = emb.select(
      (VectorOps.dot(col("embedding"), planeCol) -
        VectorOps.dotFold(col("embedding"), planeCol)).as("d"))
      .agg(sum(abs(col("d")))).head().getDouble(0)
    assert(mixDiff === 0.0, "float x double must be bit-identical")
    // and the plan stays inside whole-stage codegen (no CompileException,
    // vec_dot visible in the generated plan tree)
    val planStr = emb.select(VectorOps.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(planStr.contains("vec_dot") || planStr.toLowerCase.contains("floatvecdot"))
  }

  test("native int8 code/cosine are locked to the declarative quantize twins") {
    import graft.functions.VectorOps
    val emb = Tables.embeddings(spark, sf0001).limit(200)
    // Int8Code bytes == int8Quantize ints elementwise at scale = maxAbs/127
    val scale = VectorOps.maxAbs(col("embedding")) / lit(127.0)
    val cmp = emb.select(
      VectorOps.int8Code(col("embedding")).as("code"),
      VectorOps.int8Quantize(col("embedding"), scale).as("q"))
      .collect()
    cmp.foreach { r =>
      val bytes = r.getAs[Array[Byte]](0)
      val ints = r.getSeq[Int](1)
      assert(bytes.length === ints.length)
      bytes.zip(ints).foreach { case (b, q) => assert(b.toInt === q) }
    }
    // Int8Cosine == the integer dot/norm ratio computed declaratively over
    // the quantized arrays (scales cancel)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    def qcol(v: org.apache.spark.sql.Column) =
      VectorOps.int8Quantize(v, VectorOps.maxAbs(v) / lit(127.0))
    def idot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("long") * q.cast("long")),
        lit(0L), (acc, z) => acc + z)
    val joined = a.join(b, col("id_a") === col("id_b") - 1)
      .select(
        VectorOps.int8Cosine(VectorOps.int8Code(col("va")),
          VectorOps.int8Code(col("vb"))).as("native"),
        (idot(qcol(col("va")), qcol(col("vb"))).cast("double") /
          (sqrt(idot(qcol(col("va")), qcol(col("va"))).cast("double")) *
            sqrt(idot(qcol(col("vb")), qcol(col("vb"))).cast("double"))))
          .as("decl"))
      .agg(sum(abs(col("native") - col("decl")))).head().getDouble(0)
    assert(joined === 0.0, "int8 cosine must be bit-identical to the declarative twin")
    // quantized cosine tracks the float cosine closely on unit embeddings
    val drift = a.join(b, col("id_a") === col("id_b") - 1)
      .select(abs(VectorOps.int8Cosine(VectorOps.int8Code(col("va")),
        VectorOps.int8Code(col("vb"))) -
        VectorOps.cosine(col("va"), col("vb"))).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(drift < 0.02, s"int8 cosine drift $drift too large")
  }

  test("bucketed tables co-locate the join: no exchanges in the plan") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sf0001)
      val orders = Tables.orders(spark, sf0001)
      // clear leftover warehouse dirs from previous JVMs (in-memory catalog
      // forgets the table but the location survives -> LOCATION_ALREADY_EXISTS)
      Seq("li_bkt_test", "ord_bkt_test").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val root = java.nio.file.Paths.get(TmpDirs.path("warehouse"), t)
        if (java.nio.file.Files.exists(root)) {
          java.nio.file.Files.walk(root)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
        }
      }
      li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bkt_test")
      orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bkt_test")
      val bucketed = spark.table("li_bkt_test")
        .join(spark.table("ord_bkt_test"), col("l_orderkey") === col("o_orderkey"))
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$bucketedPlan")
      val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"),
        "sanity: the unbucketed join does shuffle")
      // same answer either way
      assert(bucketed.count() === plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("plan-shape contracts: the PLANS.md invariants hold in executed plans") {
    // q10: the sampling predicate is a scan-stage Filter, never a shuffle;
    // exactly one exchange (the single-partition partial-agg merge)
    val q10 = Inventory.byName("q10_approx_sum_sys10").run(spark, sf0001)
    val p10 = q10.queryExecution.executedPlan.toString
    assert(p10.contains("Filter") && p10.contains("HashAggregate"))
    assert(!p10.contains("SortMergeJoin"))
    // q84: Spark's rank-limit pushdown must stay active — WindowGroupLimit
    // prunes each map partition before BOTH two-phase exchanges
    val q84 = Inventory.byName("q84_source_topn").run(spark, sf0001)
    assert(q84.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "rank-limit pushdown disappeared from the top-N plan")
    // q89: LIMIT compiles to TakeOrderedAndProject (bounded heaps), never
    // a global Sort + CollectLimit
    val q89 = Inventory.byName("q89_unshipped_orders").run(spark, sf0001)
    assert(q89.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "top-k no longer plans as TakeOrderedAndProject")
    // q67: decontamination's gram explode runs the native HASHED kernel
    // (round-14: the probe set broadcasts 8-byte gram hashes, not gram
    // strings), never the interpreted fold
    val q67 = Inventory.byName("q67_decontaminate").run(spark, sf0001)
    assert(q67.queryExecution.executedPlan.toString.contains("word_ngram_hashes"),
      "native word_ngram_hashes kernel missing from the decontamination plan")
    // q96: explicit-schema from_json keeps the scan pruned to the two
    // referenced columns — no inference widened the read
    val q96 = Inventory.byName("q96_json_extract").run(spark, sf0001)
    val s96 = q96.queryExecution.executedPlan.toString
    assert(s96.contains("event_type") && s96.contains("props") &&
      !s96.contains("ReadSchema: struct<event_id"),
      "q96 scan no longer pruned to event_type+props")
    // q101: CDC is a single full-outer SortMergeJoin on the key — a
    // broadcast or nested-loop here would break at snapshot scale
    val q101 = Inventory.byName("q101_snapshot_diff").run(spark, sf0001)
    val s101 = q101.queryExecution.executedPlan.toString
    assert(s101.contains("SortMergeJoin") && s101.contains("FullOuter"),
      "snapshot diff stopped planning as full-outer SortMergeJoin")
    // q97 is pinned in OpsSpec (no Window); q112's slice ranks must ALSO
    // never collapse to a global single-partition window
    val q112 = Inventory.byName("q112_dense_ids").run(spark, sf0001)
    assert(!q112.queryExecution.executedPlan.toString
        .matches("(?s).*Window.*SinglePartition.*Window.*"),
      "dense-id ranking degraded to a single-partition window")
    // q175: the two windows (row_number + count) must SHARE one source
    // exchange and one sort — a second Sort between the Window operators
    // means the unordered count frame stopped riding the ranked sort
    val q175 = Inventory.byName("q175_stratified_split_exact").run(spark, sf0001)
    val s175 = q175.queryExecution.executedPlan.toString
    assert(!s175.matches("(?s).*Window.*Sort.*Window.*"),
      "q175's count window re-sorts between the two window operators")
    assert(s175.split("Exchange hashpartitioning\\(source").length == 2,
      "q175 should hash-exchange on source exactly once")
    // q177: eval grams broadcast, per-train argmax pre-pruned map-side
    val q177 = Inventory.byName("q177_contamination_attribution").run(spark, sf0001)
    val s177 = q177.queryExecution.executedPlan.toString
    assert(s177.contains("BroadcastHashJoin"),
      "q177's eval-gram probe stopped broadcasting")
    assert(s177.contains("WindowGroupLimit"),
      "q177's top-1 attribution lost its per-partition group limit")
  }

  test("fused hyperplane_sig matches the declarative per-plane signature") {
    import graft.functions.VectorOps
    val emb = Tables.embeddings(spark, sf0001)
    val planes = VectorOps.randomPlanes(8, 64, seed = 99L)
    val diff = emb.select(
      (VectorOps.hyperplaneSignature(col("embedding"), planes) -
        VectorOps.hyperplaneSignatureFold(col("embedding"), planes)).as("d"))
      .agg(sum(abs(col("d")))).head().getLong(0)
    assert(diff === 0L, "fused signature must be bit-identical")
  }

  test("auto-scaling rule: sum over TABLESAMPLE estimates the full sum") {
    Tables.registerAll(spark, sf0001)
    val exact = spark.sql("SELECT SUM(l_extendedprice) FROM lineitem").head.getDouble(0)
    val est = spark.sql(
      "SELECT SUM(l_extendedprice) AS s FROM lineitem TABLESAMPLE (20 PERCENT) REPEATABLE (42)")
      .head.getDouble(0)
    assert(math.abs(est - exact) / exact < 0.25, s"est=$est exact=$exact")
  }

  test("auto-scaling rule leaves AVG alone") {
    Tables.registerAll(spark, sf0001)
    val exact = spark.sql("SELECT AVG(l_quantity) FROM lineitem").head.getDouble(0)
    val est = spark.sql(
      "SELECT AVG(l_quantity) AS a FROM lineitem TABLESAMPLE (20 PERCENT) REPEATABLE (42)")
      .head.getDouble(0)
    assert(math.abs(est - exact) / exact < 0.15)
  }

  test("auto-scaling can be disabled by conf") {
    Tables.registerAll(spark, sf0001)
    spark.conf.set("spark.graft.autoscale.enabled", "false")
    try {
      val exact = spark.sql("SELECT SUM(l_extendedprice) FROM lineitem").head.getDouble(0)
      val raw = spark.sql(
        "SELECT SUM(l_extendedprice) AS s FROM lineitem TABLESAMPLE (20 PERCENT) REPEATABLE (42)")
        .head.getDouble(0)
      assert(raw < exact * 0.5, "disabled rule must NOT scale the sampled sum")
    } finally spark.conf.set("spark.graft.autoscale.enabled", "true")
  }

  test("approx mode rewrites COUNT(DISTINCT) to HLL; off by default") {
    Tables.registerAll(spark, sf0001)
    val q = "SELECT COUNT(DISTINCT o_custkey) AS d FROM orders"
    // default: exact plan (Expand-based distinct), exact answer
    val exactDf = spark.sql(q)
    val exact = exactDf.head.getLong(0)
    assert(!exactDf.queryExecution.executedPlan.toString.contains("hllsketch")
      && !exactDf.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"),
      "rewrite must be off by default")
    spark.conf.set("spark.graft.approx.countDistinct.enabled", "true")
    try {
      val apxDf = spark.sql(q)
      assert(apxDf.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"), "plan not rewritten")
      val est = apxDf.head.getLong(0)
      assert(math.abs(est - exact).toDouble / exact < 0.10,
        s"est=$est exact=$exact")
    } finally
      spark.conf.set("spark.graft.approx.countDistinct.enabled", "false")
  }

  test("approx mode handles multi-column COUNT(DISTINCT) incl. null rows") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (1L, Some("a")), (2L, Some("b")),
      (2L, None), (3L, None)).toDF("k", "s")
    df.createOrReplaceTempView("cd_multi")
    val q = "SELECT COUNT(DISTINCT k, s) AS d FROM cd_multi"
    val exact = spark.sql(q).head.getLong(0) // (1,a),(2,b) — null rows skip
    assert(exact == 2L)
    spark.conf.set("spark.graft.approx.countDistinct.enabled", "true")
    try {
      val apxDf = spark.sql(q)
      assert(apxDf.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      // tiny cardinality: HLL is exact here; null-gating must hold
      assert(apxDf.head.getLong(0) == exact)
    } finally
      spark.conf.set("spark.graft.approx.countDistinct.enabled", "false")
  }

  test("approx mode rewrites PERCENTILE to the bounded quantile summary") {
    Tables.registerAll(spark, sf0001)
    val q = "SELECT percentile(l_extendedprice, 0.5) AS p50 FROM lineitem"
    val exact = spark.sql(q).head.getDouble(0)
    spark.conf.set("spark.graft.approx.percentile.enabled", "true")
    try {
      val apxDf = spark.sql(q)
      assert(apxDf.queryExecution.optimizedPlan.toString
        .contains("percentile_approx"), "plan not rewritten")
      val est = apxDf.head.getDouble(0)
      assert(math.abs(est - exact) / exact < 0.05, s"est=$est exact=$exact")
      // array-of-percentages form passes through the same rewrite
      val qa = "SELECT percentile(l_extendedprice, array(0.25, 0.75)) AS ps FROM lineitem"
      val apxArr = spark.sql(qa)
      assert(apxArr.queryExecution.optimizedPlan.toString
        .contains("percentile_approx"))
      val ps = apxArr.head.getSeq[Double](0)
      assert(ps.length == 2 && ps(0) < ps(1))
    } finally
      spark.conf.set("spark.graft.approx.percentile.enabled", "false")
  }

  test("percentile rewrite preserves the analyzed DOUBLE type on int/long columns") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("lk", "ik")
    df.createOrReplaceTempView("pct_typed")
    // percentile over long/int yields DOUBLE exactly; parents (here the
    // arithmetic and schema) must see DOUBLE after the rewrite too.
    val q = "SELECT percentile(lk, 0.5) AS p_l, percentile(ik, 0.5) AS p_i, " +
      "percentile(lk, array(0.1, 0.9)) AS p_arr, percentile(lk, 0.5) + 0.25 AS p_sum " +
      "FROM pct_typed"
    val exactSchema = spark.sql(q).schema
    spark.conf.set("spark.graft.approx.percentile.enabled", "true")
    try {
      val apx = spark.sql(q)
      assert(apx.queryExecution.optimizedPlan.toString.contains("percentile_approx"),
        "plan not rewritten")
      assert(apx.schema == exactSchema,
        s"schema changed: ${apx.schema} vs $exactSchema")
      val row = apx.head
      assert(math.abs(row.getDouble(0) - 50.0) <= 1.0)
      assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= 6.0)
      val arr = row.getSeq[Double](2)
      assert(arr.length == 2 && arr(0) < arr(1))
      assert(math.abs(row.getDouble(3) - (row.getDouble(0) + 0.25)) < 1e-9)
    } finally
      spark.conf.set("spark.graft.approx.percentile.enabled", "false")
  }
}
