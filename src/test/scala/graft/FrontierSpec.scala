package graft

import org.apache.spark.sql.functions._

import graft.exec.Sampling
import graft.operators.{CorpusOverlap, Dedup, JoinSampling, Mixing, QualityModel, Rolling}

/** Round-4 frontier operators: universe join sampling, priority sampling,
  * the hashed linear quality model, corpus overlap. */
class FrontierSpec extends SparkSpec {

  private def li = Tables.lineitem(spark, sf0001)
  private def ord = Tables.orders(spark, sf0001)
    .select(col("o_orderkey"), col("o_orderpriority"))

  test("universe bands partition the join exactly: band sums add to the exact join sum") {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    def joinSum(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      l.join(r, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(round(rev, 4).cast("decimal(18,4)")).as("s"))
        .collect()(0).getDecimal(0)
    val exact = joinSum(li, ord)
    val bandTotal = (0L until 10L).map { b =>
      val us = JoinSampling.universeSample(li, col("l_orderkey"), ord,
        col("o_orderkey"), from = b * 100, until = (b + 1) * 100)
      joinSum(us.left, us.right)
    }.map(x => BigDecimal(x)).sum
    assert(bandTotal == BigDecimal(exact))
  }

  test("universe sample keeps complete fan-out: per-key pair counts match the exact join for sampled keys") {
    val us = JoinSampling.universeSample(li, col("l_orderkey"), ord, col("o_orderkey"))
    val sampledCounts = us.left.join(us.right, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    val exactCounts = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(JoinSampling.band(col("l_orderkey")) < 100)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    assert(sampledCounts.exceptAll(exactCounts).isEmpty &&
      exactCounts.exceptAll(sampledCounts).isEmpty)
  }

  test("universe sample estimate is within 15% of truth at 10% on the fixture") {
    val us = JoinSampling.universeSample(li, col("l_orderkey"), ord, col("o_orderkey"))
    assert(us.scaleFactor == 10.0)
    val est = us.left.join(us.right, col("l_orderkey") === col("o_orderkey"))
      .agg((count(lit(1)) * lit(10L)).as("n")).collect()(0).getLong(0)
    val exact = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(math.abs(est.toDouble / exact - 1.0) < 0.15,
      s"est=$est exact=$exact")
  }

  test("universe band-replicate CI covers the true join sum on the fixture") {
    val r = Inventory.byName("q157_universe_join_ci")
      .run(spark, sf0001).collect()(0)
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val truth = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .agg(sum(round(rev, 4)).cast("double")).collect()(0).getDouble(0)
    assert(r.getLong(3) == 10L)
    assert(r.getDouble(1) <= truth && truth <= r.getDouble(2),
      s"truth=$truth outside [${r.getDouble(1)}, ${r.getDouble(2)}]")
  }

  test("priority sample: returns exactly k+1 rows, priorities descending, deterministic") {
    val top = Sampling.prioritySample(li,
      col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L),
      col("l_extendedprice"), k = 50).collect()
    assert(top.length == 51)
    val prios = top.map(_.getDouble(2))
    assert(prios.zip(prios.tail).forall { case (a, b) => a >= b })
    val again = Sampling.prioritySample(li,
      col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L),
      col("l_extendedprice"), k = 50).collect()
    assert(top.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("priority sample: a negative weight fails loudly in-plan with the named error") {
    // the non-negative-weight contract is ENFORCED, not doc-only
    // (round-12 verdict item 4): a negative weight would silently bias
    // the subset-sum estimate
    val e = intercept[Throwable] {
      Sampling.prioritySample(li,
        col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L),
        col("l_extendedprice") - lit(100000.0), k = 50).collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("prioritySample weight contract")),
      s"expected the named contract error, got: $e")
  }

  test("priority sample: NULL weights pass the guard and are filtered out of the top-k") {
    val withNulls = li.withColumn("__w",
      when(col("l_linenumber") === 1, lit(null).cast("double"))
        .otherwise(col("l_extendedprice")))
    val top = Sampling.prioritySample(withNulls,
      col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L),
      col("__w"), k = 50).collect()
    assert(top.length == 51)
    assert(top.forall(!_.isNullAt(1)),
      "null-weight rows must never enter the sample")
  }

  test("priority sample: null rows cannot pad a small top-(k+1) and bias the estimate upward") {
    // fewer non-null weights than k+1, plus many null-weight rows: before
    // the round-13 ADVICE fix, nulls padded the top-(k+1) so count===k+1
    // set tau to the min NON-null priority (instead of 0) and every padded
    // null row contributed greatest(null, tau)=tau to the sum while
    // inflating n_used — the estimate must instead degenerate to the EXACT
    // sum of the non-null weights (exhaustive sample, tau=0)
    val k = 100
    val mostlyNull = li.limit(500).withColumn("__w",
      when(col("l_linenumber") === 1, col("l_extendedprice"))
        .otherwise(lit(null).cast("double")))
    val nNonNull = mostlyNull.filter(col("__w").isNotNull).count()
    assert(nNonNull > 0 && nNonNull < k + 1,
      s"fixture must have fewer non-null weights than k+1, got $nNonNull")
    val top = Sampling.prioritySample(mostlyNull,
      col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L),
      col("__w"), k = k)
    val est = Sampling.prioritySumEstimate(top, k = k).collect()(0)
    val exact = mostlyNull.filter(col("__w").isNotNull)
      .agg(sum(round(col("__w"), 4).cast("decimal(28,4)")).cast("double"))
      .collect()(0).getDouble(0)
    assert(est.getLong(1) == nNonNull,
      s"n_used must count only non-null-weight rows: ${est.getLong(1)} vs $nNonNull")
    assert(math.abs(est.getDouble(0) - exact) < 1e-6,
      s"estimate must equal the exact non-null sum: ${est.getDouble(0)} vs $exact")
  }

  test("priority estimator: k >= N degenerates to the exact sum (tau = 0)") {
    val small = li.limit(40)
    val top = Sampling.prioritySample(small, col("l_orderkey") * lit(8L) +
      col("l_linenumber"), col("l_extendedprice"), k = 100)
    val est = Sampling.prioritySumEstimate(top, k = 100).collect()(0)
    val exact = small.agg(sum(round(col("l_extendedprice"), 4)
      .cast("decimal(28,4)")).cast("double")).collect()(0).getDouble(0)
    assert(est.getLong(1) == 40L)
    assert(math.abs(est.getDouble(0) - exact) < 1e-6)
  }

  test("priority estimator: within 15% of the exact sum at k=500 on 6k rows") {
    val top = Sampling.prioritySample(li,
      col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L),
      col("l_extendedprice"), k = 500)
    val est = Sampling.prioritySumEstimate(top, k = 500)
      .collect()(0).getDouble(0)
    val exact = li.agg(sum(col("l_extendedprice"))).collect()(0).getDouble(0)
    assert(math.abs(est / exact - 1.0) < 0.15, s"est=$est exact=$exact")
  }

  test("universe distinct: the five 20% user bands partition the exact distinct count") {
    val ev = Tables.events(spark, sf0001)
    val h = pmod(pmod(col("user_id"), lit(1000003L)) * lit(8191L) +
      lit(131L), lit(1000003L))
    val exact = ev.agg(count_distinct(col("user_id"))).collect()(0).getLong(0)
    val bandTotal = (0 until 5).map { b =>
      // last band runs to the full modulus 1000003: five 200000-wide bands
      // would leave residues 1000000-1000002 uncovered, so the partition
      // identity would hold only while the fixture lacks those preimages
      val hi = if (b == 4) 1000003L else (b + 1) * 200000L
      ev.filter(h >= lit(b * 200000L) && h < lit(hi))
        .agg(count_distinct(col("user_id"))).collect()(0).getLong(0)
    }.sum
    assert(bandTotal == exact) // bands partition users: no loss, no double count
    // row-level Bernoulli at the same 20% rate UNDERCOUNTS distinct users
    val rowSampled = ev.filter(pmod(col("event_id"), lit(5L)) === 0)
      .agg(count_distinct(col("user_id"))).collect()(0).getLong(0) * 5L
    assert(rowSampled > exact, // every heavy user survives row sampling ->
      s"row-sampled estimate $rowSampled vs $exact") // x5 OVERcounts here;
    // either way it is biased — the universe estimate is the sound one
  }

  test("priority CI: DLT interval covers the exact sum; exhaustive sample collapses to a point") {
    val key = col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L)
    val top = Sampling.prioritySample(li, key, col("l_extendedprice"), k = 500)
    val r = Sampling.prioritySumEstimateCi(top, k = 500).collect()(0)
    val exact = li.agg(sum(col("l_extendedprice"))).collect()(0).getDouble(0)
    assert(r.getDouble(1) <= exact && exact <= r.getDouble(2),
      s"exact $exact outside [${r.getDouble(1)}, ${r.getDouble(2)}]")
    assert(r.getDouble(1) < r.getDouble(0) && r.getDouble(0) < r.getDouble(2))
    // k >= N: τ = 0 → every variance term 0 → point interval at the exact sum
    val tiny = li.limit(50)
    val exhaustive = Sampling.prioritySumEstimateCi(
      Sampling.prioritySample(tiny, key, col("l_extendedprice"), k = 500),
      k = 500).collect()(0)
    val tinyExact = tiny.agg(sum(round(col("l_extendedprice"), 4)))
      .collect()(0).getDouble(0)
    assert(exhaustive.getDouble(0) === exhaustive.getDouble(1))
    assert(exhaustive.getDouble(0) === exhaustive.getDouble(2))
    assert(math.abs(exhaustive.getDouble(0) - tinyExact) < 1e-6)
    assert(exhaustive.getLong(3) === 50L)
  }

  test("priorityPerKey: per-group estimates track per-group exact sums; small groups go exact") {
    import graft.operators.Skew
    val liKey = col("l_orderkey") * lit(8191L) + col("l_linenumber") * lit(131L)
    val est = Skew.priorityPerKey(li, Seq("l_returnflag"), liKey,
      col("l_extendedprice"), k = 400).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    exact.foreach { case (g, (s, n)) =>
      val (e, used) = est(g)
      assert(used == math.min(n, 400L), s"$g used $used of $n")
      assert(math.abs(e / s - 1.0) < 0.25, s"$g est $e vs exact $s")
    }
    // a group smaller than k is sampled exhaustively: τ=0, estimate exact
    val small = li.filter(col("l_returnflag") === "R").limit(50)
      .unionByName(li.filter(col("l_returnflag") === "A"))
    val out = Skew.priorityPerKey(small, Seq("l_returnflag"), liKey,
      col("l_extendedprice"), k = 400).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exactSmall = small.filter(col("l_returnflag") === "R")
      .agg(sum(round(col("l_extendedprice"), 4).cast("decimal(28,4)"))
        .cast("double")).collect()(0).getDouble(0)
    assert(math.abs(out("R") - exactSmall) < 1e-6)
  }

  test("quality model: native kernel is bit-identical to the declarative fold on the corpus and edges") {
    import spark.implicits._
    val edges = Seq("", " ", "  a  b ", "x", "a b c d e f g",
      "single-token-with-punct!?", "trailing space ").toDF("text")
    Seq(edges, Tables.documents(spark, sf001).select(col("text"))).foreach { df =>
      val both = df.select(
        QualityModel.marginCents(col("text")).as("native"),
        QualityModel.marginCentsFold(col("text")).as("fold"))
      assert(both.filter(col("native") =!= col("fold")).count() == 0)
    }
    // SQL registration (GraftExtensions) reaches the same kernel
    Tables.documents(spark, sf0001).createOrReplaceTempView("qm_docs")
    val viaSql = spark.sql(
      "SELECT sum(quality_margin_cents(text)) FROM qm_docs").collect()(0).getLong(0)
    val viaApi = Tables.documents(spark, sf0001)
      .agg(sum(QualityModel.marginCents(col("text")))).collect()(0).getLong(0)
    assert(viaSql == viaApi)
  }

  test("quality model: margin is the sum of per-token bucket weights; empty text scores 0") {
    import spark.implicits._
    val df = Seq("alpha beta gamma", "", "x").toDF("text")
      .select(QualityModel.marginCents(col("text")).as("mc"))
    val got = df.collect().map(_.getLong(0))
    def w(tok: String): Long = {
      val b = (tok.length * 31 + tok.head.toInt) % 64
      ((b * 127 + 17) % 101 - 50).toLong
    }
    assert(got(0) == w("alpha") + w("beta") + w("gamma"))
    assert(got(1) == 0L)
    assert(got(2) == w("x"))
  }

  test("trained-weight paths: joined and mapped margins equal the baked kernel per doc") {
    val docs = Tables.documents(spark, sf0001)
    // broadcast-join path against the explicit default weight table
    val baked = docs.select(col("doc_id"),
      QualityModel.marginCents(col("text")).as("m"))
    val joined = QualityModel.marginCentsJoined(docs, "doc_id", "text",
      QualityModel.defaultWeightTable(spark))
    assert(baked.join(joined, "doc_id")
      .filter(col("m") =!= col("margin_cents")).count() == 0)
    assert(joined.count() == docs.count(), "every doc must survive the join path")
    // map-literal path with the same coefficients
    val wmap = (0 until QualityModel.Buckets)
      .map(b => b -> ((b * 127 + 17) % 101 - 50).toLong).toMap
    assert(docs.select(QualityModel.marginCents(col("text")).as("m"),
        QualityModel.marginCentsMapped(col("text"), wmap).as("mm"))
      .filter(col("m") =!= col("mm")).count() == 0)
    // buckets absent from a trained model weigh 0
    val sparse = docs.select(
      QualityModel.marginCentsMapped(col("text"), Map(0 -> 0L)).as("mm"))
      .agg(sum(abs(col("mm")))).collect()(0).getLong(0)
    assert(sparse == 0L)
  }

  test("trainWeights recovers a separating model from teacher labels; deterministic") {
    val docs = Tables.documents(spark, sf0001)
    val teacher = QualityModel.marginCents(col("text")) > 0
    val label = when(teacher, lit(1.0)).otherwise(lit(0.0))
    // probe-picked point (tools/TrainProbe): acc 0.954 here, 0.974+ at 80
    // iters; deterministic, so the measured margin over the floor is fixed
    val trained = QualityModel.trainWeights(docs, "doc_id", "text", label,
      iters = 50, lr = 2.0, decay = 0.05)
    // score through the production join path with the TRAINED table
    val acc = QualityModel.marginCentsJoined(docs, "doc_id", "text", trained)
      .join(docs.select(col("doc_id"), teacher.as("__t")), "doc_id")
      .select(((col("margin_cents") > 0) === col("__t")).cast("long").as("ok"))
      .agg(avg(col("ok"))).collect()(0).getDouble(0)
    assert(acc >= 0.9, s"trained accuracy $acc vs the linear teacher")
    // deterministic: identical weight table on a re-run
    val again = QualityModel.trainWeights(docs, "doc_id", "text", label,
      iters = 50, lr = 2.0, decay = 0.05)
    assert(trained.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ===
      again.collect().map(r => (r.getInt(0), r.getLong(1))).toSet)
  }

  test("quality model: keep <=> margin > 0, and score = margin/100") {
    val scored = Tables.documents(spark, sf0001)
      .select(QualityModel.marginCents(col("text")).as("mc"),
        QualityModel.score(col("text")).as("sc"),
        QualityModel.keep(col("text")).as("k"))
      .collect()
    scored.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(0) > 0))
      assert(math.abs(r.getDouble(1) - r.getLong(0) / 100.0) == 0.0)
    }
    // the deterministic table is centered: both classes occur
    assert(scored.exists(_.getBoolean(2)) && scored.exists(!_.getBoolean(2)))
  }

  test("corpus overlap: identical sources have Jaccard 1 in both exact and KMV paths") {
    import spark.implicits._
    val docs = (1 to 30).flatMap { i =>
      val txt = s"tok${i}a tok${i}b tok${i}c tok${i}d tok${i}e"
      Seq(("a", txt), ("b", txt))
    }.toDF("source", "text")
    val rep = CorpusOverlap.pairwiseOverlap(
      CorpusOverlap.shingleHashes(docs, "source", "text"), k = 16).collect()
    assert(rep.length == 1)
    val r = rep(0)
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0)
  }

  test("corpus overlap: disjoint sources have Jaccard 0 in both paths") {
    import spark.implicits._
    val docs = (1 to 30).flatMap { i =>
      Seq(("a", s"ax$i bx$i cx$i dx$i"), ("b", s"py$i qy$i ry$i sy$i"))
    }.toDF("source", "text")
    val r = CorpusOverlap.pairwiseOverlap(
      CorpusOverlap.shingleHashes(docs, "source", "text"), k = 16).collect()(0)
    assert(r.getLong(4) == 0L && r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0)
  }

  test("corpus overlap: KMV estimate tracks exact Jaccard on the fixture within 3/sqrt(k)") {
    val rep = CorpusOverlap.pairwiseOverlap(
      CorpusOverlap.shingleHashes(Tables.documents(spark, sf001), "source", "text"),
      k = 128).collect()
    assert(rep.length == 20 * 19 / 2)
    val tol = 3.0 / math.sqrt(128.0)
    rep.foreach { r =>
      assert(math.abs(r.getDouble(5) - r.getDouble(6)) <= tol,
        s"${r.getString(0)}-${r.getString(1)}: exact=${r.getDouble(5)} kmv=${r.getDouble(6)}")
    }
  }

  test("ewmaFlags: flat series is ok, a 3x spike flags high, a collapse flags low, head is warmup") {
    import spark.implicits._
    val series = Seq.tabulate(12)(i => ("a", i, i match {
      case 9 => java.math.BigDecimal.valueOf(300L) // 3x spike
      case 11 => java.math.BigDecimal.valueOf(10L) // collapse
      case _ => java.math.BigDecimal.valueOf(100L)
    })).toDF("k", "t", "x")
    val out = Rolling.ewmaFlags(series, Seq("k"), Seq("t"), col("x"))
      .orderBy(col("t")).select("t", "flag").as[(Int, String)].collect().toMap
    assert(out(0) == "warmup")
    (1 to 8).foreach(t => assert(out(t) == "ok", s"t=$t got ${out(t)}"))
    assert(out(9) == "high")
    assert(out(10) == "ok") // 100 vs spike-inflated trend still within 2x band
    assert(out(11) == "low")
  }

  test("ewmaFlags: ewma_prev of a constant series recovers the constant") {
    import spark.implicits._
    val series = Seq.tabulate(10)(i =>
      ("a", i, java.math.BigDecimal.valueOf(250L))).toDF("k", "t", "x")
    val out = Rolling.ewmaFlags(series, Seq("k"), Seq("t"), col("x"))
      .filter(col("t") === 9).select("ewma_prev").collect()(0).getDouble(0)
    // num and den are exact decimals; the single double division leaves
    // sub-ulp noise (same two doubles -> same bits in any engine)
    assert(math.abs(out - 250.0) < 1e-9)
  }

  test("stepsForTarget: steps hit the budget shares; under-represented groups clamp to keep-all") {
    import spark.implicits._
    val docs = (Seq.tabulate(600)(i => (i.toLong, "big")) ++
      Seq.tabulate(30)(i => (1000L + i, "small"))).toDF("doc_id", "source")
    val steps = Mixing.stepsForTarget(docs, "source",
      Map("small" -> 1L, "big" -> 1L), 1L, budgetRows = 100L)
    // big: 600*2/(100*1) = 12; small: 30*2/(100*1) = 0 -> clamped to 1
    assert(steps == Map("big" -> 12L, "small" -> 1L))
    val mixed = Mixing.corpusMix(docs, "doc_id", "source", steps)
    val kept = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 30L) // keep-all
    assert(math.abs(kept("big") - 50L) <= 15L) // ≈ 600/12
  }

  test("KMV sketches merge: folding a new drop into the sketch equals rebuilding from scratch") {
    val docs = Tables.documents(spark, sf001)
    val drop1 = docs.filter(col("doc_id") % 2 === 0)
    val drop2 = docs.filter(col("doc_id") % 2 === 1)
    val k = 64
    val merged = CorpusOverlap.mergeSketches(Seq(
      CorpusOverlap.kmvSketch(
        CorpusOverlap.shingleHashes(drop1, "source", "text"), k),
      CorpusOverlap.kmvSketch(
        CorpusOverlap.shingleHashes(drop2, "source", "text"), k)), k)
    val rebuilt = CorpusOverlap.kmvSketch(
      CorpusOverlap.shingleHashes(docs, "source", "text"), k)
    assert(merged.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(merged).isEmpty)
  }

  test("edge cases: invalid band windows and k are rejected loudly; single-source overlap is empty") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      JoinSampling.universeSample(li, col("l_orderkey"), ord,
        col("o_orderkey"), from = 100, until = 100)
    }
    intercept[IllegalArgumentException] {
      JoinSampling.universeSample(li, col("l_orderkey"), ord,
        col("o_orderkey"), from = 0, until = 2000)
    }
    intercept[IllegalArgumentException] {
      Sampling.prioritySample(li, col("l_orderkey"), col("l_extendedprice"), 0)
    }
    intercept[IllegalArgumentException] {
      Mixing.stepsForTarget(
        Seq((1L, "a")).toDF("doc_id", "source"), "source",
        Map("a" -> 0L), 1L, 10L)
    }
    val one = Seq(("only", "alpha beta gamma delta")).toDF("source", "text")
    assert(CorpusOverlap.pairwiseOverlap(
      CorpusOverlap.shingleHashes(one, "source", "text"), k = 8).count() == 0)
  }

  test("ewmaFlags: a null measure flags no_data and is excluded from later trends") {
    import spark.implicits._
    val series = Seq[(String, Int, Option[java.math.BigDecimal])](
      ("a", 0, Some(java.math.BigDecimal.valueOf(100L))),
      ("a", 1, None),
      ("a", 2, Some(java.math.BigDecimal.valueOf(100L))))
      .toDF("k", "t", "x")
    val out = Rolling.ewmaFlags(series, Seq("k"), Seq("t"), col("x"))
      .select("t", "flag").as[(Int, String)].collect().toMap
    assert(out(0) == "warmup" && out(1) == "no_data" && out(2) == "ok")
  }

  test("ewmaFlags: two keys never see each other's history") {
    import spark.implicits._
    // key b's spike must not contaminate key a's trend
    val series = (Seq.tabulate(6)(i => ("a", i, java.math.BigDecimal.valueOf(100L))) ++
      Seq.tabulate(6)(i => ("b", i, java.math.BigDecimal.valueOf(
        if (i == 5) 900L else 100L)))).toDF("k", "t", "x")
    val out = Rolling.ewmaFlags(series, Seq("k"), Seq("t"), col("x"))
      .select("k", "t", "flag").as[(String, Int, String)].collect()
      .map { case (k, t, f) => (k, t) -> f }.toMap
    assert(out(("a", 5)) == "ok")
    assert(out(("b", 5)) == "high")
    assert(out(("a", 0)) == "warmup" && out(("b", 0)) == "warmup")
  }

  test("corpus overlap: shingle fold hash equals the declarative fingerprint fold on raw strings") {
    import spark.implicits._
    val df = Seq("alpha beta gamma", "Zed 9 q").toDF("s")
    val native = df.select(CorpusOverlap.foldHash(col("s"))).collect().map(_.getLong(0))
    val fold = df.select(
      aggregate(filter(split(col("s"), ""), c => length(c) === 1), lit(0L),
        (acc, c) => pmod(acc * lit(31L) + ascii(c).cast("long"), lit(1000000007L)))
    ).collect().map(_.getLong(0))
    assert(native.toSeq == fold.toSeq)
  }
}
