package graft

import org.apache.spark.sql.functions._

import graft.exec.{Estimators, HistQuantile}
import graft.functions.CountMin
import graft.operators.{Cdc, Dedup, Mixing, Profiling, Skew, Validation}

/** Degenerate-input behavior of the session's newer operators: empty
  * frames, single rows, and all-rows-one-group must flow through without
  * throwing and with the right (usually empty) answer — at 100 TB these
  * shapes show up as empty partitions and filtered-to-nothing branches of
  * larger jobs, where an exception kills the whole pipeline. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs =
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")

  test("empty input: topN, dup-span, moments, temperature all yield empty") {
    assert(Skew.topNPerKey(emptyDocs, Seq("source"),
      Seq(col("doc_id").asc), n = 3).count() === 0)
    assert(Dedup.dupNgramStats(emptyDocs, "doc_id", "text").count() === 0)
    assert(Estimators.momentSketch(emptyDocs, col("doc_id"),
      Seq("source")).count() === 0)
    assert(Mixing.temperatureMix(emptyDocs, "doc_id", "source",
      alpha = 0.5, scale = 2.0).count() === 0)
  }

  test("single row: survives every per-group path with sane values") {
    val one = Seq((7L, "only one document here", "src")).toDF("doc_id", "text", "source")
    val top = Skew.topNPerKey(one, Seq("source"), Seq(col("doc_id").asc), n = 3)
    assert(top.count() === 1 && top.head.getAs[Long]("rank") === 1L)
    // a lone doc shares no grams with others: n_dup must be 0
    val span = Dedup.dupNgramStats(one, "doc_id", "text").head
    assert(span.getLong(2) === 0L)
    // n = 1 group: variance must be the guarded 0.0, not NaN/throw
    val stats = Estimators.momentStats(
      Estimators.momentSketch(one, col("doc_id"), Seq("source"))).head
    assert(stats.getLong(1) === 1L && stats.getDouble(3) === 0.0)
    // temperature draw of a 1-row group keeps the row (max(1, ...) floor)
    assert(Mixing.temperatureMix(one, "doc_id", "source", 0.5, 0.001)
      .count() === 1)
  }

  test("all rows in one group: top-N bounded, moments match direct agg") {
    val df = (0L until 1000L).map(i => (i, s"doc $i", "only"))
      .toDF("doc_id", "text", "source")
    assert(Skew.topNPerKey(df, Seq("source"),
      Seq(col("doc_id").desc), n = 5, shards = 4).count() === 5)
    val m = Estimators.momentStats(
      Estimators.momentSketch(df, col("doc_id"), Seq("source"))).head
    assert(m.getLong(1) === 1000L)
    assert(math.abs(m.getDouble(2) - 499.5) < 1e-9) // mean of 0..999
  }

  test("empty input: CMS, histogram, CDC, validation, trend all degrade sanely") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    val some = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    // empty sketch: estimates against it are 0 (key definitely absent)
    val est = CountMin.estimate(CountMin.build(empty, col("k"), 32),
      some, col("k"), 32).collect()
    assert(est.length == 2 && est.forall(_.getLong(1) == 0L))
    // empty histogram: no bins; quantiles over it return no rows
    val h = HistQuantile.histogram(empty, col("v"), 0.0, 10.0, 8)
    assert(h.count() == 0)
    assert(HistQuantile.quantiles(h, 0.0, 10.0, Seq(0.5)).count() == 0)
    // CDC against an empty old side: everything is 'added' (and back)
    val d1 = Cdc.snapshotDiff(empty, some, Seq("k"), Seq("v"))
    assert(d1.count() == 2 &&
      d1.filter(col("change_type") === "added").count() == 2)
    val d2 = Cdc.snapshotDiff(some, empty, Seq("k"), Seq("v"))
    assert(d2.filter(col("change_type") === "removed").count() == 2)
    assert(Cdc.deltaRows(d1, Seq("k"), Seq("v")).count() == 2)
    // validation on an empty frame: 0 violations of 0 rows, never a throw
    val v = Validation.validate(empty,
      Seq(Validation.Check.NotNull("v"), Validation.Check.Unique(Seq("k"))))
      .collect()
    assert(v.length == 2 && v.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
    // trend of an empty frame: no groups, no rows
    assert(Profiling.groupTrend(empty.withColumn("g", lit("a")),
      Seq("g"), col("k"), col("v")).count() == 0)
  }

  test("empty corpus: bm25 and collocations return empty, never NPE") {
    import graft.operators.TextAnalysis
    val bm = TextAnalysis.bm25Search(emptyDocs, "doc_id", "text",
      Seq("hello"), topK = 3)
    assert(bm.columns.toSeq === Seq("doc_id", "dl", "score"))
    assert(bm.count() === 0)
    val co = TextAnalysis.collocations(emptyDocs, "text")
    assert(co.columns.toSeq ===
      Seq("w1", "w2", "n_xy", "n_x", "n_y", "lift"))
    assert(co.count() === 0)
    // single-token docs: unigrams exist but zero bigrams — the lift
    // denominator (bigram total) is 0, which must yield empty, not ÷0
    val singles = Seq((1L, "alpha", "s"), (2L, "beta", "s"))
      .toDF("doc_id", "text", "source")
    assert(TextAnalysis.collocations(singles, "text").count() === 0)
  }

  test("vanished group: merged signed sketch drops it, matching a rebuild") {
    // day-0 snapshot has group b; the delta removes BOTH its rows, so the
    // merged sketch holds (n=0, s1=0, s2=0) for b — momentStats must drop
    // that row exactly like a rebuild-from-rows (which never emits b)
    val day0 = Seq(("a", 10L), ("b", 5L), ("b", 7L)).toDF("g", "v")
    val base = Estimators.signedMomentSketch(
      day0.withColumn("sign", lit(1)), col("v"), col("sign"), Seq("g"))
    val delta = Estimators.signedMomentSketch(
      Seq(("b", 5L, -1), ("b", 7L, -1)).toDF("g", "v", "sign"),
      col("v"), col("sign"), Seq("g"))
    val merged = Estimators.mergeMoments(base.union(delta), Seq("g"))
    val stats = Estimators.momentStats(merged).collect()
    assert(stats.length === 1 && stats.head.getString(0) === "a")
    assert(!stats.head.anyNull && !stats.head.getDouble(2).isNaN)
  }

  test("round-5 ops: empty/degenerate inputs flow through trained weights, capped pairs, hashed segdedup") {
    import graft.operators.QualityModel
    // trained-weight paths on an empty corpus: empty result, no NPE
    val w = QualityModel.defaultWeightTable(spark)
    assert(QualityModel.marginCentsJoined(emptyDocs, "doc_id", "text", w)
      .count() === 0)
    // empty-text doc: survives the join path with margin 0 (explode_outer)
    val one = Seq((7L, "", "src")).toDF("doc_id", "text", "source")
    val r = QualityModel.marginCentsJoined(one, "doc_id", "text", w).head()
    assert(r.getLong(0) === 7L && r.getLong(1) === 0L)
    // empty weight TABLE: every margin 0, every doc kept in the output
    val noWeights = w.limit(0)
    val docs3 = Seq((1L, "a b", "s"), (2L, "c", "s")).toDF("doc_id", "text", "source")
    val zeroed = QualityModel.marginCentsJoined(docs3, "doc_id", "text", noWeights)
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    assert(zeroed === Map(1L -> 0L, 2L -> 0L))
    // capped pair enumerators on empty / singleton inputs
    assert(Dedup.lshCandidatePairs(emptyDocs, "doc_id", "text",
      maxBucket = 2).count() === 0)
    assert(Dedup.simhashNearDupPairs(
      Seq((1L, "only doc", "s")).toDF("doc_id", "text", "source"),
      "doc_id", "text", maxBucket = 2).count() === 0)
    // hashed-key segment dedup on empty input and a single empty-text doc
    assert(Dedup.segmentDedup(emptyDocs, "doc_id", "text",
      hashedKeys = true).count() === 0)
    val segOne = Dedup.segmentDedup(
      Seq((3L, "", "s")).toDF("doc_id", "text", "source"),
      "doc_id", "text", segmentWords = 2, hashedKeys = true).head()
    assert(segOne.getLong(0) === 3L && segOne.getLong(1) === 1L)
  }

  test("round-3 ops: empty and single-row inputs flow through") {
    import graft.operators.{EventAnalytics, Packing, TextAnalysis}
    val emptyEv = Seq.empty[(Long, Long, String, Long)]
      .toDF("user_id", "us", "event_type", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    assert(EventAnalytics.transitions(emptyEv, "user_id", "ts",
      "event_type", "event_id").count() === 0)
    assert(EventAnalytics.retentionCohorts(emptyEv, "user_id", "ts")
      .count() === 0)
    assert(EventAnalytics.timeGaps(emptyEv, "user_id", "ts", "event_id",
      1000L).count() === 0)
    // one event: no transition pairs, no gaps, one cohort cell at offset 0
    val one = Seq((1L, 1000000L, "view", 1L))
      .toDF("user_id", "us", "event_type", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    assert(EventAnalytics.transitions(one, "user_id", "ts", "event_type",
      "event_id").count() === 0)
    assert(EventAnalytics.timeGaps(one, "user_id", "ts", "event_id", 1L)
      .count() === 0)
    val coh = EventAnalytics.retentionCohorts(one, "user_id", "ts").collect()
    assert(coh.length === 1 && coh.head.getLong(1) === 0L &&
      coh.head.getLong(2) === 1L)
    // empty corpus: LM scorers and head coverage return empty, not throw
    assert(TextAnalysis.unigramRarity(emptyDocs, "doc_id", "text")
      .count() === 0)
    assert(TextAnalysis.headCoverage(emptyDocs, "source", "text", 10)
      .count() === 0)
    assert(Packing.argmaxViaJoin(emptyEv.select(col("user_id"), col("us")),
      Seq("user_id"), "us", Nil).count() === 0)
    // jackknife over an empty sample: scalar pass yields null/0, no throw
    val jk = Estimators.jackknifeSum(emptyDocs, pmod(col("doc_id"), lit(4L)),
      col("doc_id"), scale = 10.0, k = 4, alias = "s").head
    assert(jk.isNullAt(0) || jk.getDouble(0) === 0.0)
  }
}
