package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventAnalytics, TextAnalysis}

/** Unit anchors for the product-analytics trio and the corpus LM scorers —
  * hand-computable fixtures plus invariants on the driver fixture. */
class EventAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  test("transitions: probabilities sum to 1 per prev; counts hand-check") {
    // user 1: a -> b -> a ; user 2: a -> a
    val ev = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 30L, "a", 3L),
      (2L, 10L, "a", 4L), (2L, 20L, "a", 5L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val t = EventAnalytics.transitions(ev, "user_id", "ts", "event_type",
      "event_id").collect()
    val m = t.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(m == Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("a", "a") -> 1L))
    val byPrev = t.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(3)).sum)
    byPrev.foreach { case (p, s) => assert(math.abs(s - 1.0) < 1e-12, p) }
  }

  test("retention: offset-0 cell equals cohort size; offsets non-negative") {
    val ev = Tables.events(spark, sf0001)
    val r = EventAnalytics.retentionCohorts(ev, "user_id", "ts")
    val rows = r.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 0L), "negative week offset")
    // every user is active in their first week, so the offset-0 diagonal
    // summed over cohorts equals the number of distinct users
    val zeroSum = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val nUsers = ev.select("user_id").distinct().count()
    assert(zeroSum == nUsers, s"offset-0 mass $zeroSum vs users $nUsers")
  }

  test("timeGaps finds exactly the planted over-threshold gaps") {
    val base = 1000000L
    val ev = Seq(
      (1L, base, 1L), (1L, base + 100L, 2L), (1L, base + 1000100L, 3L),
      (2L, base, 4L), (2L, base + 50L, 5L)
    ).toDF("user_id", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    val g = EventAnalytics.timeGaps(ev, "user_id", "ts", "event_id",
      gapMicros = 500000L).collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == 1L)       // only user 1 has a big gap
    assert(g.head.getLong(1) == 2L)       // two intervals
    assert(g.head.getLong(2) == 1L)       // one over threshold
    assert(g.head.getLong(3) == 1000000L) // the max gap
  }

  test("unigramRarity: common tokens score low, rare tokens high") {
    val docs = Seq(
      (1L, "the the the the"), // all common
      (2L, "the the zyx qqq")  // half rare
    ).toDF("doc_id", "text")
    val r = TextAnalysis.unigramRarity(docs, "doc_id", "text").collect()
    // corpus: the=6, zyx=1, qqq=1, N=8 → rarity(the)=1, rarity(rare)=8
    val byDoc = r.map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(byDoc(1L) == ((4L, 4L)))        // 4 tokens × rarity 1
    assert(byDoc(2L) == ((4L, 2L + 16L)))  // 2×1 + 2×8
  }

  test("headCoverage: full coverage when k spans the vocab; partial below") {
    val docs = Seq(
      ("s1", "a a b"), ("s2", "a c c")
    ).toDF("source", "text")
    val full = TextAnalysis.headCoverage(docs, "source", "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(full("s1") == 1.0 && full("s2") == 1.0)
    // k=1 keeps only 'a' (count 3) → s1 covers 2/3, s2 covers 1/3
    val one = TextAnalysis.headCoverage(docs, "source", "text", k = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(one("s1") - 2.0 / 3) < 1e-12)
    assert(math.abs(one("s2") - 1.0 / 3) < 1e-12)
  }
}
