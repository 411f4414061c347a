package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Funnel, Profiling, TextAnalysis}

/** Round-3 governance operators: PII redaction, repetition quality,
  * source drift, ordered funnels — planted-input semantics the oracle
  * rows can't pin (the fixture has no real PII and no pathological
  * repetition). */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces email, ip, digit runs and counts each once") {
    val df = Seq(
      (1L, "mail a.b+c@ex-am.ple.org then 192.168.0.1 then 123456789 end"),
      (2L, "clean text with short 12345 digits only"))
      .toDF("id", "t")
    val out = TextAnalysis.redactPii(df, "t").orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_email") === 1L)
    assert(r1.getAs[Long]("n_ipv4") === 1L)
    assert(r1.getAs[Long]("n_digit_run") === 1L)
    assert(r1.getAs[String]("redacted") ===
      "mail <EMAIL> then <IP> then <NUM> end")
    val r2 = out(1)
    assert(r2.getAs[Long]("n_email") === 0L && r2.getAs[Long]("n_ipv4") === 0L)
    // 5 digits is below the run threshold: untouched
    assert(r2.getAs[String]("redacted").contains("12345"))
  }

  test("redactPii order: digits inside an email are never counted as runs") {
    val df = Seq((1L, "id 9876543 and 9876543@example.com")).toDF("id", "t")
    val r = TextAnalysis.redactPii(df, "t").head
    // the bare run counts; the email-local-part run is consumed by <EMAIL>
    assert(r.getAs[Long]("n_email") === 1L)
    assert(r.getAs[Long]("n_digit_run") === 1L)
    assert(r.getAs[String]("redacted") === "id <NUM> and <EMAIL>")
  }

  test("repetitionStats: top-token and dup-bigram fractions on planted doc") {
    val df = Seq(
      (1L, "a a a b"),       // top a:3/4; bigrams [a a, a a, a b] → 1 dup of 3
      (2L, "w x y z"),       // no repetition at all
      (3L, "solo"))          // single token: zero bigrams, frac 0.0
      .toDF("doc_id", "text")
    val m = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Long]("n_tokens") === 4L)
    assert(m(1L).getAs[Long]("top_n") === 3L)
    assert(m(1L).getAs[Double]("top_token_frac") === 0.75)
    assert(m(1L).getAs[Long]("n_bigrams") === 3L)
    assert(m(1L).getAs[Long]("n_dup_bigrams") === 1L)
    assert(m(2L).getAs[Long]("n_dup_bigrams") === 0L)
    assert(m(2L).getAs[Double]("top_token_frac") === 0.25)
    assert(m(3L).getAs[Long]("n_bigrams") === 0L)
    assert(m(3L).getAs[Double]("dup_bigram_frac") === 0.0)
  }

  test("sourceTokenDrift: single source has zero distance; disjoint vocab" +
    " matches the closed form 1 - N_s/N") {
    val one = Seq((1L, "a b c a", "s1"), (2L, "b c", "s1"))
      .toDF("doc_id", "text", "source")
    val d1 = TextAnalysis.sourceTokenDrift(one, "source", "text").head
    assert(d1.getAs[Double]("tv_distance") === 0.0)
    // two sources with disjoint vocabularies: TV(source, corpus) =
    // (1 - N_s/N) exactly (derivation in the scaladoc)
    val two = Seq((1L, "a a a", "s1"), (2L, "b", "s2"))
      .toDF("doc_id", "text", "source")
    val d2 = TextAnalysis.sourceTokenDrift(two, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(d2("s1") - 0.25) < 1e-15) // N_s=3, N=4
    assert(math.abs(d2("s2") - 0.75) < 1e-15) // N_s=1, N=4
    // empty corpus degrades to an empty frame
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(TextAnalysis.sourceTokenDrift(empty, "source", "text").count() === 0)
  }

  test("funnel: strict ordering, out-of-order steps do not count") {
    val evs = Seq(
      // u1 completes in order
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // u2 clicks BEFORE viewing: click must not count, stage = 1
      (2L, 200L, "click"), (2L, 300L, "view"),
      // u3 purchase first, then view+click: purchase must not count
      (3L, 50L, "purchase"), (3L, 100L, "view"), (3L, 200L, "click"),
      // u4 same-timestamp view and click: strict > rejects the click
      (4L, 100L, "view"), (4L, 100L, "click"),
      // u5 never views
      (5L, 100L, "error"))
      .toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val stages = Funnel.userStages(evs, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("stage_reached")).toMap
    assert(stages === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
    val counts = Funnel.stageCounts(evs, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).head
    assert(counts.getAs[Long]("n_users") === 5L)
    assert(counts.getAs[Long]("n_stage1") === 4L)
    assert(counts.getAs[Long]("n_stage2") === 2L)
    assert(counts.getAs[Long]("n_stage3") === 1L)
  }

  test("funnel: later cheaper occurrence of an earlier step is ignored" +
    " (first-occurrence chaining, not best-path)") {
    // view@100, click@150, then ANOTHER view@200, purchase@250: the chain
    // anchors at the FIRST view; purchase follows click → full funnel
    val evs = Seq(
      (1L, 100L, "view"), (1L, 150L, "click"),
      (1L, 200L, "view"), (1L, 250L, "purchase"))
      .toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = Funnel.userStages(evs, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).head
    assert(r.getAs[Long]("stage_reached") === 3L)
    assert(r.getAs[Long]("t_step1") === 100L)
    assert(r.getAs[Long]("t_step2") === 150L)
    assert(r.getAs[Long]("t_step3") === 250L)
  }

  test("madOutliers flags exactly the planted contamination, robustly") {
    // 99 values in [0, 98] plus one wild outlier; the mean/stddev z-score
    // would be dragged by the outlier itself — MAD must not be
    val vals = (0 until 99).map(i => ("g", i.toDouble)) :+ (("g", 1e9))
    val df = vals.toDF("g", "v")
    val r = Profiling.madOutliers(df, Seq("g"), col("v"), k = 3.0).head
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Double]("med") === 49.5)
    assert(r.getAs[Long]("n_outliers") === 1L)
    // all-identical group: MAD = 0, nothing flagged (0 > 0 is false)
    val flat = Seq(("h", 5.0), ("h", 5.0), ("h", 5.0)).toDF("g", "v")
    assert(Profiling.madOutliers(flat, Seq("g"), col("v"))
      .head.getAs[Long]("n_outliers") === 0L)
  }

  test("canonicalText collapses case/punct/whitespace; dup groups found") {
    val df = Seq(
      (1L, "Hello, World!"), (2L, "  hello   world  "), (3L, "hello world"),
      (4L, "different text"))
      .toDF("doc_id", "text")
    val canon = df.select(TextAnalysis.canonicalText(col("text")).as("c"))
      .collect().map(_.getString(0))
    assert(canon.take(3).toSet === Set("hello world"))
    val groups = Dedup.canonicalDupGroups(df, "doc_id", "text").collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("rep_id") === 1L)
    assert(groups.head.getAs[Long]("n_copies") === 3L)
  }

  test("rankNormalize: min→0, max→1, singleton group→0, ties share rank") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 40.0),
      ("b", 7.0)).toDF("g", "v")
    val out = Profiling.rankNormalize(df, Seq("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val a = out.filter(_._1 == "a").sortBy(_._2)
    assert(a(0)._3 === 0.0)
    assert(a(1)._3 === a(2)._3) // tie: same pct_rank
    assert(a(1)._3 === (2.0 - 1.0) / 3.0)
    assert(a(3)._3 === 1.0)
    assert(out.find(_._1 == "b").get._3 === 0.0) // 1-row group
  }
}
