package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationPipeline, Decontam, Dedup, Mixing, TextAnalysis}

/** End-to-end composition: the full curation flow over the fixture, each
  * stage's row accounting cross-checked against the operators run alone. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("full pipeline: stage accounting matches the operators run alone") {
    val docs = Tables.documents(spark, sf0001)
    val eval = docs.filter(pmod($"doc_id", lit(50L)) === 0)
      .select($"doc_id", $"text")
    val train = docs.filter(pmod($"doc_id", lit(50L)) =!= 0)

    val out = CurationPipeline.run(train, Some(eval), "doc_id", "text",
      "source", CurationPipeline.Config(
        minQuality = 0.3,
        mixSteps = Map("src0" -> 2L),
        splitWeights = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L)))
    out.cache()

    // output schema carries the pipeline annotations
    assert(Seq("quality", "n_tokens", "mix_step", "split")
      .forall(out.columns.contains))

    // no surviving near-dups above threshold and no eval contamination:
    // re-running the detectors on the OUTPUT finds nothing
    val residualPairs = Dedup.allPairsJaccard(
      out.select($"doc_id", $"text"), "doc_id", "text", threshold = 0.8)
    assert(residualPairs.count() === 0, "near-dups survived the pipeline")
    val residualContam = Decontam.contamination(
      out.select($"doc_id", $"text"), eval, "doc_id", "text", n = 3)
    assert(residualContam.count() === 0, "contaminated docs survived")

    // quality floor holds
    assert(out.filter($"quality" < 0.3).count() === 0)

    // mixing kept exactly the hash-selected src0 rows (verify against the
    // same filter applied independently)
    val src0 = out.filter($"source" === "src0")
    val expectedSrc0 = Mixing.corpusMix(
      out.drop("mix_step").filter($"source" === "src0"), "doc_id", "source",
      Map("src0" -> 2L)).count()
    assert(src0.count() === expectedSrc0)

    // split is total and consistent with splitAssign run directly
    val direct = Mixing.splitAssign(out.drop("split"), "doc_id",
        Seq("train" -> 8L, "val" -> 1L, "test" -> 1L))
      .select($"doc_id", $"split".as("s2"))
    assert(out.join(direct, "doc_id").filter($"split" =!= $"s2").count() === 0)

    // rows only ever drop through the pipeline, and something survives
    assert(out.count() > 0 && out.count() <= train.count())
    out.unpersist()
  }

  test("optional semantic-dedup stage drops embedding twins, keeps the rest") {
    // distinct texts (survive text dedup) but two docs share an embedding
    // direction → only the semantic stage can catch the pair
    val rng = new scala.util.Random(5L)
    val vecA = Array.fill(64)(rng.nextGaussian().toFloat)
    val vecTwin = vecA.map(x => x + 1e-4f)
    val others = Seq.tabulate(12)(_ => Array.fill(64)(rng.nextGaussian().toFloat))
    val docs = ((0 until 12).map(i =>
        (i.toLong, s"unique document number $i with its own distinct words $i",
          "src0", others(i))) ++ Seq(
        (20L, "completely original text about embeddings", "src0", vecA),
        (21L, "another fully different sentence entirely", "src0", vecTwin)))
      .toDF("doc_id", "text", "source", "embedding")
    val without = CurationPipeline.run(docs, None, "doc_id", "text", "source",
      CurationPipeline.Config(nearDupThreshold = 0.999999))
    val withSem = CurationPipeline.run(docs, None, "doc_id", "text", "source",
      CurationPipeline.Config(nearDupThreshold = 0.999999,
        semanticDedup = Some(("embedding", 0.99, 4))))
    val keptWithout = without.select("doc_id").as[Long].collect().toSet
    val keptWith = withSem.select("doc_id").as[Long].collect().toSet
    assert(keptWithout.contains(20L) && keptWithout.contains(21L))
    assert(keptWith.contains(20L) && !keptWith.contains(21L),
      s"semantic twin should drop, rep should stay: $keptWith")
    assert(keptWithout -- keptWith === Set(21L)) // nothing else dropped
  }

  test("temperature config draws the α-sampling targets per source") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text", $"source")
    val out = CurationPipeline.run(docs, None, "doc_id", "text", "source",
      CurationPipeline.Config(nearDupThreshold = 0.999999,
        temperature = Some((0.5, 1.0))))
    // after upstream dedup stages, each source keeps ⌊√n_survivors⌋ docs
    // (mix_target column carries the per-group target)
    val byTarget = out.groupBy($"source")
      .agg(count(lit(1)).as("n"), max($"mix_target").as("t"))
      .collect()
    assert(byTarget.nonEmpty)
    byTarget.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"source ${r.getString(0)} kept ${r.getLong(1)} != target ${r.getLong(2)}"))
    intercept[IllegalArgumentException] {
      CurationPipeline.run(docs, None, "doc_id", "text", "source",
        CurationPipeline.Config(mixSteps = Map("src0" -> 2L),
          temperature = Some((0.5, 1.0))))
    }
  }

  test("pipeline with everything off is identity plus annotations") {
    val docs = Tables.documents(spark, sf0001).limit(20)
      .select($"doc_id", $"text", $"source")
    // fixture head: distinct texts, no near-dups above 0.99, no eval
    val out = CurationPipeline.run(docs, None, "doc_id", "text", "source",
      CurationPipeline.Config(nearDupThreshold = 0.999999))
    // exact-dedup may still drop true exact dups; the head-20 has none
    assert(out.count() === 20)
    assert(out.select("doc_id").as[Long].collect().toSet ===
      docs.select("doc_id").as[Long].collect().toSet)
  }

  test("optional line-dedup stage strips repeated boilerplate before near-dedup") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared header boiler plate " + "alpha beta gamma delta unique one two", "a"),
      (2L, "shared header boiler plate " + "epsilon zeta eta theta other words here", "a"),
      (3L, "totally original content with no repeats at all present", "b"))
      .toDF("doc_id", "text", "source")
    val out = CurationPipeline.run(docs, None, "doc_id", "text", "source",
      CurationPipeline.Config(lineDedupSegmentWords = Some(4),
        nearDupThreshold = 0.999999))
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // doc 1 keeps the header (first occurrence); doc 2 loses it
    assert(out(1L).contains("shared header boiler plate"))
    assert(!out(2L).contains("shared header"))
    assert(out(2L).contains("epsilon zeta eta theta"))
    assert(out(3L).contains("totally original"))
    // stage appears in the staged attribution under its own name
    val (_, timings) = CurationPipeline.runStaged(docs, None, "doc_id",
      "text", "source", CurationPipeline.Config(
        lineDedupSegmentWords = Some(4), nearDupThreshold = 0.999999))
    assert(timings.map(_._1).contains("line_dedup"))
  }

  test("optional model-filter stage keeps exactly the positive-margin docs") {
    import graft.operators.QualityModel
    val docs = Tables.documents(spark, sf0001).limit(40)
      .select($"doc_id", $"text", $"source")
    val expected = docs.filter(QualityModel.marginCents($"text") > 0)
      .select("doc_id").as[Long].collect().toSet
    val out = CurationPipeline.run(docs, None, "doc_id", "text", "source",
      CurationPipeline.Config(nearDupThreshold = 0.999999,
        modelFilterMinMarginCents = Some(0L)))
    assert(out.select("doc_id").as[Long].collect().toSet === expected)
    assert(expected.nonEmpty && expected.size < 40) // both classes present
    val (_, timings) = CurationPipeline.runStaged(docs, None, "doc_id",
      "text", "source", CurationPipeline.Config(nearDupThreshold = 0.999999,
        modelFilterMinMarginCents = Some(0L)))
    assert(timings.map(_._1).contains("model_filter"))
  }

  test("optional fuzzy-decontaminate stage drops near-copies of eval docs") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today", "a"),
      (2L, "completely unrelated content about databases and sampling theory here", "a"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tonight", "a"))
      .toDF("doc_id", "text", "source")
    val eval = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text")
    // exact n-gram decontamination alone would also nuke doc 2? no — zero
    // overlap; but it WOULD flag 1 and 3 via shared grams, so disable it
    // by... it has no off switch; instead verify the fuzzy stage runs and
    // the combined result drops 1 and 3, keeps 2
    val out = CurationPipeline.run(train, Some(eval), "doc_id", "text",
      "source", CurationPipeline.Config(nearDupThreshold = 0.999999,
        fuzzyDecontaminateThreshold = Some(0.7)))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(2L))
    val (_, timings) = CurationPipeline.runStaged(train, Some(eval),
      "doc_id", "text", "source",
      CurationPipeline.Config(nearDupThreshold = 0.999999,
        fuzzyDecontaminateThreshold = Some(0.7)))
    assert(timings.map(_._1).contains("fuzzy_decontaminate"))
  }
}
