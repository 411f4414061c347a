package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationPipeline, Decontam, Dedup, Mixing, Multimodal, TextAnalysis}

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

  test("pipeline-level media seams: decoders + embedder wire through Config into sem-dedup") {
    // round-13 verdict item 6: a deployment plugs FrameDecoder /
    // MediaEmbedder ONCE in the pipeline config — no operator call sites
    // touched — and the extracted features feed the semantic-dedup stage.
    // Same fakes as the MultimodalSpec seam cases.
    val w = 12; val h = 8
    val gA = Array.tabulate(w * h)(i => (i * 7 + 3) % 256)
    // an "H264" clip only the PLUGGED codec can decode (2 frames)
    val avi = Multimodal.aviCodecBytes(w, h, "H264",
      Seq(gA.map(_.toByte), gA.map(_.toByte)))
    // the two text docs are 37 UTF-8 bytes EACH, so the fake embedder
    // (feature i = i + byte length) emits identical vectors — the
    // semantic twins the sem-dedup stage must collapse
    val t1 = "spark catalyst optimizer rules engine"
    val t2 = "minhash banding buckets verify kernel"
    assert(t1.getBytes("UTF-8").length === 37 &&
      t2.getBytes("UTF-8").length === 37)
    val docs = Seq(
      (1L, t1, "web", "text", t1.getBytes("UTF-8")),
      (2L, t2, "web", "text", t2.getBytes("UTF-8")),
      (3L, "a third distinct document about columnar layouts", "web",
        "video", avi))
      .toDF("doc_id", "text", "source", "kind", "bytes")
    val cfg = CurationPipeline.Config(
      mediaFeatures = Some(CurationPipeline.MediaFeatures(dim = 4)),
      frameDecoders = Seq(new FakeGrayCodec("H264")),
      mediaEmbedder = Some(new FakeTextEmbedder),
      semanticDedup = Some(("media_vec", 0.95, 1)))
    val out = CurationPipeline.run(docs, None, "doc_id", "text", "source",
      cfg).cache()
    assert(out.columns.contains("media_vec"))
    // the equal-length text twins collapsed to the min id; video survives
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
    val vecs = out.select($"doc_id", $"media_vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // text leg: the plugged embedder's deterministic vector
    assert(vecs(1L) === (0 until 4).map(i => (i + 37).toFloat))
    // video leg: REAL frame means through the plugged codec — mean gray
    // of each of the 2 frames, zero-padded to dim
    val mean = gA.sum.toFloat / (w * h)
    assert(vecs(3L) === Seq(mean, mean, 0.0f, 0.0f),
      "the plugged codec must produce decoded frame means, not the stub")
    out.unpersist()
    // control: WITHOUT the decoder the H264 clip falls through to the
    // byte stub — the pipeline-level plug is load-bearing. Sem-dedup is
    // off here: the stub's hash-derived positive vector can land within
    // cosine 0.95 of the text vectors and drop doc 3 before the assert —
    // the control's claim is about the VECTOR, not the dedup.
    val noDecode = CurationPipeline.run(docs, None, "doc_id", "text",
      "source", cfg.copy(frameDecoders = Nil, semanticDedup = None))
      .filter($"doc_id" === 3L)
      .select($"media_vec").collect()(0).getSeq[Float](0)
    assert(noDecode !== Seq(mean, mean, 0.0f, 0.0f))
  }
}
