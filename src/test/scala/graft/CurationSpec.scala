package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.{Decontam, Mixing, Profiling, TextAnalysis}

/** Specs for the round-2 curation operators (q67–q72 surface). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // -- decontamination -----------------------------------------------------

  test("contamination flags exactly the train docs sharing eval trigrams") {
    val eval = Seq((1L, "the secret benchmark answer is forty two"))
      .toDF("doc_id", "text")
    val train = Seq(
      (10L, "nothing in common with anything here at all"),
      (11L, "we mention the secret benchmark answer verbatim"), // 3 shared 3-grams
      (12L, "short doc"), // < 3 tokens → no grams at all
      (13L, "answer is forty two said the machine")) // 2 shared 3-grams
      .toDF("doc_id", "text")
    val got = Decontam.contamination(train, eval, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 11: "the secret benchmark", "secret benchmark answer" shared (2);
    // doc 13: "answer is forty", "is forty two" shared (2)
    assert(got === Set((11L, 2L, 5L), (13L, 2L, 5L)))
  }

  test("decontaminate drops flagged docs and keeps the rest") {
    val eval = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "alpha beta gamma epsilon zeta"), // shares "alpha beta gamma"
      (11L, "totally unrelated text with no shared grams here"))
      .toDF("doc_id", "text")
    val kept = Decontam.decontaminate(train, eval, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L))
    // a loose threshold keeps a lightly-contaminated doc: doc 10 has 3
    // distinct trigrams, 1 shared → 33% ≤ 50%
    val loose = Decontam.decontaminate(train, eval, "doc_id", "text", n = 3,
      maxOverlapPct = 50).select("doc_id").as[Long].collect().toSet
    assert(loose === Set(10L, 11L))
  }

  test("docNgrams: short docs yield no n-grams, repeats dedup within doc") {
    val df = Seq((1L, "a b"), (2L, "x y x y x y")).toDF("doc_id", "text")
    val grams = Decontam.docNgrams(df, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(!grams.exists(_._1 == 1L))
    // doc 2 trigrams: "x y x" (×2 occurrences) and "y x y" (×2) → distinct 2
    assert(grams.filter(_._1 == 2L).map(_._2).sorted.toSeq ===
      Seq("x y x", "y x y"))
  }

  test("dupNgramStats: planted duplicates count, unique docs report zero") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),      // 3 trigrams, all shared w/ 2
      (2L, "alpha beta gamma delta epsilon"),      // exact dup of 1
      (3L, "alpha beta gamma zeta eta theta"),     // shares "alpha beta gamma"
      (4L, "completely different words entirely here"), // unique
      (5L, "ab"))                                  // < 3 tokens → no grams
      .toDF("doc_id", "text")
    val stats = graft.operators.Dedup.dupNgramStats(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats(1L) === ((3L, 3L)))  // every trigram also in doc 2
    assert(stats(2L) === ((3L, 3L)))
    assert(stats(3L) === ((4L, 1L)))  // only "alpha beta gamma" shared
    assert(stats(4L) === ((3L, 0L)))  // unique doc: zero duplicated grams
    assert(!stats.contains(5L))       // too short to have grams
  }

  test("segmentDedup: first occurrence survives, later copies drop, docs reassemble") {
    // 2-word segments: doc1 = [a b][c d], doc2 = [a b][x y], doc3 = [c d]
    // corpus-wide firsts: (a b)@1:0, (c d)@1:1, (x y)@2:1
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d"),
      (4L, ""))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.segmentDedup(df, "doc_id", "text",
      segmentWords = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((2L, 2L, "a b c d")))      // both firsts
    assert(out(2L) === ((2L, 1L, "x y")))          // "a b" dropped
    assert(out(3L) === ((1L, 0L, "")))             // "c d" dropped entirely
    assert(out(4L)._1 === 1L)                      // empty text = 1 "" segment
    // intra-doc repetition: second copy of the same segment drops too
    val rep = Seq((10L, "p q p q")).toDF("doc_id", "text")
    val r = graft.operators.Dedup.segmentDedup(rep, "doc_id", "text",
      segmentWords = 2).head
    assert((r.getLong(1), r.getLong(2), r.getString(3)) === ((2L, 1L, "p q")))
  }

  test("deterministic shuffle: replayable order, seed changes the permutation, shards balance") {
    import graft.operators.Mixing
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val o1 = Mixing.shuffleDeterministic(docs, "doc_id", seed = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val o1b = Mixing.shuffleDeterministic(docs, "doc_id", seed = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val o2 = Mixing.shuffleDeterministic(docs, "doc_id", seed = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(o1 === o1b, "same seed must replay the identical order")
    assert(o1 !== o2, "different seed must permute differently")
    assert(o1.sorted === o2.sorted, "permutations of the same set")
    assert(o1 !== o1.sorted, "the order is actually shuffled")
    // shard counts balance within a loose multiplicative band
    val counts = Mixing.assignShards(docs, "doc_id", nShards = 8, seed = 1L)
      .groupBy($"shard").count().collect().map(_.getLong(1))
    assert(counts.length === 8)
    val mean = counts.sum.toDouble / 8
    assert(counts.forall(c => c > mean * 0.5 && c < mean * 1.5),
      s"shard skew: ${counts.mkString(",")}")
  }

  test("decontaminateFuzzy drops near-copies of eval docs, keeps the rest; empty eval drops nothing") {
    import graft.operators.Decontam
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely unrelated content about databases and sampling theory here"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tonight"))
      .toDF("doc_id", "text")
    // eval doc 10 is a near-copy of train 1 (one word differs → J ≈ 0.8+);
    // eval doc 11 matches nothing
    val eval = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "benchmark question text with no overlap whatsoever in this corpus"))
      .toDF("doc_id", "text")
    val kept = Decontam.decontaminateFuzzy(train, eval, "doc_id", "text",
      threshold = 0.7).select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 1 is an exact match; doc 3 differs by one trailing word → its
    // Jaccard vs eval-10 is 10/12 ≈ 0.83 ≥ 0.7 → dropped too
    assert(kept === Set(2L))
    val keptAll = Decontam.decontaminateFuzzy(train, eval.limit(0), "doc_id",
      "text", threshold = 0.7).count()
    assert(keptAll === 3L)
  }

  test("stratifiedSplitExact: per-stratum sizes are exact integer cutoffs, assignment is partition-invariant") {
    import graft.operators.Mixing
    val df = ((1L to 10L).map(i => (i, "big")) ++
        (101L to 103L).map(i => (i, "small")) ++
        Seq((201L, "solo")))
      .toDF("doc_id", "source")
    val weights = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L)
    def sizes(d: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
      Mixing.stratifiedSplitExact(d, "doc_id", "source", weights, seed = 1L)
        .groupBy($"source", $"split").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap.withDefaultValue(0L)
    val got = sizes(df)
    // n=10: train ⌊8⌋=8, val ⌊9⌋−8=1, test 1
    assert(got(("big", "train")) === 8L && got(("big", "val")) === 1L &&
      got(("big", "test")) === 1L)
    // n=3: train ⌊2.4⌋=2, val ⌊2.7⌋−2=0, test 1 — tiny stratum still
    // gets a test slice, deterministically
    assert(got(("small", "train")) === 2L && got(("small", "val")) === 0L &&
      got(("small", "test")) === 1L)
    // n=1: everything falls to the LAST split (no earlier cutoff reached)
    assert(got(("solo", "test")) === 1L)
    // partition-invariant: same assignment under any physical layout
    assert(sizes(df.repartition(7)) === got)
    val a1 = Mixing.stratifiedSplitExact(df, "doc_id", "source", weights, 1L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val a2 = Mixing.stratifiedSplitExact(df.repartition(3), "doc_id",
        "source", weights, 1L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a1 === a2)
  }

  test("decontaminateFuzzy: over-cap clique containing an eval doc still drops every train copy") {
    import graft.operators.Decontam
    // 20 verbatim train copies of one eval doc, bucket cap forced far
    // below the clique size: every band bucket holds the whole clique, so
    // the single-center min-id star (min fid = a TRAIN doc) would emit
    // only train×train edges for the other 19 train members — all dropped
    // by the cross-parity filter, silently KEEPING contaminated docs. The
    // parity-aware star (min even + min odd center) must drop all 20.
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val train = (1L to 20L).map(i => (i, txt))
      .toDF("doc_id", "text")
      .unionAll(Seq((50L,
        "totally different words sharing zero shingles with anything else here"))
        .toDF("doc_id", "text"))
    val eval = Seq((100L, txt)).toDF("doc_id", "text")
    val kept = Decontam.decontaminateFuzzy(train, eval, "doc_id", "text",
        threshold = 0.8, maxBucket = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(50L),
      s"contaminated clique members survived the capped star: $kept")
  }

  test("segmentDedup hashedKeys: identical output to the string-keyed form on the fixture") {
    val docs = Tables.documents(spark, sf0001)
    def collectOut(hashed: Boolean) =
      graft.operators.Dedup.segmentDedup(docs, "doc_id", "text",
          segmentWords = 8, keep = Seq("source"), hashedKeys = hashed)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSet
    assert(collectOut(hashed = true) === collectOut(hashed = false))
  }

  test("segmentDedupIncremental: folding batches equals the one-shot dedup") {
    val b1 = Seq((1L, "a b c d"), (2L, "a b x y")).toDF("doc_id", "text")
    val b2 = Seq((3L, "c d q r"), (4L, "q r q r")).toDF("doc_id", "text")
    val emptyIdx = b1.select($"text".as("segment")).limit(0)
    val (o1, idx1) = graft.operators.Dedup.segmentDedupIncremental(
      b1, emptyIdx, "doc_id", "text", segmentWords = 2)
    val (o2, idx2) = graft.operators.Dedup.segmentDedupIncremental(
      b2, idx1, "doc_id", "text", segmentWords = 2,
      bloomExpectedItems = 1024L)
    val inc = o1.unionByName(o2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val full = graft.operators.Dedup.segmentDedup(
        b1.unionByName(b2), "doc_id", "text", segmentWords = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(inc === full)
    assert(inc(3L) === "q r")            // "c d" seen in batch 1 via the index
    assert(inc(4L) === "")               // both segments already seen
    // the index accumulates exactly the distinct segments
    assert(idx2.distinct().count() === 4) // a b, c d, x y, q r
  }

  test("selectByQualityBudget equals the naive sort-and-take-while rule") {
    // quality in [0,1], tokens vary; compare the histogram-threshold
    // selection against the trivially-correct global-sort prefix
    val docs = (1L to 300L).map { i =>
      (i, ((i * 7919) % 101).toDouble / 101.0, 5L + (i * 13) % 37)
    }.toDF("doc_id", "q", "n")
    val budget = 1500L
    val got = graft.operators.Mixing.selectByQualityBudget(
        docs, "doc_id", col("q"), col("n"), budget, buckets = 50,
        boundaryRanges = 8)
      .select("doc_id").as[Long].collect().toSet
    // naive rule: order by (bucket desc, id), inclusive prefix ≤ budget
    val naive = docs.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, q, _) =>
        (-math.min(math.floor(math.max(math.min(q, 1.0), 0.0) * 50), 49), id)
      }
      .scanLeft((0L, 0L)) { case ((_, acc), (id, _, n)) => (id, acc + n) }
      .drop(1).takeWhile(_._2 <= budget).map(_._1).toSet
    assert(got === naive)
    // a budget larger than the corpus keeps everything
    assert(graft.operators.Mixing.selectByQualityBudget(
      docs, "doc_id", col("q"), col("n"), 1000000L).count() === 300L)
    // zero budget keeps nothing
    assert(graft.operators.Mixing.selectByQualityBudget(
      docs, "doc_id", col("q"), col("n"), 0L).count() === 0L)
  }

  test("native word_ngrams kernel is bit-identical to the declarative fold") {
    val edge = Seq(
      (100L, "  leading and trailing  "), // empty tokens from split(\" +\")
      (101L, ""), (102L, "one"), (103L, "one two"),
      (104L, "a b a b a b"), // dedup + order
      (105L, "汉字 字汉 汉字 test")) // non-ASCII
      .toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .unionAll(edge)
    for (n <- Seq(1, 2, 3)) {
      val fast = Decontam.docNgrams(docs, "doc_id", "text", n)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val slow = Decontam.docNgramsFold(docs, "doc_id", "text", n)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(fast.toSeq === slow.toSeq, s"n=$n (order-sensitive compare)")
    }
  }

  test("native text kernels ≡ HOF twins on randomized inputs (property)") {
    // fixed-seed fuzz over whitespace runs, empty tokens, CJK, combining
    // marks, and astral code points (surrogate pairs) — the places a
    // hand-rolled tokenizer/code-point walk could diverge from the
    // regex-based declarative twins
    val rng = new scala.util.Random(20260813L)
    val alphabet = Vector("the", "la", "und", "汉", "字", "汉字", "x", "yz",
      "a-b", "😀", "ü", "que", "", " ", "est")
    def randomText(): String =
      List.fill(rng.nextInt(30))(alphabet(rng.nextInt(alphabet.size)))
        .mkString(" ")
    val df = (1 to 300).map(i => (i.toLong, randomText()))
      .toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val fast = Decontam.docNgrams(df, "doc_id", "text", n)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val slow = Decontam.docNgramsFold(df, "doc_id", "text", n)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(fast.toSeq === slow.toSeq, s"word_ngrams n=$n diverged")
    }
    val cmp = df.select(
      TextAnalysis.stopwordCount($"text").as("a"),
      TextAnalysis.stopwordCountFold($"text").as("b"),
      TextAnalysis.langId($"text").as("c"),
      TextAnalysis.langIdFold($"text").as("d"))
    assert(cmp.filter($"a" =!= $"b").count() === 0, "lexicon_hits diverged")
    assert(cmp.filter($"c" =!= $"d").count() === 0, "langId diverged")
  }

  test("native lexicon_hits / han_count are bit-identical to the HOF forms") {
    val edge = Seq(
      (900L, ""), (901L, "   "), (902L, "the the THE tHe the"),
      (903L, " der  die das "), (904L, "汉字 mixed the 汉 text 字"),
      (905L, "el la que de y una es"), (906L, "no stop words here"))
      .toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .unionAll(edge)
    val cmp = docs.select(
      TextAnalysis.stopwordCount($"text").as("sw_fast"),
      TextAnalysis.stopwordCountFold($"text").as("sw_slow"),
      TextAnalysis.langId($"text").as("lang_fast"),
      TextAnalysis.langIdFold($"text").as("lang_slow"))
    assert(cmp.filter($"sw_fast" =!= $"sw_slow").count() === 0)
    assert(cmp.filter($"lang_fast" =!= $"lang_slow").count() === 0)
    // sanity: the planted rows classify as expected
    val langs = edge.select($"doc_id", TextAnalysis.langId($"text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(900L) === "und" && langs(902L) === "en" &&
      langs(903L) === "de" && langs(904L) === "zh" && langs(905L) === "es")
  }

  // -- tf-idf --------------------------------------------------------------

  test("tfidfTopTerms ranks a doc-unique term above corpus-wide terms") {
    val df = Seq(
      (1L, "common common common unicorn"),
      (2L, "common words only here"),
      (3L, "common words again and again")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: "common" (tf=3, df=3) and "unicorn" (tf=1, df=1) tie at 1e6 —
    // term-text tiebreak ranks "common" first, so check the top-2 SET
    val top2 = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .filter($"doc_id" === 1L).select("term").as[String].collect().toSet
    assert(top2 === Set("common", "unicorn"))
    assert(top(2L) === "here" || top(2L) === "only") // df=1 terms outrank "words"
  }

  test("tfidf score is the documented integer division") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSet
    // a: tf=2 df=1 → 2e6; b in doc1: tf=1 df=2 → 500000; c: tf=1 df=1 → 1e6
    assert(rows.contains((1L, "a", 2000000L)))
    assert(rows.contains((1L, "b", 500000L)))
    assert(rows.contains((2L, "c", 1000000L)))
  }

  // -- deterministic split -------------------------------------------------

  test("splitAssign covers every row, is stable, and hits the weights") {
    val df = (0L until 5000L).toDF("id")
    val counts = Mixing.splitAssign(df, "id",
        Seq("train" -> 8L, "val" -> 1L, "test" -> 1L))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 5000L)
    assert(math.abs(counts("train") - 4000L) < 200, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 500L) < 100)
    assert(math.abs(counts("test") - 500L) < 100)
    // stability: the same doc gets the same split in a bigger corpus
    val a = Mixing.splitAssign(df.filter($"id" < 100), "id", Seq("a" -> 1L, "b" -> 1L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Mixing.splitAssign(df, "id", Seq("a" -> 1L, "b" -> 1L))
      .filter($"id" < 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  // -- profiling -----------------------------------------------------------

  test("temperatureMix draws ⌊scale·n^α⌋ per group and flattens the tail") {
    import org.apache.spark.sql.DataFrame
    // group sizes 400 / 100 / 25 → 16:4:1 natural ratio
    val rows = (0L until 400L).map(i => (i, "big")) ++
      (400L until 500L).map(i => (i, "mid")) ++
      (500L until 525L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "source")
    def kept(alpha: Double): Map[String, Long] =
      Mixing.temperatureMix(df, "doc_id", "source", alpha, scale = 1.0)
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // α=0.5: √400=20, √100=10, √25=5 → 4:2:1 (flattened from 16:4:1)
    assert(kept(0.5) === Map("big" -> 20L, "mid" -> 10L, "small" -> 5L))
    // α=1: natural proportions back
    assert(kept(1.0) === Map("big" -> 400L, "mid" -> 100L, "small" -> 25L))
    // deterministic: the same ROWS, not just the same counts
    def ids(d: DataFrame) = d.select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(Mixing.temperatureMix(df, "doc_id", "source", 0.5, 1.0))
    val b = ids(Mixing.temperatureMix(df, "doc_id", "source", 0.5, 1.0))
    assert(a === b && a.size === 35)
    // budget solver: lands within [target, target + #groups) and the mix
    // at that scale draws exactly the solver's own prediction
    val target = 40L
    val scale = Mixing.temperatureScaleForBudget(df, "source", 0.5, target)
    val drawn = Mixing.temperatureMix(df, "doc_id", "source", 0.5, scale).count()
    assert(drawn >= target && drawn < target + 3, s"drawn=$drawn")
  }

  test("profileNumeric counts nulls, exact distincts, and ranges in one pass") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.5), (2L, null), (2L, 2.5), (null, 2.5))
      .toDF("k", "v")
    val prof = Profiling.profileNumeric(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(prof("k") === ((4L, 1L, 2L, 1.0, 2.0)))
    assert(prof("v") === ((4L, 1L, 2L, 1.5, 2.5)))
  }

  // -- near-dedup canonicalization -----------------------------------------

  test("dropNearDups keeps one representative per cluster, singletons pass") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf0001)
    val survivors = Dedup.dropNearDups(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    val clusters = Dedup.dupClusters(
        Dedup.allPairsJaccard(docs, "doc_id", "text", threshold = 0.8))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(clusters.nonEmpty, "fixture has planted near-dups")
    // every cluster's min id survives, every other member is gone
    clusters.foreach { case (id, cluster) =>
      if (id == cluster) assert(survivors.contains(id), s"rep $id dropped")
      else assert(!survivors.contains(id), s"loser $id kept")
    }
    // docs in no cluster survive
    val inClusters = clusters.map(_._1).toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert((all -- inClusters).forall(survivors.contains))
  }

  test("dropNearDupsKeepBest keeps the highest-quality cluster member") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf0001)
      .withColumn("quality", col("n_chars").cast("double"))
    val survivors = Dedup.dropNearDupsKeepBest(docs, "doc_id", "text",
        col("quality"), threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    val members = Dedup.dupClusters(
        Dedup.allPairsJaccard(docs, "doc_id", "text", threshold = 0.8))
      .join(docs.select(col("doc_id").as("id"), col("quality")), Seq("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(members.nonEmpty, "fixture has planted near-dups")
    // per cluster: exactly the (quality, id)-max member survives
    members.groupBy(_._2).foreach { case (cluster, grp) =>
      val best = grp.maxBy(m => (m._3, m._1))._1
      grp.foreach { case (id, _, _) =>
        if (id == best) assert(survivors.contains(id), s"best $id of $cluster dropped")
        else assert(!survivors.contains(id), s"non-best $id of $cluster kept")
      }
    }
    // docs in no cluster survive untouched
    val inClusters = members.map(_._1).toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert((all -- inClusters).forall(survivors.contains))
  }

  test("bloom sketch roundtrip + OR-merge covers the union of key sets") {
    import graft.operators.BloomJoin
    val bits = 1L << 14
    val dayA = (0L until 500L).toDF("k")
    val dayB = (500L until 1000L).toDF("k")
    val bA = BloomJoin.buildBloom(dayA, "k", 1000L, bits)
    val bB = BloomJoin.buildBloom(dayB, "k", 1000L, bits)
    // roundtrip through disk
    val p = java.nio.file.Files.createTempFile("bloom", ".bin").toString
    BloomJoin.saveBloom(bA, p)
    assert(BloomJoin.loadBloom(p).toSeq === bA.toSeq)
    // merged filter has no false negatives over EITHER day's keys
    val merged = BloomJoin.mergeBlooms(bA, bB)
    val all = (0L until 1000L).toDF("k")
    val misses = all.filter(!BloomJoin.mightContain(merged, col("k"))).count()
    assert(misses === 0L, "merged bloom must contain every inserted key")
    // and still filters: far-away keys mostly miss
    val far = (1000000L until 1001000L).toDF("k")
    val fp = far.filter(BloomJoin.mightContain(merged, col("k"))).count()
    assert(fp < 100, s"false-positive rate unexpectedly high: $fp/1000")
  }

  // -- group centroids -----------------------------------------------------

  test("groupCentroids computes exact per-position means") {
    import graft.operators.Ann
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 6.0f)),
      (1, Array(-1.0f, 0.5f)))
      .toDF("label", "embedding")
    val got = Ann.groupCentroids(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got((0, 0)) === ((2L, 2.0)) && got((0, 1)) === ((2L, 4.0)))
    assert(got((1, 0)) === ((1L, -1.0)) && got((1, 1)) === ((1L, 0.5)))
  }

  // -- bloom-staged incremental dedup --------------------------------------

  test("bloomPrunedAntiJoin equals the plain anti-join (fixture + planted dup)") {
    import graft.operators.BloomJoin
    val docs = Tables.documents(spark, sf0001)
      .withColumn("fp", graft.operators.TextAnalysis.fingerprint($"text"))
    val seen = docs.filter(pmod($"doc_id", lit(2L)) === 0).select($"fp".as("seen_fp"))
    val fresh = docs.filter(pmod($"doc_id", lit(2L)) === 1)
    val staged = BloomJoin.bloomPrunedAntiJoin(fresh, seen, "fp", "seen_fp",
      expectedItems = 10000L, numBits = 1L << 18)
      .select("doc_id").as[Long].collect().toSet
    val plain = fresh.join(seen, fresh("fp") === col("seen_fp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(staged === plain)
    // planted: a new doc duplicating seen content (modulo normalization)
    // is dropped, a genuinely new one kept
    val seenDocs = Seq((0L, "the quick brown fox")).toDF("doc_id", "text")
      .withColumn("fp", graft.operators.TextAnalysis.fingerprint($"text"))
    val drop = Seq((1L, "  The  quick   brown fox "), (3L, "something new"))
      .toDF("doc_id", "text")
      .withColumn("fp", graft.operators.TextAnalysis.fingerprint($"text"))
    val kept = BloomJoin.bloomPrunedAntiJoin(drop,
        seenDocs.select($"fp".as("seen_fp")), "fp", "seen_fp",
        expectedItems = 100L, numBits = 1L << 12)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L))
    // EMPTY build side: bloom_filter_agg over zero rows is NULL and a null
    // mightContain predicate drops every row from BOTH branches — the
    // guarded paths must return fact unchanged (anti) / nothing (semi)
    val emptySeen = seenDocs.filter(lit(false)).select($"fp".as("seen_fp"))
    val keptEmpty = BloomJoin.bloomPrunedAntiJoin(drop, emptySeen,
        "fp", "seen_fp", expectedItems = 100L, numBits = 1L << 12)
      .select("doc_id").as[Long].collect().toSet
    assert(keptEmpty === Set(1L, 3L),
      "empty seen-set must exclude nothing from the anti-join")
    assert(BloomJoin.bloomSemiJoin(drop, emptySeen, "fp", "seen_fp",
      100L, 1L << 12).count() === 0L)
  }

  // -- int8 quantization ---------------------------------------------------

  test("int8 quantization: bounded error, zero-vector guard, exact checksum") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("scale", VectorOps.maxAbs($"embedding") / lit(127.0))
      .withColumn("q", VectorOps.int8Quantize($"embedding", $"scale"))
      .withColumn("err", VectorOps.dequantSqError($"embedding", $"q", $"scale"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getSeq[Int](3), r.getDouble(4))).toMap
    assert(rows(1L)._1 === Seq(127, -63, 32, 0)) // -0.5/scale+0.5 = -63.0 floor
    // per-element error ≤ (scale/2)² each → total ≤ 4·(scale/2)²
    val scale = 1.0 / 127.0
    assert(rows(1L)._2 <= 4 * (scale / 2) * (scale / 2) + 1e-12)
    assert(rows(2L)._1 === Seq(0, 0, 0, 0) && rows(2L)._2 === 0.0)
    // quantized values all within int8 range on the real fixture
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("scale", VectorOps.maxAbs($"embedding") / lit(127.0))
      .withColumn("q", VectorOps.int8Quantize($"embedding", $"scale"))
    val bad = emb.select(explode($"q").as("qi"))
      .filter($"qi" > 127 || $"qi" < -128).count()
    assert(bad === 0L)
  }

  test("DSIR importance selection ranks target-vocab docs first, deterministically") {
    import graft.operators.Dsir
    // disjoint vocabularies: target speaks alpha-words, the pool mixes
    val target = Seq((100L, "alpha beta gamma delta"),
      (101L, "alpha alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma"), // pure target vocab
      (2L, "zeta eta theta iota"), // pure off-target vocab
      (3L, "alpha beta zeta eta"), // mixed
      (4L, "")) // empty → score 0
      .toDF("doc_id", "text")
    val w = Dsir.featureWeights(target, raw, "doc_id", "text", buckets = 64)
    assert(w.count() === 64L) // every bucket has a weight (smoothing)
    val scores = Dsir.importanceScores(raw, "doc_id", "text", w, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores.size === 4 && scores(4L) === 0L) // empty doc present, 0
    assert(scores(1L) > scores(3L) && scores(3L) > scores(2L))
    // doc 3's two off-target tokens outweigh its two target ones (raw
    // frequencies dwarf target frequencies here), so its net score is
    // negative and the zero-scored empty doc outranks it
    assert(scores(3L) < 0L)
    val top = Dsir.selectTopK(
      Dsir.importanceScores(raw, "doc_id", "text", w, buckets = 64),
      "doc_id", k = 2).collect().map(_.getLong(0))
    assert(top.toSeq === Seq(1L, 4L))
    // determinism: identical on re-run
    val again = Dsir.select(raw, target, "doc_id", "text", k = 2, buckets = 64)
      .collect().map(_.getLong(0))
    assert(again.toSeq === top.toSeq)
  }
}
