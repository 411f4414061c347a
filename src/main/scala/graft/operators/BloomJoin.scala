package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join: prune a huge fact table against a build-side key
  * set that is too large to broadcast exactly but whose Bloom sketch fits in
  * a few MB.
  *
  * This is the manual form of Spark's own runtime-filter machinery
  * (`InjectRuntimeFilter`): the build side tree-aggregates its hashed keys
  * into one `BloomFilter` (a few MB driver object), which ships to every
  * fact task as a literal and is probed by the native, codegen'd
  * `might_contain` — no shuffle of the fact, no join until the fact is
  * already pruned to (matching ∪ ε·non-matching) rows. At 100 TB this turns
  * "shuffle the whole fact to semi-join it" into "scan + local filter, then
  * shuffle only survivors"; with a 1% FPP the follow-up exact semi-join
  * moves ~1% of the dead rows instead of all of them.
  *
  * Why not rely on `InjectRuntimeFilter`? The optimizer only injects blooms
  * under a joinable shape it recognizes, with size thresholds tuned for
  * generic workloads; a curation pipeline that *knows* "this 50 M-key
  * dedup-survivor list prunes 99% of the corpus" wants the filter
  * unconditionally, and reusable across several downstream joins.
  */
object BloomJoin {

  /** Aggregate `build`'s `key` column into a serialized Bloom filter
    * (xxhash64'd, like Spark's runtime filters). Distributed partial
    * aggregation; only the merged sketch (`numBits/8` bytes) reaches the
    * driver. Returns NULL when `build` is empty (`bloom_filter_agg` over
    * zero rows) — callers must treat that as "empty key set", because
    * `mightContain(null, …)` is null and a null predicate silently drops
    * EVERY row from BOTH branches of a pruned join (found by the q183
    * first-drop fold: an empty seen-index ate the whole batch). */
  def buildBloom(build: DataFrame, key: String, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    val hashed = new XxHash64(Seq(ColumnShim.expression(build(key))))
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    build.select(ColumnShim.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Persist a built Bloom sketch (e.g. the seen-corpus key set) so the
    * next incremental run loads it instead of rescanning history — the
    * operational loop of [[bloomPrunedAntiJoin]]: day N writes its merged
    * sketch, day N+1 probes against it and unions in the day's new keys
    * (Bloom OR-merge = byte-wise OR of equal-sized filters, which
    * [[mergeBlooms]] provides). */
  def saveBloom(bloom: Array[Byte], path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bloom): Unit

  def loadBloom(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))

  /** OR-merge two serialized Bloom filters built with the SAME
    * (expectedItems, numBits) parameters. Spark's sketch layout is a
    * versioned header + bit array; equal parameters give equal layouts, so
    * the merged filter is the byte-wise OR with the header kept verbatim
    * (asserted identical). The result answers `mightContain` for the UNION
    * of both key sets — how daily sketches roll up without rescans. */
  def mergeBlooms(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"bloom layouts differ (${a.length} vs ${b.length} bytes); " +
        "filters must be built with identical parameters")
    // Spark BloomFilterImpl header: version int + numHashFunctions int +
    // bit-array word count int (12 bytes) — must match exactly
    val header = 12
    require(a.take(header).sameElements(b.take(header)),
      "bloom headers differ; filters must be built with identical parameters")
    val out = new Array[Byte](a.length)
    System.arraycopy(a, 0, out, 0, header)
    var i = header
    while (i < a.length) { out(i) = (a(i) | b(i)).toByte; i += 1 }
    out
  }

  /** Codegen'd `might_contain(bloom, xxhash64(col))` predicate. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnShim.expression(c)))))

  /** Approximate semi-join: rows of `fact` whose `factKey` might be in
    * `build`'s `buildKey` set. No false negatives; ≤ `fpp`-rate false
    * positives. One aggregation over `build`, one scan of `fact`. */
  def bloomSemiJoin(fact: DataFrame, build: DataFrame, factKey: String,
      buildKey: String, expectedItems: Long, numBits: Long): DataFrame = {
    val bloom = buildBloom(build, buildKey, expectedItems, numBits)
    if (bloom == null) fact.limit(0) // empty build ⇒ nothing matches
    else fact.filter(mightContain(bloom, fact(factKey)))
  }

  /** Exact semi-join with Bloom pre-pruning: the bloom eliminates the bulk
    * of non-matching fact rows before the (now small) exact semi-join
    * shuffles the survivors. Same result as `fact.join(build, semi)`. */
  def bloomPrunedSemiJoin(fact: DataFrame, build: DataFrame, factKey: String,
      buildKey: String, expectedItems: Long, numBits: Long): DataFrame = {
    val pruned = bloomSemiJoin(fact, build, factKey, buildKey, expectedItems, numBits)
    pruned.join(build.select(col(buildKey)).distinct(),
      pruned(factKey) === col(buildKey), "left_semi")
  }

  /** Exact ANTI-join with Bloom staging — incremental corpus dedup's core:
    * "which rows of `fact` are NOT in `build`". A Bloom has no false
    * negatives, so a miss is PROOF of absence: miss-rows pass straight
    * through with no join at all, and only the maybe-rows (true matches +
    * ε·false positives) go through the exact anti-join. Same result as
    * `fact.join(build, anti)`.
    *
    * Scale trade, explicit: this scans `fact` twice (once per branch; both
    * filters sit in the scan stage) but shuffles only the maybe-subset —
    * vs. the plain anti-join's ONE scan + full-fact shuffle. For the
    * corpus-refresh shape (new drop mostly-new, seen-set large but
    * sketchable) the maybe-side is the small side and two cheap scans beat
    * one full shuffle; if `fact` is expensive to produce, persist it first.
    */
  def bloomPrunedAntiJoin(fact: DataFrame, build: DataFrame, factKey: String,
      buildKey: String, expectedItems: Long, numBits: Long): DataFrame = {
    val bloom = buildBloom(build, buildKey, expectedItems, numBits)
    if (bloom == null) return fact // empty build ⇒ nothing to exclude
    val definitelyNew = fact.filter(!mightContain(bloom, fact(factKey)))
    val maybe = fact.filter(mightContain(bloom, fact(factKey)))
    val checked = maybe.join(build.select(col(buildKey)).distinct(),
      maybe(factKey) === col(buildKey), "left_anti")
    definitelyNew.unionAll(checked)
  }
}
