package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-to-corpus overlap estimation — "how much of source A is also in
  * source B?" asked across every pair of sources at once. The question a
  * curation team asks before mixing corpora (double-counted shingles
  * inflate a mixture's effective epochs) and the corpus-level complement
  * of the per-document dedup family in [[Dedup]].
  *
  * Exact answer: pairwise Jaccard of the sources' distinct-shingle sets.
  * The exact path shuffles every distinct shingle hash once (vocab-keyed)
  * and self-joins — correct, and fine when you already need the distinct
  * sweep; but across S sources it is S·vocab work. The scale path is the
  * K-MINIMUM-VALUES sketch (Beyer et al., SIGMOD 2007, "On synopses for
  * distinct-value estimation under multiset operations"): keep each
  * source's k smallest distinct shingle hashes; for a pair (A, B) the k
  * smallest of K_A ∪ K_B are a uniform coordinated sample of A ∪ B, so
  * `|{h ∈ bottom-k(K_A ∪ K_B) : h ∈ K_A ∧ h ∈ K_B}| / k` estimates
  * J(A, B) with RMSE ≈ √(J(1−J)/k). All S·(S−1)/2 pair estimates come
  * from S·k sketch rows — no cross-source shuffle of the corpus at all.
  *
  * Everything is deterministic: the shingle hash is the engine's
  * cross-engine polynomial fold ([[graft.functions.StringFoldHash]],
  * `(acc·31 + codepoint) mod 1e9+7`), so sketches, union ranks, and both
  * the exact AND the estimated Jaccard hash-match a foreign oracle
  * bit-for-bit — the estimate itself is gateable, not just bound-checked.
  */
object CorpusOverlap {

  /** Default sketch size: RMSE ≈ 0.044 at J=0.25. */
  val K = 128

  /** Cross-engine polynomial fold hash of a string column (no
    * normalization — shingles are hashed as produced). */
  def foldHash(s: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.StringFoldHash(ColumnShim.expression(s)))
  }

  /** Distinct `(source, h)` shingle hashes — the vocab-keyed base both
    * paths read. One explode + one distinct (partial-aggregated map-side;
    * the shuffle is the distinct sweep, ∝ corpus shingle vocabulary). */
  def shingleHashes(docs: DataFrame, sourceCol: String, textCol: String,
      n: Int = 3): DataFrame =
    docs.select(col(sourceCol).as("source"),
        explode(Dedup.shingles(col(textCol), n)).as("s"))
      .select(col("source"), foldHash(col("s")).as("h"))
      .distinct()

  /** Per-source bottom-k sketch `(source, h)` — skew-safe two-phase
    * top-N (a hot source never pins one reducer). */
  def kmvSketch(hashes: DataFrame, k: Int = K): DataFrame =
    Skew.topNPerKey(hashes, Seq("source"), Seq(col("h").asc), n = k)
      .drop("rank")

  /** Merge per-drop KMV sketches into the maintained per-source sketch:
    * bottom-k of the union of bottom-k's — the KMV mergeability property
    * (bottom-k(A ∪ B) ⊆ bottom-k(bottom-k(A) ∪ bottom-k(B))), so a new
    * crawl drop folds into the sketch table WITHOUT rescanning the
    * corpus: sketch the drop alone, union, re-rank. State is S·k rows
    * forever; OverlapSpec pins merged ≡ rebuilt-from-scratch. */
  def mergeSketches(sketches: Seq[DataFrame], k: Int = K): DataFrame = {
    require(sketches.nonEmpty, "nothing to merge")
    val w = Window.partitionBy(col("source")).orderBy(col("h"))
    sketches.reduce(_ unionAll _)
      .select(col("source"), col("h")).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= lit(k)).drop("__rn")
  }

  /** `foreachBatch` body: fold one micro-batch of documents into the
    * parquet sketch table at `statePath` — the streaming-ingest form of
    * [[mergeSketches]], so corpus-overlap estimates stay current as
    * crawl drops land, at S·k rows of state forever. The merged sketch
    * is collected before the overwrite (bounded by S·k BY DESIGN — this
    * is the rare collect that is provably small), which also breaks the
    * read-then-overwrite lineage hazard on `statePath`. */
  def foldSketchToParquet(batch: DataFrame, sourceCol: String,
      textCol: String, statePath: String, k: Int = K): Unit = {
    val spark = batch.sparkSession
    val drop = kmvSketch(shingleHashes(batch, sourceCol, textCol), k)
    val hasState = try {
      spark.read.parquet(statePath).schema.nonEmpty
    } catch { case _: Throwable => false }
    val merged =
      if (hasState) mergeSketches(Seq(spark.read.parquet(statePath), drop), k)
      else drop
    val rows = merged.select(col("source"), col("h")).collect().toIndexedSeq
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, merged.schema)
      .write.mode("overwrite").parquet(statePath)
  }

  /** All-pairs overlap report from the distinct-hash base: exact Jaccard
    * AND the KMV estimate, per unordered source pair. The sketch algebra
    * after [[kmvSketch]] touches only S·k rows (every window/aggregate
    * group is ≤ 2k rows — bounded by construction). */
  def pairwiseOverlap(hashes: DataFrame, k: Int = K): DataFrame = {
    val sizes = hashes.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = sizes.select(col("source").as("sa"), col("n").as("n_a"))
      .join(sizes.select(col("source").as("sb"), col("n").as("n_b")),
        col("sa") < col("sb"))
    val inter = hashes.select(col("source").as("ia"), col("h"))
      .join(hashes.select(col("source").as("ib"), col("h")),
        Seq("h")).filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("n_inter"))

    val sk = broadcast(kmvSketch(hashes, k))
    val tagged = pairs.select(col("sa"), col("sb"))
      .join(sk.withColumnRenamed("source", "sa"), Seq("sa"))
      .select(col("sa"), col("sb"), col("h"), lit(1).as("ina"), lit(0).as("inb"))
      .unionAll(pairs.select(col("sa"), col("sb"))
        .join(sk.withColumnRenamed("source", "sb"), Seq("sb"))
        .select(col("sa"), col("sb"), col("h"), lit(0).as("ina"), lit(1).as("inb")))
    val union = tagged.groupBy(col("sa"), col("sb"), col("h"))
      .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
    val w = Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))
    val est = union.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= lit(k))
      .groupBy(col("sa"), col("sb"))
      .agg((sum(col("ina") * col("inb")).cast("double") /
        least(lit(k.toLong), count(lit(1))).cast("double")).as("jaccard_kmv"))

    pairs
      .join(inter, col("sa") === col("ia") && col("sb") === col("ib"), "left")
      .join(est, Seq("sa", "sb"))
      .select(col("sa"), col("sb"), col("n_a"), col("n_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        (coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L)))
            .cast("double")).as("jaccard_exact"),
        col("jaccard_kmv"))
      .orderBy(col("sa"), col("sb"))
  }

  /** NOVELTY CURVE by deterministic training shard — how fast the corpus
    * saturates: for each shard of [[Mixing.assignShards]]' seeded-hash
    * partitioning, how many distinct shingles appear there FIRST (in no
    * earlier shard), plus the shard's total distinct-shingle footprint.
    * A flat `n_first` tail means later shards add vocabulary; a
    * collapsing tail means the corpus is saturated and more data buys
    * repetition, not coverage — the data-mixing diagnostic behind
    * "should this source get more epochs or more documents".
    *
    * One aggregate computes the whole curve: gram → min(shard) (map-side
    * combine collapses each partition's grams before the exchange, so
    * the shuffle is ∝ the corpus's distinct-gram vocabulary — the honest
    * cost of an EXACT novelty curve; the KMV machinery above is the
    * sketched alternative when vocabulary itself is too big to sweep),
    * then ≤ nShards rows out. Deterministic end to end (seeded affine
    * shard hash + cross-engine fold hash) — bit-replayable by DuckDB. */
  def noveltyByShard(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, seed: Long = 0L, n: Int = 3): DataFrame = {
    val sharded = Mixing.assignShards(docs, idCol, nShards, seed)
    val grams = sharded.select(col("shard"),
        explode(Dedup.shingles(col(textCol), n)).as("s"))
      .select(col("shard"), foldHash(col("s")).as("h"))
    val firsts = grams.groupBy(col("h")).agg(min(col("shard")).as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("n_first"))
    val totals = grams.distinct()
      .groupBy(col("shard")).agg(count(lit(1)).as("n_distinct"))
    totals.join(firsts, Seq("shard"), "left")
      .select(col("shard"), col("n_distinct"),
        coalesce(col("n_first"), lit(0L)).as("n_first"))
      .orderBy(col("shard"))
  }
}
