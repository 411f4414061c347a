package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Result row of the JIT brute-force kernel. Top-level and public:
  * whole-stage codegen instantiates it reflectively from generated code,
  * so a class nested in `object Ann` (or with private accessors) throws
  * CompileException and silently degrades every task to the interpreted
  * fallback path. */
case class ScoredNeighbor(query_id: Long, neighbor_id: Long, cosine: Double)

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star similarity ops; no counterpart in the reference).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k. The probe set is broadcast
  *    (small by construction), the corpus side streams: one scan + one
  *    shuffle of only the per-partition top-k survivors (window over
  *    query_id after a broadcast join). Correctness baseline at any scale
  *    where "scan everything once" is acceptable.
  *  - [[lshTopK]] — random-hyperplane LSH: corpus and probes are bucketed by
  *    a b-bit sign signature; only same-bucket (or Hamming<=r neighboring
  *    bucket) pairs are scored. Scan-heavy → bucket-join, the 100 TB path;
  *    recall traded via (numPlanes, probeRadius).
  */
object Ann {

  /** Exact cosine top-k: for every probe row (small DataFrame, broadcast),
    * the k nearest corpus rows. Output: (query_id, neighbor_id, cosine). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("pvec"))
    val scored = c.join(broadcast(p), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("pvec"), col("cvec")).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k).drop("rank")
  }

  /** [[bruteForceTopK]], JIT-kernel form: broadcast probe matrix, primitive
    * float-array dot/norm loops inside `mapPartitions`, and a bounded
    * per-(partition, query) top-k heap so the shuffle carries at most
    * partitions × probes × k rows instead of corpus × probes. Interpreted
    * Catalyst higher-order folds cost ~100× a JIT'd while-loop on dense
    * numeric kernels — this is the one place `mapPartitions` beats
    * expressions (SURVEY §7.3 "last resort" clause, used deliberately).
    *
    * Accumulation order (index 0..d-1, double precision) matches the
    * left-fold of [[VectorOps.dot]] exactly → results are bit-identical to
    * the expression form and the DuckDB oracle. */
  def bruteForceTopKFast(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val probeArr: Array[(Long, Array[Float])] = probes
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])].collect()
    val bc = spark.sparkContext.broadcast(probeArr)
    val partial = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val ps = bc.value
        // per-query bounded min-heaps (ordered worst-first for eviction)
        val heaps = scala.collection.mutable.Map.empty[Long,
          scala.collection.mutable.PriorityQueue[ScoredNeighbor]]
        // (-cosine, nid) natural order: greater tuple = lower cosine or
        // larger id = WORSE; PQ dequeues its max, so head is the worst kept
        implicit val worstFirst: Ordering[ScoredNeighbor] =
          Ordering.by[ScoredNeighbor, (Double, Long)](s => (-s.cosine, s.neighbor_id))
        it.foreach { case (nid, v) =>
          var pi = 0
          while (pi < ps.length) {
            val (qid, p) = ps(pi)
            if (qid != nid) {
              var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
              while (i < v.length) {
                val x = p(i).toDouble; val y = v(i).toDouble
                dot += x * y; na += x * x; nb += y * y; i += 1
              }
              val denom = math.sqrt(na) * math.sqrt(nb)
              val c = if (denom > 0) dot / denom else 0.0
              val h = heaps.getOrElseUpdate(qid,
                new scala.collection.mutable.PriorityQueue[ScoredNeighbor]()(worstFirst))
              if (h.size < k) h.enqueue(ScoredNeighbor(qid, nid, c))
              else if (worstFirst.lt(ScoredNeighbor(qid, nid, c), h.head)) {
                // new candidate sorts BETTER than current worst (ordering is
                // worst-first): replace
                h.dequeue(); h.enqueue(ScoredNeighbor(qid, nid, c))
              }
            }
            pi += 1
          }
        }
        heaps.valuesIterator.flatMap(_.iterator)
      }
    partial.toDF()
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k).drop("rank")
  }

  /** Multi-table LSH approximate top-k (OR-amplification): `numTables`
    * independent sign-hash tables of `bitsPerTable` hyperplanes each; a
    * corpus row is a candidate for a probe if they share a bucket in ANY
    * table, optionally also within Hamming radius 1 of the probe's bucket.
    *
    * Single-table sign-LSH collapses on near-orthogonal data (p_bit ≈ 0.6 ⇒
    * p_bucket ≈ 0.6^b); OR-ing L tables lifts recall to 1−(1−p)^L while the
    * per-table bucket-join stays O(candidates), never O(N²).
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, bitsPerTable: Int = 8, numTables: Int = 8,
      probeRadius: Int = 1, dim: Int = 64, seed: Long = 42L): DataFrame = {
    require(probeRadius <= 1, "radius 0 or 1")
    // one bucket id per (table, bucket): table index in the high bits
    def buckets(v: Column, forProbe: Boolean): Column = {
      val all = (0 until numTables).flatMap { t =>
        val planes = VectorOps.randomPlanes(bitsPerTable, dim, seed + t)
        val sig = VectorOps.hyperplaneSignature(v, planes)
        val base = lit(t.toLong << 32) + sig
        if (forProbe && probeRadius == 1)
          base +: (0 until bitsPerTable).map(i =>
            lit(t.toLong << 32) + sig.bitwiseXOR(lit(1L << i)))
        else Seq(base)
      }
      array(all: _*)
    }
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      explode(buckets(col(vecCol), forProbe = false)).as("bucket"))
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("pvec"),
      explode(buckets(col(vecCol), forProbe = true)).as("bucket"))
    val scored = c.join(broadcast(p), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("pvec"), col("cvec"))
      .distinct() // dedupe candidates across tables BEFORE scoring
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("pvec"), col("cvec")).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k).drop("rank")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, multi-table
    * sign-LSH candidates (OR-amplification, same rationale as [[lshTopK]])
    * verified exactly — the scalable analogue of text MinHash dedup for
    * embedding space. Bucket-collect shape: one evaluation of the signature
    * subtree, in-bucket pair enumeration, candidates deduped before the
    * exact cosine verify. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bitsPerTable: Int = 6, numTables: Int = 16,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val sigs = (0 until numTables).map { t =>
      val planes = VectorOps.randomPlanes(bitsPerTable, dim, seed + t)
      lit(t.toLong << 32) + VectorOps.hyperplaneSignature(col(vecCol), planes)
    }
    val pairs = df
      .select(col(idCol), explode(array(sigs: _*)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vecs = df.select(col(idCol), col(vecCol))
    val verified = pairs
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        VectorOps.cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager verify → release the candidate cache immediately (no cache creep
    // in long pipelines); callers own the returned (small) result's lifetime
    verified.count()
    pairs.unpersist(blocking = false)
    verified
  }

  /** Oracle twin: exact all-pairs cosine >= threshold (O(N²), small data). */
  def allPairsCosine(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorOps.cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
