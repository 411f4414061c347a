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
    *
    * Defaults are tuned on the 64-dim fixture (recall ≈ 0.98 at 6 bits ×
    * 16 tables × radius 1 vs 0.66 at the old 8×8; measured by
    * [[graft.tools.LshSweep]]). Expected bucket size is N/2^bits, so at
    * larger corpus sizes raise `bitsPerTable` (+1 bit per doubling keeps
    * candidate volume constant) and compensate recall with more tables.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, bitsPerTable: Int = 6, numTables: Int = 16,
      probeRadius: Int = 1, dim: Int = 64, seed: Long = 42L): DataFrame = {
    require(probeRadius <= 1, "radius 0 or 1")
    // Signatures are materialized as per-table COLUMNS before the bucket
    // array is built: a probe references each signature in 1 + bitsPerTable
    // XOR-variant entries, and Catalyst does not CSE across array elements —
    // inlining re-evaluated every signature per entry and (numTables ×
    // (1+bits) × bits dot loops) blew past janino's generated-method limit,
    // silently degrading the stage to interpreted. Column references keep
    // one HyperplaneSig evaluation per (row, table) and a small method
    // (CollapseProject leaves the sig Project alone: multi-use, non-cheap).
    val planesByTable = (0 until numTables)
      .map(t => VectorOps.randomPlanes(bitsPerTable, dim, seed + t))
    def withSigs(df: DataFrame, vc: String): DataFrame =
      planesByTable.zipWithIndex.foldLeft(df) { case (d, (planes, t)) =>
        d.withColumn(s"__sig$t", VectorOps.hyperplaneSignature(col(vc), planes))
      }
    // one bucket id per (table, bucket): table index in the high bits
    val corpusBuckets = (0 until numTables)
      .map(t => lit(t.toLong << 32) + col(s"__sig$t"))
    val probeBuckets = (0 until numTables).flatMap { t =>
      val base = lit(t.toLong << 32) + col(s"__sig$t")
      if (probeRadius == 1)
        base +: (0 until bitsPerTable).map(i =>
          lit(t.toLong << 32) + col(s"__sig$t").bitwiseXOR(lit(1L << i)))
      else Seq(base)
    }
    val c = withSigs(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("cvec")), "cvec")
      .select(col("neighbor_id"), col("cvec"),
        explode(array(corpusBuckets: _*)).as("bucket"))
    val p = withSigs(probes.select(col(idCol).as("query_id"),
        col(vecCol).as("pvec")), "pvec")
      .select(col("query_id"), col("pvec"),
        explode(array(probeBuckets: _*)).as("bucket"))
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

  /** IVF (inverted-file) approximate top-k — the clustered-data scale path
    * complementing [[lshTopK]] (sign-LSH is data-independent; IVF adapts to
    * the corpus distribution and is the standard ANN index shape for
    * real embedding corpora).
    *
    * Train: centroids seeded from the `numCentroids` lowest-id corpus
    * vectors (deterministic), refined by `lloydIters` distributed Lloyd
    * steps whose per-dimension sums go through exact decimals — so the
    * learned centroids are a pure function of the data, independent of
    * partitioning. Each step shuffles only (numCentroids × dim) partial
    * sums; the centroid matrix itself is a bounded driver object.
    *
    * Search: corpus rows get their nearest-centroid id from one fused
    * [[graft.functions.TopCentroids]] scan projection (the inverted lists
    * are just a hash partitioning by `cid`); probes explode their `nProbe`
    * nearest lists, the bucket join scores only corpus rows in probed lists
    * (expected fraction ≈ nProbe/numCentroids of the corpus), exact cosine
    * ranks survivors. Recall is high when the corpus is actually clustered
    * (PipelineSpec plants clusters); on uniform random vectors every
    * partition is equidistant and nProbe/numCentroids is the honest recall
    * expectation — same caveat the reference-free LSH path documents. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, numCentroids: Int = 64, nProbe: Int = 8,
      lloydIters: Int = 1): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    import graft.functions.TopCentroids

    def topCentroidsCol(flat: Array[Double], nP: Int): Column =
      ColumnShim.column(TopCentroids(
        ColumnShim.expression(col(vecCol)), flat, numCentroids, nP))

    val flat = lloydCentroids(corpus, idCol, vecCol, numCentroids,
      lloydIters).flatten.toArray
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      topCentroidsCol(flat, 1).getItem(0).as("cid"))
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("pvec"),
      explode(topCentroidsCol(flat, nProbe)).as("cid"))
    val scored = c.join(broadcast(p), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("pvec"), col("cvec")).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k).drop("rank")
  }

  /** [[ivfTopK]] with INT8-QUANTIZED candidate scoring — the IVF-PQ-
    * direction memory/bandwidth path: corpus and probe vectors are coded
    * once in the scan stage to per-vector-scaled int8 BINARY
    * ([[VectorOps.int8Code]] — one byte per component, a true 4× cut in
    * candidate row width vs float32; the quantization scales cancel in
    * the cosine so no scale column travels), candidates are scored with
    * the integer-dot [[VectorOps.int8Cosine]] kernel, and ranking happens
    * on the quantized score directly. Train/assign stages are unchanged
    * (full-precision Lloyd + [[graft.functions.TopCentroids]]). Quantized
    * cosine error on unit embeddings is ~1e-2, which reorders only
    * near-ties — q165 gates recall ≥ 0.75 against exact brute force, the
    * same floor as the full-precision q46. */
  def ivfTopKInt8(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, numCentroids: Int = 64, nProbe: Int = 8,
      lloydIters: Int = 1): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    import graft.functions.TopCentroids

    def topCentroidsCol(flat: Array[Double], nP: Int): Column =
      ColumnShim.column(TopCentroids(
        ColumnShim.expression(col(vecCol)), flat, numCentroids, nP))

    val flat = lloydCentroids(corpus, idCol, vecCol, numCentroids,
      lloydIters).flatten.toArray
    val c = corpus.select(col(idCol).as("neighbor_id"),
      VectorOps.int8Code(col(vecCol)).as("ccode"),
      topCentroidsCol(flat, 1).getItem(0).as("cid"))
    val p = probes.select(col(idCol).as("query_id"),
      VectorOps.int8Code(col(vecCol)).as("pcode"),
      explode(topCentroidsCol(flat, nProbe)).as("cid"))
    val scored = c.join(broadcast(p), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.int8Cosine(col("pcode"), col("ccode")).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k).drop("rank")
  }

  /** Write-side salt for the index corpus: rows are repartitioned on
    * (cid, hash(id) mod WriteSalt) before `partitionBy("cid")`, so each
    * inverted list is written by up to WriteSalt tasks instead of ONE.
    * A bare `repartition(col("cid"))` capped write parallelism at
    * numCentroids (64 tasks for a 100 TB corpus, with a hot-list
    * straggler and a >2 GiB-partition risk); the salt keeps the same
    * directory layout — pruning is untouched — while the write stage
    * runs at full cluster width. File count stays bounded at
    * ≤ numCentroids × WriteSalt. */
  private val WriteSalt = 8

  /** PERSISTED IVF index — the build-once / search-many production shape.
    * [[ivfTopK]] retrains and rescans the corpus per query batch; real
    * serving builds the index once and prunes at read time. Layout:
    *
    *   `path/centroids` — (cid, vec array<double>), numCentroids rows
    *   `path/corpus`    — (id, vec) PARTITIONED BY cid: each inverted
    *                      list is its own directory, so a search's cid
    *                      filter prunes at PLANNING time from the
    *                      listing (PartitionFilters — zero footers read
    *                      for unprobed lists; the same lever as the
    *                      hive-partition probe, here keyed by the
    *                      learned cluster id)
    *
    * `codec = "int8"` stores per-vector-scaled int8 codes
    * ([[VectorOps.int8Code]], column `code` BINARY) instead of the float
    * vectors — 4× narrower candidate bytes on the search read path (the
    * one place the measured exchange shrink becomes real I/O); search
    * detects the codec from the stored schema and scores with the
    * integer-dot [[VectorOps.int8Cosine]] kernel (same recall floor as
    * [[ivfTopKInt8]] — q165/q171 gate it). Default "float" keeps search
    * bit-identical to [[ivfTopK]].
    *
    * [[searchIvfIndex]] reads ≈ nProbe/numCentroids of the corpus bytes
    * and returns results IDENTICAL to [[ivfTopK]] with the same
    * centroids (AnnIndexSpec hash-asserts it): same TopCentroids
    * assignment, same cosine, same ranking. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, numCentroids: Int = 64, lloydIters: Int = 1,
      codec: String = "float"): Unit = {
    import org.apache.spark.sql.graftshim.ColumnShim
    import graft.functions.TopCentroids
    require(codec == "float" || codec == "int8", s"unknown codec $codec")
    requireIntegralId(corpus, idCol, "buildIvfIndex")
    val spark = corpus.sparkSession
    val centroids = lloydCentroids(corpus, idCol, vecCol, numCentroids,
      lloydIters)
    val flat = centroids.flatten.toArray
    import spark.implicits._
    centroids.zipWithIndex.toSeq.map { case (v, i) => (i, v.toSeq) }
      .toDF("cid", "vec")
      .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
    val assign = ColumnShim.column(TopCentroids(
      ColumnShim.expression(col(vecCol)), flat, numCentroids, 1)).getItem(0)
    val payload =
      if (codec == "int8") VectorOps.int8Code(col(vecCol)).as("code")
      else col(vecCol).as("vec")
    corpus.select(col(idCol).as("id"), payload, assign.as("cid"))
      .repartition(col("cid"),
        pmod(xxhash64(col("id")), lit(WriteSalt.toLong)))
      .write.partitionBy("cid").mode("overwrite").parquet(s"$path/corpus")
  }

  /** Append new vectors to an existing [[buildIvfIndex]] index WITHOUT
    * retraining: assign against the SAVED centroids and append files
    * inside the matching cid directories (the standard serving practice —
    * crawl drops land incrementally, centroid retraining is an offline
    * cadence decision). Search afterwards sees old∪new with the same
    * pruning. Drift caveat: appended mass shifts the true centroids, so
    * recall on the appendix degrades as its distribution diverges from
    * the training corpus — the caller's rebuild-cadence knob, same
    * contract as [[Dedup.segmentDedupIncremental]]'s index refresh. */
  def appendToIvfIndex(newVecs: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    import org.apache.spark.sql.graftshim.ColumnShim
    import graft.functions.TopCentroids
    requireIntegralId(newVecs, idCol, "appendToIvfIndex")
    val spark = newVecs.sparkSession
    val (flat, numCentroids, _) = loadCentroids(spark, path)
    // codec is a property of the existing index: appended rows must match
    val int8 = spark.read.parquet(s"$path/corpus")
      .schema.fieldNames.contains("code")
    val assign = ColumnShim.column(TopCentroids(
      ColumnShim.expression(col(vecCol)), flat, numCentroids, 1)).getItem(0)
    val payload =
      if (int8) VectorOps.int8Code(col(vecCol)).as("code")
      else col(vecCol).as("vec")
    newVecs.select(col(idCol).as("id"), payload, assign.as("cid"))
      .repartition(col("cid"),
        pmod(xxhash64(col("id")), lit(WriteSalt.toLong)))
      .write.partitionBy("cid").mode("append").parquet(s"$path/corpus")
  }

  /** Fail loudly when `idCol` is not integral: index ids are normalized
    * to long throughout (and [[autoTuneNProbe]] decodes with getLong), and
    * a silent cast would map string ids to NULL, which then vanish through
    * the `query_id =!= neighbor_id` filter — quietly empty results instead
    * of an error (round-7 ADVICE). */
  private def requireIntegralId(df: DataFrame, idCol: String,
      op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType)(dt),
      s"$op requires an integral id column ('$idCol' is ${dt.simpleString})" +
        ": non-integral ids would cast to NULL and silently vanish from " +
        "results — map your ids to long (e.g. xxhash64) first")
  }

  /** Delete documents from a persisted [[buildIvfIndex]] index — the
    * serving-store shed path (takedowns, recrawl replacement): rewrites
    * ONLY the inverted-list directories that contain deleted ids, each as
    * an anti-join of that list against the (broadcast) delete set — never
    * a full-index rebuild. The kept rows are materialized before the
    * write (the rewrite must not stream from the files it replaces), then
    * committed with Spark's dynamic partition overwrite so untouched
    * lists keep their files byte-identical. Lists whose every member is
    * deleted have their directories removed outright. Returns the number
    * of rows deleted.
    *
    * Centroids are untouched — [[appendToIvfIndex]]'s drift caveat in
    * reverse: heavy deletion shifts the true centroids, and retraining is
    * the caller's offline rebuild cadence. */
  // Touched-cid discovery scans the index's (id, cid) columns only —
  // parquet pruning keeps the vectors (the index's mass) unread.
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, deleteIds: DataFrame, idCol: String): Long = {
    requireIntegralId(deleteIds, idCol, "deleteFromIvfIndex")
    val corpus = spark.read.parquet(s"$path/corpus")
    val ids = broadcast(
      deleteIds.select(col(idCol).cast("long").as("__del")).distinct())
    val touched = corpus
      .join(ids, col("id").cast("long") === col("__del"), "left_semi")
      .select(col("cid")).distinct()
      .collect().map(_.getInt(0)).toSeq // bounded: ≤ numCentroids
    if (touched.isEmpty) return 0L
    val scoped = corpus.filter(col("cid").isin(touched: _*))
    val nBefore = scoped.count()
    val kept = scoped
      .join(ids, col("id").cast("long") === col("__del"), "left_anti")
      .repartition(col("cid"),
        pmod(xxhash64(col("id")), lit(WriteSalt.toLong)))
      .localCheckpoint(true)
    val nKept = kept.count()
    val keptCids = kept.select(col("cid")).distinct()
      .collect().map(_.getInt(0)).toSet
    rewriteLists(spark, path, kept)
    // dynamic overwrite only replaces partitions PRESENT in `kept`: a
    // fully-deleted list must be dropped explicitly
    val fs = new org.apache.hadoop.fs.Path(s"$path/corpus")
      .getFileSystem(spark.sessionState.newHadoopConf())
    touched.filterNot(keptCids).foreach(c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/corpus/cid=$c"), true))
    nBefore - nKept
  }

  /** Idempotent UPSERT into a persisted [[buildIvfIndex]] index:
    * [[deleteFromIvfIndex]] of the incoming ids (a no-op for ids not in
    * the index) followed by [[appendToIvfIndex]]. Two jobs, but the
    * operation a serving store actually needs —
    *
    *  - recrawled documents REPLACE their stale vectors instead of
    *    coexisting with them;
    *  - re-running the same batch converges to the same index state, so
    *    an at-least-once delivery (foreachBatch retry, replayed ingest
    *    job) never double-inserts — the property bare append lacks.
    *
    * The delete leg reads only the (id, cid) columns (parquet pruning);
    * the append leg touches only the assigned cid directories. */
  def upsertIntoIvfIndex(newVecs: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    requireIntegralId(newVecs, idCol, "upsertIntoIvfIndex")
    deleteFromIvfIndex(newVecs.sparkSession, path,
      newVecs.select(col(idCol)), idCol)
    appendToIvfIndex(newVecs, idCol, vecCol, path)
  }

  /** Compact append-fragmented inverted lists: [[appendToIvfIndex]] adds
    * up to WriteSalt files to every touched list per batch, so a long
    * append cadence decays a list into many small files and its scans
    * into footer reads (the same small-files decay as the streaming state
    * store). Rewrites ONLY the `cid=` directories holding more than
    * `maxFilesPerList` data files, each back to ≤ WriteSalt files, with
    * the same materialize-then-dynamic-overwrite commit as
    * [[deleteFromIvfIndex]]. Returns the compacted cids. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      maxFilesPerList: Int = 4 * WriteSalt): Seq[Int] = {
    val corpusPath = new org.apache.hadoop.fs.Path(s"$path/corpus")
    val fs = corpusPath.getFileSystem(spark.sessionState.newHadoopConf())
    val frag = fs.listStatus(corpusPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cid="))
      .filter { st =>
        fs.listStatus(st.getPath).count(f => f.isFile &&
          !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith(".")) > maxFilesPerList
      }
      .map(_.getPath.getName.stripPrefix("cid=").toInt)
    if (frag.isEmpty) return Nil
    val kept = spark.read.parquet(s"$path/corpus")
      .filter(col("cid").isin(frag: _*))
      .repartition(col("cid"),
        pmod(xxhash64(col("id")), lit(WriteSalt.toLong)))
      .localCheckpoint(true)
    rewriteLists(spark, path, kept)
    frag
  }

  /** Shared commit for [[deleteFromIvfIndex]]/[[compactIvfIndex]]:
    * dynamic-partition-overwrite `kept` (already materialized, already
    * salt-repartitioned) into the index corpus — only the cid partitions
    * present in `kept` are replaced. The mode rides the WRITE as an
    * option (not a session conf mutation), so concurrent writers in the
    * same session never observe a flipped global default. */
  private def rewriteLists(spark: org.apache.spark.sql.SparkSession,
      path: String, kept: DataFrame): Unit =
    kept.write.partitionBy("cid").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$path/corpus")

  /** Load the centroid matrix of a persisted index as the flat row-major
    * array [[graft.functions.TopCentroids]] consumes:
    * (flat, numCentroids, dim). Bounded driver state by construction. */
  private def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): (Array[Double], Int, Int) = {
    val centRows = spark.read.parquet(s"$path/centroids")
      .select(col("cid"), col("vec")).collect()
    val numCentroids = centRows.length
    val dim = centRows.head.getSeq[Double](1).length
    val flat = new Array[Double](numCentroids * dim)
    centRows.foreach { r =>
      val v = r.getSeq[Double](1)
      var i = 0
      while (i < dim) { flat(r.getInt(0) * dim + i) = v(i); i += 1 }
    }
    (flat, numCentroids, dim)
  }

  /** Number of distinct inverted lists a probe set would open — the
    * pruning diagnostic q167 gates (`probed < materialized lists`). */
  def probedCidCount(spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, idCol: String, vecCol: String, nProbe: Int): Long = {
    import org.apache.spark.sql.graftshim.ColumnShim
    import graft.functions.TopCentroids
    val (flat, numCentroids, _) = loadCentroids(spark, path)
    probes.select(explode(ColumnShim.column(TopCentroids(
        ColumnShim.expression(col(vecCol)), flat, numCentroids, nProbe)))
        .as("cid"))
      .distinct().count()
  }

  /** Search a [[buildIvfIndex]] index: probes pick their `nProbe` nearest
    * centroids, the corpus scan is filtered to those cids with a static
    * IN-list (directory-level partition pruning — the probe set is small
    * by contract, so collecting its cid set is a bounded driver step),
    * candidates score exact cosine, ranking keeps top k. */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 8): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    import graft.functions.TopCentroids
    requireIntegralId(probes, idCol, "searchIvfIndex")
    val (flat, numCentroids, _) = loadCentroids(spark, path)
    val corpus = spark.read.parquet(s"$path/corpus")
    val int8 = corpus.schema.fieldNames.contains("code")
    // probe payload mirrors the stored codec: float probes against float
    // lists (bit-identical to ivfTopK), coded probes against coded lists
    // (bit-identical to ivfTopKInt8 — the scales cancel per pair)
    val pPayload =
      if (int8) VectorOps.int8Code(col(vecCol)).as("pvec")
      else col(vecCol).as("pvec")
    // ids normalized to long (as bruteForceTopKFast does) so callers with
    // int id columns — and autoTuneNProbe's getLong decode — never hit a
    // runtime cast error; a no-op for the bigint fixture ids
    val p = probes.select(col(idCol).cast("long").as("query_id"), pPayload,
      explode(ColumnShim.column(TopCentroids(
        ColumnShim.expression(col(vecCol)), flat, numCentroids, nProbe)))
        .as("cid"))
    val probedCids = p.select(col("cid")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val c = corpus
      .filter(col("cid").isin(probedCids: _*))
      .select(col("id").cast("long").as("neighbor_id"),
        (if (int8) col("code") else col("vec")).as("cvec"), col("cid"))
    val score =
      if (int8) VectorOps.int8Cosine(col("pvec"), col("cvec"))
      else VectorOps.cosine(col("pvec"), col("cvec"))
    val scored = c.join(broadcast(p), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), score.as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k).drop("rank")
  }

  /** Auto-tune `nProbe` for a persisted [[buildIvfIndex]] index: walk the
    * candidate ladder (ascending) and return the FIRST value whose
    * measured recall on a held-out probe sample meets `targetRecall`
    * (falling back to the largest candidate), plus that recall. This is
    * the serving-side knob turn every IVF deployment does by hand —
    * recall is a property of the data's clusteredness, so the right
    * nProbe cannot be known a priori; measuring it on a bounded sample
    * against exact brute force makes the choice deterministic and
    * auditable. Cost: one brute-force pass over the SAMPLE (bounded by
    * contract) + one partition-pruned index search per candidate tried —
    * the ladder stops at the first success, and each search reads only
    * ≈ cand/numCentroids of the corpus bytes. Recall is monotone
    * non-decreasing in nProbe by construction (probed lists only grow),
    * so first-success = minimal-cost choice at the target. */
  def autoTuneNProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      corpus: DataFrame, sampleProbes: DataFrame, idCol: String,
      vecCol: String, k: Int, targetRecall: Double,
      candidates: Seq[Int] = Seq(1, 2, 4, 8, 16)): (Int, Double) = {
    require(candidates.nonEmpty && candidates == candidates.sorted,
      "candidates must be ascending")
    requireIntegralId(corpus, idCol, "autoTuneNProbe")
    requireIntegralId(sampleProbes, idCol, "autoTuneNProbe")
    val truth = bruteForceTopKFast(corpus, sampleProbes, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    require(truth.nonEmpty, "empty probe sample")
    var chosen = candidates.last
    var recall = -1.0
    val it = candidates.iterator
    var done = false
    while (it.hasNext && !done) {
      val cand = it.next()
      val got = searchIvfIndex(spark, path, sampleProbes, idCol, vecCol, k,
          nProbe = cand)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      recall = got.intersect(truth).size.toDouble / truth.size
      if (recall >= targetRecall) { chosen = cand; done = true }
    }
    (chosen, recall)
  }

  /** Deterministic mini-batch-free Lloyd training shared by [[ivfTopK]] and
    * [[semDedupPairs]]: seeds = the `numCentroids` lowest-id vectors
    * (deterministic, any engine), `lloydIters` rounds of
    * assign-via-[[graft.functions.TopCentroids]] + exact decimal mean
    * (shuffle ∝ centroids×dim partials, never rows). Returns l2-normalized
    * centroid rows. */
  private def lloydCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, lloydIters: Int): Array[Array[Double]] = {
    import org.apache.spark.sql.graftshim.ColumnShim
    import graft.functions.TopCentroids

    def l2norm(a: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      val n = math.sqrt(s)
      if (n > 0) a.map(_ / n) else a
    }
    val seeds = corpus
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
      .orderBy(col("__id")).limit(numCentroids).collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    require(seeds.length == numCentroids,
      s"corpus smaller than numCentroids=$numCentroids")
    var centroids = seeds.map(l2norm)
    val dim = centroids.head.length
    for (_ <- 0 until lloydIters) {
      val assign = ColumnShim.column(TopCentroids(
        ColumnShim.expression(col(vecCol)), centroids.flatten.toArray,
        numCentroids, 1)).getItem(0)
      val parts = corpus
        .select(assign.as("cid"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x").cast("decimal(28,10)")).cast("double").as("s"),
          count(lit(1)).as("n"))
        .collect()
      val sums = Array.fill(numCentroids)(new Array[Double](dim))
      val counts = new Array[Long](numCentroids)
      parts.foreach { r =>
        val cid = r.getInt(0); val pos = r.getInt(1)
        sums(cid)(pos) = r.getDouble(2); counts(cid) = r.getLong(3)
      }
      centroids = centroids.indices.toArray.map { c =>
        if (counts(c) == 0) centroids(c)
        else l2norm(sums(c).map(_ / counts(c)))
      }
    }
    centroids
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    * public): cluster embeddings with k-means, then search for cosine ≥
    * `threshold` pairs ONLY within each cluster — all-pairs work shrinks
    * from O(N²) to Σ O(|cluster|²), and `numCentroids` is the knob that
    * bounds cluster size (the paper's recipe: pick k so clusters fit a
    * worker; here, so the per-bucket pair fan-out stays shuffle-sized).
    * Pairs that straddle a cluster boundary are missed by construction —
    * recall < 1, like every bucketed dedup in this file; PipelineSpec
    * anchors recall on planted clusters. Same bucket-collect shape as
    * [[cosineNearDupPairs]], with the learned cid as the bucket key and
    * the same min-id-star collapse past `maxBucket`
    * ([[Dedup.cappedPairCombos]]) bounding a pathological cluster's pair
    * fan-out to linear. */
  def semDedupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numCentroids: Int = 64, lloydIters: Int = 1,
      maxBucket: Int = Dedup.MaxBucket): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    import graft.functions.TopCentroids
    val flat = lloydCentroids(df, idCol, vecCol, numCentroids,
      lloydIters).flatten.toArray
    val cid = ColumnShim.column(TopCentroids(
      ColumnShim.expression(col(vecCol)), flat, numCentroids, 1)).getItem(0)
    val pairs = df
      .select(col(idCol), cid.as("bucket"))
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(Dedup.cappedPairCombos(col("ids"), maxBucket)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vecs = df.select(col(idCol), col(vecCol))
    val verified = pairs
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        VectorOps.cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
      // eager localCheckpoint: computed once, reused by every caller
      // branch, blocks ContextCleaner-freed when unreachable — no
      // caller-must-unpersist contract (see Dedup.nearDupPairs)
      .localCheckpoint(true)
    pairs.unpersist(blocking = false)
    verified
  }

  /** End-to-end SemDeDup: drop every embedding that is not its semantic
    * dup-cluster's min-id representative; singletons survive.
    * [[semDedupPairs]] → [[Dedup.dupClusters]] → anti-join (AQE sizes it). */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numCentroids: Int = 64,
      lloydIters: Int = 1): DataFrame = {
    val pairs = semDedupPairs(df, idCol, vecCol, threshold, numCentroids,
      lloydIters)
    // pairs is an eager localCheckpoint; dupClusters returns checkpointed
    // labels, after which the pair blocks are auto-freed
    val clusters = Dedup.dupClusters(pairs)
    val losers = clusters
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, multi-table
    * sign-LSH candidates (OR-amplification, same rationale as [[lshTopK]])
    * verified exactly — the scalable analogue of text MinHash dedup for
    * embedding space. Bucket-collect shape: one evaluation of the signature
    * subtree, in-bucket pair enumeration, candidates deduped before the
    * exact cosine verify. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bitsPerTable: Int = 6, numTables: Int = 16,
      dim: Int = 64, seed: Long = 42L,
      maxBucket: Int = Dedup.MaxBucket): DataFrame = {
    val sigs = (0 until numTables).map { t =>
      val planes = VectorOps.randomPlanes(bitsPerTable, dim, seed + t)
      lit(t.toLong << 32) + VectorOps.hyperplaneSignature(col(vecCol), planes)
    }
    val pairs = df
      .select(col(idCol), explode(array(sigs: _*)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(Dedup.cappedPairCombos(col("ids"), maxBucket)).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vecs = df.select(col(idCol), col(vecCol))
    val verified = pairs
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        VectorOps.cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .localCheckpoint(true) // eager; auto-freed — see Dedup.nearDupPairs
    pairs.unpersist(blocking = false)
    verified
  }

  /** Per-group mean embedding (class centroids / prototype vectors), long
    * format `(groupCol, pos, n, mean_val)` — the embedding-space rollup
    * behind prototype classifiers, drift monitoring, and IVF-style
    * seeding at corpus scale. Elements are averaged at 1e-10 fixed-point
    * resolution (far below float32 noise).
    *
    * Scale shape: posexplode fans each vector into (group, pos, x) rows in
    * the scan stage; partial aggregation absorbs the ×dim fan-out map-side,
    * so the one shuffle carries a (group × dim)-sized table of partials —
    * independent of corpus row count. Element sums travel as exact
    * INTEGERS: each element quantizes to `±floor(|x|·1e10 + 0.5)` (floor
    * rounding — deterministic in every engine; a double→DECIMAL(p,10) cast
    * is NOT: a float whose decimal expansion ties at digit 11 — any odd
    * multiple of 2^-11 — rounds HALF_UP in Spark and half-even in DuckDB,
    * measured 1 ulp apart on the fixture), summed as scale-0 decimals
    * (q65 rule: one correctly-rounded int→double conversion per engine). */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val xd = col("x").cast("double")
    val s = xd * lit(1e10)
    val xq = when(xd >= 0, floor(s + lit(0.5)))
      .otherwise(-floor(-s + lit(0.5)))
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(count(lit(1)).as("n"),
        (sum(xq.cast("decimal(38,0)")).cast("double") /
          (count(lit(1)).cast("double") * lit(1e10))).as("mean_val"))
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
