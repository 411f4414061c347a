package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR) — the hashed-feature
  * importance-weighting stage of a pretraining pipeline (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw document by how much its hashed token distribution looks
  * like a TARGET corpus (the high-quality reference set) rather than the
  * raw pool, then keep the top-scoring fraction.
  *
  * Shape, faithful to the paper: (1) hash tokens into `buckets` features
  * (hashing trick — same family as [[QualityModel]]); (2) estimate a
  * bucket-level target model and raw model from the two corpora, add-one
  * smoothed; (3) per-document importance score = Σ_tokens contrast of the
  * two models at the token's bucket; (4) select top-k. The paper's
  * contrast is the log-likelihood ratio and its selection adds Gumbel
  * noise; this implementation follows the repo's ln()-avoidance rule
  * (BM25/TF-IDF precedent — `TextAnalysis.bm25Search` scaladoc): the
  * per-bucket contrast is the SMOOTHED FREQUENCY DIFFERENCE in exact
  * integer parts-per-million, `(c_t(b)+1)·10⁶ div (T_t+B) −
  * (c_r(b)+1)·10⁶ div (T_r+B)`, which preserves the sign and ordering
  * structure of the ratio contrast while making every score an exact
  * 64-bit integer — bit-replayable by the DuckDB oracle (q178). A
  * trained log-ratio table drops into the same (bucket, weight) join.
  * Selection is the deterministic top-k under (score desc, id asc) —
  * the randomized-resampling counterpart already exists as the priority
  * machinery (`Sampling.prioritySample`).
  *
  * 100 TB posture: the weight table is `buckets` rows — BROADCAST; the
  * token stream never shuffles (explode → bucket → broadcast join →
  * map-side-combined per-doc rollup keyed on the doc id, the q163 plan
  * shape); model estimation is one hash aggregate per corpus collapsed
  * to ≤ buckets rows per partition before the exchange; selection is
  * TakeOrderedAndProject (k rows to the driver, no global sort). */
object Dsir {

  /** Default feature-hash width. Real runs use 2^16+; the operator takes
    * it as a parameter everywhere. */
  val Buckets = 512

  /** Cross-engine token hash: [[graft.functions.StringFoldHash]]
    * (poly-31 code-point fold mod 1e9+7 — the established DuckDB-twin
    * hash) folded into [0, buckets). */
  def bucket(token: Column, buckets: Int = Buckets): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    pmod(ColumnShim.column(graft.functions.StringFoldHash(
      ColumnShim.expression(token))), lit(buckets.toLong))
  }

  /** (id, bucket) rows: one per non-empty whitespace token. Scan-stage
    * explode + codegen'd fold hash; no shuffle here. */
  def tokenBuckets(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = Buckets): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .select(col(idCol), bucket(col("__tok"), buckets).as("bucket"))

  /** Per-bucket token counts of a corpus: ≤ `buckets` rows out. */
  def bucketCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = Buckets): DataFrame =
    tokenBuckets(df, idCol, textCol, buckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))

  /** The importance-weight table `(bucket, wppm)`: add-one-smoothed
    * target-minus-raw frequency contrast in integer ppm, one row per
    * bucket (including never-seen buckets — the smoothing term). Exact
    * long arithmetic throughout: products stay ≤ 10⁶·(corpus tokens+1),
    * within long range up to ~9·10¹² tokens per bucket; shard the count
    * into more buckets before that. */
  def featureWeights(target: DataFrame, raw: DataFrame, idCol: String,
      textCol: String, buckets: Int = Buckets): DataFrame = {
    val tc = bucketCounts(target, idCol, textCol, buckets)
    val rc = bucketCounts(raw, idCol, textCol, buckets)
    val totals = tc.agg(coalesce(sum(col("c")), lit(0L)).as("tt"))
      .crossJoin(rc.agg(coalesce(sum(col("c")), lit(0L)).as("tr")))
    target.sparkSession.range(buckets).select(col("id").as("bucket"))
      .join(tc.withColumnRenamed("c", "ct"), Seq("bucket"), "left")
      .join(rc.withColumnRenamed("c", "cr"), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        expr(s"(coalesce(ct, 0) + 1) * 1000000 DIV (tt + $buckets)" +
          s" - (coalesce(cr, 0) + 1) * 1000000 DIV (tr + $buckets)")
          .cast("long").as("wppm"))
  }

  /** Per-document importance score `(idCol, keep..., score_ppm)`: Σ over
    * tokens of the bucket weight. The weight table is broadcast; docs
    * whose text has no tokens score 0. */
  def importanceScores(raw: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int = Buckets,
      keep: Seq[String] = Nil): DataFrame = {
    val scored = tokenBuckets(raw, idCol, textCol, buckets)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol)).agg(sum(col("wppm")).as("__s"))
    raw.select(col(idCol) +: keep.map(col): _*)
      .join(scored, Seq(idCol), "left")
      .select(col(idCol) +: keep.map(col) :+
        coalesce(col("__s"), lit(0L)).as("score_ppm"): _*)
  }

  /** Deterministic top-k selection under (score desc, id asc) —
    * TakeOrderedAndProject, k rows to the driver. */
  def selectTopK(scores: DataFrame, idCol: String, k: Int): DataFrame =
    scores.orderBy(col("score_ppm").desc, col(idCol).asc).limit(k)

  /** End-to-end convenience: weights from (target vs raw), then the
    * top-k raw docs by importance score. */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = Buckets,
      keep: Seq[String] = Nil): DataFrame = {
    val w = featureWeights(target, raw, idCol, textCol, buckets)
    selectTopK(importanceScores(raw, idCol, textCol, w, buckets, keep),
      idCol, k)
  }
}
