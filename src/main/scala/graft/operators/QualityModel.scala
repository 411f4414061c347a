package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the hashed linear classifier stage of a
  * pretraining curation pipeline (the fasttext/DCLM/FineWeb-edu pattern:
  * score every document with a cheap linear model over hashed token
  * features, keep the high-scoring tail). [[TextAnalysis.qualityScore]]
  * is the RULE-based filter family (C4/Gopher heuristics); this is the
  * MODEL-based one — a different curation stage with a different failure
  * profile, and real pipelines run both.
  *
  * The model here is the standard hashing-trick linear scorer
  * (Weinberger et al. 2009, "Feature hashing for large scale multitask
  * learning"): margin(doc) = Σ_tokens weight[bucket(token)]. Weights in
  * production come from training; this library ships a DETERMINISTIC
  * weight table derived from the bucket id (integer affine mod a prime,
  * centered), which keeps every pipeline stage — hashing, lookup,
  * accumulation, thresholding — real and testable while making the score
  * bit-reproducible in any engine (the driver hash-gates it). The
  * trained-weight production paths exist as first-class ops:
  * [[marginCentsMapped]] (coefficients as one map literal, same
  * scan-stage plan shape) and [[marginCentsJoined]] (broadcast join
  * against an explicit weight table, unbounded vocab) — q163 gates the
  * join path against the same margins as the baked table.
  *
  * Everything is integer arithmetic in CENTS folded per document by a
  * higher-order `aggregate` over the token array — a pure scan-stage
  * expression: no explode, no shuffle, no UDF; the downstream rollup is
  * the only exchange. Margin sums are exact integers, so cross-engine
  * comparison is exact and partition-order-independent.
  */
object QualityModel {

  /** Number of hashed weight buckets. Tiny by design — the determinism
    * contract matters more than collision rate for the shipped table; a
    * trained replacement would use 2^18+ buckets via the same [[bucket]]
    * shape. */
  val Buckets = 64

  /** Feature-hash bucket of one token: affine in (length, first code
    * point) mod [[Buckets]] — ASCII-stable across engines (`ascii` here ≡
    * `unicode` in DuckDB for ASCII corpora). */
  def bucket(token: Column): Column =
    pmod(length(token) * lit(31) + ascii(token), lit(Buckets))

  /** Deterministic weight of bucket `b`, in integer cents ∈ [−50, 50]. */
  def weightCents(b: Column): Column =
    pmod(b * lit(127) + lit(17), lit(101)) - lit(50)

  /** Per-document margin in cents: Σ over whitespace tokens of the
    * hashed-bucket weight. Runs as the native codegen'd
    * [[graft.functions.QualityMarginCents]] single-pass kernel (the
    * declarative fold is an `ArrayAggregate` — CodegenFallback, breaks
    * whole-stage codegen and allocates a token array per document);
    * [[marginCentsFold]] is the declarative twin it is spec-locked to. */
  def marginCents(text: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.QualityMarginCents(
      ColumnShim.expression(text)))
  }

  /** Interpreted higher-order-function form of [[marginCents]] (the
    * semantics statement, and the shape the DuckDB oracle mirrors). */
  def marginCentsFold(text: Column): Column =
    aggregate(
      filter(split(text, " "), t => length(t) > 0),
      lit(0L),
      (acc, t) => acc + weightCents(bucket(t)).cast("long"))

  /** Classifier score in weight units (margin/100): one double division
    * at the end, identical in any engine. */
  def score(text: Column): Column = marginCents(text).cast("double") / lit(100.0)

  /** Keep decision at threshold 0 — the pipeline's filter predicate. */
  def keep(text: Column): Column = marginCents(text) > lit(0L)

  /** The shipped deterministic weight table as an explicit DataFrame
    * `(bucket INT, weight_cents BIGINT)` — the fixture "trained model"
    * for the production-shape paths below. */
  def defaultWeightTable(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(Buckets).select(col("id").cast("int").as("bucket"),
      weightCents(col("id").cast("int")).cast("long").as("weight_cents"))

  /** TRAINED-WEIGHT margin, map-literal form: Σ weight[bucket(token)]
    * with the weights supplied as a Scala map (a trained model's
    * coefficient vector) baked into the plan as one map literal — the
    * same pure scan-stage shape as [[marginCentsFold]], no explode, no
    * join, no shuffle. Right for models up to ~2¹⁸ buckets (a few MB of
    * plan literal); beyond that use [[marginCentsJoined]]. Buckets absent
    * from the map weigh 0. Runs as the interpreted HOF fold (the native
    * codegen kernel bakes the deterministic table only). */
  def marginCentsMapped(text: Column, weights: Map[Int, Long]): Column = {
    val wm = typedLit(weights)
    aggregate(
      filter(split(text, " "), t => length(t) > 0),
      lit(0L),
      (acc, t) => acc + coalesce(element_at(wm, bucket(t)), lit(0L)))
  }

  /** TRAINED-WEIGHT margin, broadcast-join form — the unbounded-vocab
    * production shape: tokens explode in the scan stage, bucket ids join
    * the (small) weight table with a BROADCAST hash join — no shuffle of
    * the token stream — and the per-document sum is the only wide
    * exchange, keyed on the doc id with map-side combine. Documents with
    * no tokens survive with margin 0 (explode_outer + left join).
    * Identical totals to [[marginCents]] when `weights` is
    * [[defaultWeightTable]] (q163 gates it cross-engine).
    *
    * Output: `idCol`, `keep*`, `margin_cents`. */
  def marginCentsJoined(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val toks = df.select(col(idCol) +: keep.map(col) :+
        explode_outer(filter(split(col(textCol), " "),
          t => length(t) > 0)).as("__tok"): _*)
      .withColumn("__bucket", bucket(col("__tok")))
    toks
      .join(broadcast(weights.select(col("bucket").as("__bucket"),
        col("weight_cents").as("__w"))), Seq("__bucket"), "left")
      .groupBy(col(idCol) +: keep.map(col): _*)
      .agg(coalesce(sum(col("__w")), lit(0L)).as("margin_cents"))
  }

  /** Per-document hashed-feature rows `(docId, bucket, cnt)` — the sparse
    * design matrix both [[trainWeights]] and a trained-scoring join
    * consume. One explode + one (doc, bucket)-keyed aggregation;
    * map-side combine collapses repeated tokens before the exchange. */
  def featureRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__doc"),
        explode(filter(split(col(textCol), " "), t => length(t) > 0))
          .as("__tok"))
      .select(col("__doc"), bucket(col("__tok")).as("bucket"))
      .groupBy(col("__doc"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** DISTRIBUTED TRAINING of the hashed linear scorer — batch gradient
    * descent for logistic loss over the [[bucket]] feature space, run
    * entirely as DataFrame algebra:
    *
    *   per iteration:  margin_i = Σ_b cnt_ib·w_b   (doc-keyed aggregate)
    *                   g_b      = Σ_i (σ(margin_i) − y_i)·cnt_ib
    *                                                (bucket-keyed aggregate)
    *                   w_b     −= lr·g_b / N        (driver update, B values)
    *
    * The cached (doc, bucket, cnt) table is the only distributed state;
    * each iteration is two shuffles over it (doc-keyed then bucket-keyed
    * partial aggregates) and the weight vector itself is B driver values
    * (B = [[Buckets]] here; the same loop holds to ~2¹⁸ buckets, past
    * which switch the update to a weights DataFrame join). Deterministic:
    * gradients sum per-term ROUNDED fixed-point decimals (exact,
    * partition-order-independent) and the driver update is fixed-order
    * IEEE — same weights every run (FrontierSpec asserts).
    *
    * `labelCol` ∈ {0, 1}. Returns `(bucket, weight_cents)` rounded to
    * integer cents — directly consumable by [[marginCentsJoined]] /
    * [[marginCentsMapped]], closing the train → export → score loop
    * in-engine. */
  def trainWeights(df: DataFrame, idCol: String, textCol: String,
      labelCol: Column, iters: Int = 50, lr: Double = 1.0,
      decay: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    require(iters >= 1)
    val feats = featureRows(df, idCol, textCol)
      .join(df.select(col(idCol).as("__doc"),
        labelCol.cast("double").as("__y")), Seq("__doc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = feats.select(col("__doc")).distinct().count().toDouble
    var w = Array.fill(Buckets)(0.0)
    try {
      for (t <- 0 until iters) {
        val lrT = lr / (1.0 + decay * t) // harmonic step decay; 0 = fixed
        // weights enter the plan as ONE array literal, indexed per row
        val wCol = element_at(array(w.toIndexedSeq.map(lit): _*),
          col("bucket").cast("int") + 1)
        val margins = feats
          .groupBy(col("__doc"))
          .agg(sum(col("cnt").cast("double") * wCol).as("__m"),
            first(col("__y")).as("__y"))
          .select(col("__doc"),
            (lit(1.0) / (lit(1.0) + exp(-col("__m"))) - col("__y"))
              .as("__resid"))
        // per-term fixed-point rounding → exact decimal sums → the
        // gradient is partition-order-independent (q65 discipline)
        val grads = feats.join(margins, Seq("__doc"))
          .groupBy(col("bucket"))
          .agg((sum(round(col("__resid") * col("cnt").cast("double"), 9)
            .cast("decimal(28,9)")).cast("double") / lit(n)).as("__g"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        w = w.zipWithIndex.map { case (wv, b) =>
          wv - lrT * grads.getOrElse(b, 0.0)
        }
      }
    } finally feats.unpersist(blocking = false)
    import spark.implicits._
    w.zipWithIndex.toSeq
      .map { case (wv, b) => (b, math.round(wv * 100.0)) }
      .toDF("bucket", "weight_cents")
  }

  /** DuckDB twin of [[marginCents]] for oracle SQL (list_sum over the
    * same integer features; integer sums are order-independent). */
  def marginCentsSql(textExpr: String): String =
    s"COALESCE(list_sum([ ((length(t) * 31 + unicode(t)) % $Buckets * 127 + 17) % 101 - 50 " +
      s"for t in list_filter(string_split($textExpr, ' '), t -> length(t) > 0) ]), 0)"
}
