package graft.operators

import org.apache.spark.sql.Column
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
  * bit-reproducible in any engine (the driver hash-gates it; swap
  * [[weightCents]] for a broadcast-joined trained table in production,
  * the plan shape is unchanged).
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

  /** DuckDB twin of [[marginCents]] for oracle SQL (list_sum over the
    * same integer features; integer sums are order-independent). */
  def marginCentsSql(textExpr: String): String =
    s"COALESCE(list_sum([ ((length(t) * 31 + unicode(t)) % $Buckets * 127 + 17) % 101 - 50 " +
      s"for t in list_filter(string_split($textExpr, ' '), t -> length(t) > 0) ]), 0)"
}
