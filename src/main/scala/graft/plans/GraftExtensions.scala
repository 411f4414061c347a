package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Sample}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst extension: automatic scale-up of SUM/COUNT aggregates computed
  * directly over a `Sample` node (SURVEY §4.2/§7.3 optional rule (c)) — the
  * declarative form of the reference's scaling contract (parser.h:4-16):
  * `TABLESAMPLE`/`df.sample` + `sum(x)` behaves as an *estimator of the
  * full-table sum*, AVG untouched.
  *
  * Rewrite: `Aggregate(_, sum(x), Sample(f))` → `Aggregate(_, sum(x)·(1/f),
  * Sample(f))`. Idempotent by shape: the rewrite wraps the aggregate in a
  * Multiply, which no longer matches the bare-aggregate pattern.
  *
  * Opt-in semantics change → gated on `spark.graft.autoscale.enabled`
  * (default true once the extension is installed; installing it IS the
  * opt-in). Enable with:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ScaleSampledAggregates)
    ext.injectOptimizerRule(_ => ApproxAggregateRewrite)
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    GraftFunctions.registrations.foreach(ext.injectFunction)
  }
}

/** SQL registration of the native codegen kernels, so `spark.sql` users
  * reach them without the Scala API: `word_ngrams(text, 3)`,
  * `vec_dot(a, b)`, `han_count(s)`, `string_fold_hash(s)`,
  * `lexicon_hits(s, 'the,a,an')`. Static arguments (n, lexicon) must be
  * foldable literals — they compile into the generated code. */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
  import graft.functions.{FloatVecDot, HanCount, LexiconHits, QualityMarginCents, SortedLongJaccard, StringFoldHash, WinnowFingerprints, WordGramFoldHashes, WordNgramHashes, WordNgrams}

  private def lit[T](e: Expression, what: String): T = e match {
    case Literal(v, _) => v.asInstanceOf[T]
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] =
    Seq(
      (FunctionIdentifier("word_ngrams"),
        new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
        (args: Seq[Expression]) => WordNgrams(args(0),
          lit[Int](args(1), "word_ngrams n"))),
      (FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
        (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
      (FunctionIdentifier("han_count"),
        new ExpressionInfo(classOf[HanCount].getName, "han_count"),
        (args: Seq[Expression]) => HanCount(args(0))),
      (FunctionIdentifier("string_fold_hash"),
        new ExpressionInfo(classOf[StringFoldHash].getName, "string_fold_hash"),
        (args: Seq[Expression]) => StringFoldHash(args(0))),
      (FunctionIdentifier("quality_margin_cents"),
        new ExpressionInfo(classOf[QualityMarginCents].getName, "quality_margin_cents"),
        (args: Seq[Expression]) => QualityMarginCents(args(0))),
      (FunctionIdentifier("lexicon_hits"),
        new ExpressionInfo(classOf[LexiconHits].getName, "lexicon_hits"),
        (args: Seq[Expression]) => LexiconHits(args(0),
          lit[org.apache.spark.unsafe.types.UTF8String](args(1), "lexicon")
            .toString.split(",").map(_.trim))),
      (FunctionIdentifier("word_ngram_hashes"),
        new ExpressionInfo(classOf[WordNgramHashes].getName, "word_ngram_hashes"),
        (args: Seq[Expression]) => WordNgramHashes(args(0),
          lit[Int](args(1), "word_ngram_hashes n"))),
      (FunctionIdentifier("jaccard_sorted_hashes"),
        new ExpressionInfo(classOf[SortedLongJaccard].getName, "jaccard_sorted_hashes"),
        (args: Seq[Expression]) => SortedLongJaccard(args(0), args(1))),
      (FunctionIdentifier("word_gram_fold_hashes"),
        new ExpressionInfo(classOf[WordGramFoldHashes].getName, "word_gram_fold_hashes"),
        (args: Seq[Expression]) => WordGramFoldHashes(args(0),
          lit[Int](args(1), "word_gram_fold_hashes n"))),
      (FunctionIdentifier("winnow_fingerprints"),
        new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
        (args: Seq[Expression]) => WinnowFingerprints(args(0),
          lit[Int](args(1), "winnow_fingerprints k"),
          lit[Int](args(2), "winnow_fingerprints w"))))
}

object ScaleSampledAggregates extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.autoscale.enabled", "true").toBoolean) plan
    else plan.transformUp {
      case agg @ Aggregate(_, aggExprs, s: Sample, _)
          if s.upperBound - s.lowerBound < 1.0 && !s.withReplacement &&
            hasBareScalable(aggExprs) =>
        val scale = 1.0 / (s.upperBound - s.lowerBound)
        agg.copy(aggregateExpressions = aggExprs.map {
          case a @ Alias(ae: AggregateExpression, name) if isScalable(ae) =>
            Alias(Multiply(Cast(ae, DoubleType), Literal(scale)), name)(
              exprId = a.exprId, qualifier = a.qualifier)
          case other => other
        })
    }

  private val DoubleType = org.apache.spark.sql.types.DoubleType

  private def isScalable(ae: AggregateExpression): Boolean = ae.aggregateFunction match {
    case _: Sum | _: Count => !ae.isDistinct
    case _ => false
  }

  private def hasBareScalable(exprs: Seq[NamedExpression]): Boolean = exprs.exists {
    case Alias(ae: AggregateExpression, _) => isScalable(ae)
    case _ => false
  }
}

/** Opt-in "approximate mode": rewrite EXACT aggregates the user wrote into
  * their sketch counterparts at the optimizer level — the engine-native
  * generalization of the reference's CLI-level approximation toggle
  * (enhanced_aqe_cli.py routes a query to an approximate path; here the
  * PLAN is rewritten, so every surface — SQL, DataFrame, BI tool — gets
  * the speedup without changing a line of query text).
  *
  *  - `COUNT(DISTINCT x)` → HyperLogLog++ (`approx_count_distinct`) when
  *    `spark.graft.approx.countDistinct.enabled=true`; rsd from
  *    `spark.graft.approx.countDistinct.rsd` (default 0.05). Kills the
  *    Expand + double-shuffle exact-distinct plan: the HLL buffer is a
  *    fixed few KB per group and merges map-side — at 100 TB this is the
  *    difference between shuffling every distinct value and shuffling one
  *    sketch per group.
  *  - `PERCENTILE(x, p)` → `ApproximatePercentile` (KLL-like quantile
  *    summary) when `spark.graft.approx.percentile.enabled=true`;
  *    accuracy from `spark.graft.approx.percentile.accuracy` (default
  *    10000). Replaces the full sorted-values buffer (OOM-prone per
  *    group) with a bounded summary.
  *
  * Both default OFF: a silently-approximate exact query is a correctness
  * surprise; the flags are the explicit user contract (the reference's
  * `--use-sampling`, lifted to session scope). Distinct-count rewrites
  * skip multi-arg COUNT(DISTINCT a, b) — HLL++ takes one child; wrap in
  * `struct()` upstream if needed. */
object ApproxAggregateRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.aggregate.{
    AggregateExpression, ApproximatePercentile, Count, HyperLogLogPlusPlus,
    Percentile}

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val cdOn = conf.getConfString(
      "spark.graft.approx.countDistinct.enabled", "false").toBoolean
    val pctOn = conf.getConfString(
      "spark.graft.approx.percentile.enabled", "false").toBoolean
    if (!cdOn && !pctOn) return plan
    val rsd = conf.getConfString(
      "spark.graft.approx.countDistinct.rsd", "0.05").toDouble
    val accuracy = conf.getConfString(
      "spark.graft.approx.percentile.accuracy", "10000").toInt
    plan.transformUp {
      case agg: Aggregate => agg.transformExpressions {
        case ae @ AggregateExpression(c: Count, _, true, _, _)
            if cdOn && c.children.nonEmpty =>
          // multi-arg COUNT(DISTINCT a, b): HLL++ hashes one child, so
          // tuple the columns — same distinctness, one sketch. NOTE the
          // semantics nit: COUNT(DISTINCT a, b) ignores rows where ANY
          // column is null, while struct(a, b) is never null — the struct
          // form counts those tuples. Preserve exact-count semantics by
          // null-gating the struct.
          val child = c.children match {
            case Seq(one) => one
            case many =>
              val tuple = CreateStruct(many)
              val anyNull = many.map(IsNull(_): Expression).reduce(Or(_, _))
              // post-analysis rewrite: branches must be typed by US
              If(anyNull, Literal(null, tuple.dataType), tuple)
          }
          ae.copy(
            aggregateFunction = new HyperLogLogPlusPlus(child, rsd),
            isDistinct = false)
        case ae @ AggregateExpression(p: Percentile, _, false, _, _)
            if pctOn && p.frequencyExpression == Literal(1L) =>
          // Type contract: exact Percentile yields DOUBLE (or ARRAY<DOUBLE>)
          // while ApproximatePercentile yields the child's type. Enclosing
          // expressions were analyzed against the exact type, so a bare swap
          // over an int/long/decimal child silently changes the schema and
          // can break already-resolved parents. Cast back to the analyzed
          // type whenever they differ.
          val approx = ae.copy(aggregateFunction = new ApproximatePercentile(
            p.child, p.percentageExpression,
            Literal(accuracy)))
          if (approx.dataType == ae.dataType) approx
          else Cast(approx, ae.dataType)
      }
    }
  }
}
