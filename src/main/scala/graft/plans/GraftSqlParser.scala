package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedFunction, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Sample}
import org.apache.spark.sql.types.DoubleType

/** First-class `APPROX_SUM(x, pct)` SQL syntax via
  * `SparkSessionExtensions.injectParser` — the SURVEY §4.3 "optional"
  * surface the reference only fakes with a regex pre-rewrite
  * (enhanced_aqe_cli.py:83-95 rewrites the TEXT before handing it to its
  * engine). Here the syntax is parsed by the real SQL parser (the functions
  * are ordinary function calls, so the grammar needs no change) and lowered
  * on the *unresolved plan*: each `APPROX_<AGG>(expr[, pct])` call becomes
  * the exact aggregate over a seeded Bernoulli [[Sample]] of the child,
  * scaled by `100/pct` (AVG self-normalizes — the reference's scaling
  * contract, parser.h:4-16). Catalyst then analyzes/optimizes the lowered
  * plan like any hand-written one: filters still push below the sample,
  * partial aggregation still applies, whole-stage codegen is unaffected.
  *
  * Syntax (case-insensitive; `pct` a literal percent, default 10):
  *   SELECT APPROX_SUM(l_quantity, 10) AS s FROM lineitem WHERE ...
  *   SELECT g, APPROX_COUNT(*, 5) AS n FROM t GROUP BY g
  *   SELECT APPROX_AVG(x) FROM t
  *
  * Rules enforced at parse time (loud errors, not silent skew):
  *  - every aggregate in a SELECT that uses APPROX_* must itself be
  *    APPROX_* (mixing exact and sampled aggregates over one sample would
  *    silently corrupt the exact ones);
  *  - all APPROX_* calls in one SELECT must agree on `pct` (one Sample
  *    node feeds them all).
  *
  * The sample seed comes from `spark.graft.approx.sql.seed` (default 42):
  * deterministic re-execution within a session, explicit knob for
  * re-randomization. Estimates are unbiased; CI-carrying variants live in
  * the programmatic API (`Estimators.sumCi`) — SQL keeps the surface the
  * reference exposed.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.rewrite(delegate.parsePlan(sqlText), seed)

  override def parseQuery(sqlText: String): LogicalPlan =
    GraftSqlParser.rewrite(delegate.parseQuery(sqlText), seed)

  private def seed: Long =
    session.conf.get("spark.graft.approx.sql.seed", "42").toLong

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  /** Parse + lower an APPROX_* query on ANY session — including one built
    * without the extension installed (the rewrite is idempotent, so a
    * session whose parser already lowered it is fine too). */
  def lowerSql(spark: SparkSession, sql: String, seed: Long = 42L)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.ofRows(spark, rewrite(ColumnShim.parsePlan(spark, sql), seed))
  }

  /** APPROX_<AGG> → exact aggregate name; extended by adding a pair here. */
  private val approxAggs: Map[String, String] = Map(
    "approx_sum"   -> "sum",
    "approx_count" -> "count",
    "approx_avg"   -> "avg")

  private def isApprox(u: UnresolvedFunction): Boolean =
    u.nameParts.length == 1 && approxAggs.contains(u.nameParts.head.toLowerCase)

  /** Lower every SELECT list containing APPROX_* aggregates. Runs on the
    * unresolved tree: a global aggregate is still a [[Project]] at this
    * point (the analyzer's GlobalAggregates rule hasn't fired), so both
    * Project and Aggregate shapes are handled. */
  def rewrite(plan: LogicalPlan, seed: Long): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(_, exprs, child, _) if hasApprox(exprs) =>
      val (newExprs, pct) = lowerSelectList(exprs, groupingCount(agg.groupingExpressions, exprs))
      agg.copy(aggregateExpressions = newExprs,
        child = Sample(0.0, pct / 100.0, withReplacement = false, seed, child))
    case proj @ Project(exprs, child) if hasApprox(exprs) =>
      val (newExprs, pct) = lowerSelectList(exprs, 0)
      proj.copy(projectList = newExprs,
        child = Sample(0.0, pct / 100.0, withReplacement = false, seed, child))
  }

  private def hasApprox(exprs: Seq[NamedExpression]): Boolean =
    exprs.exists(_.exists {
      case u: UnresolvedFunction => isApprox(u)
      case _ => false
    })

  /** Grouping columns may be repeated verbatim in the SELECT list — those
    * are exempt from the "everything must be APPROX_*" rule. */
  private def groupingCount(grouping: Seq[Expression],
      exprs: Seq[NamedExpression]): Int =
    exprs.count { e =>
      val inner = e match {
        case UnresolvedAlias(c, _) => c
        case Alias(c, _) => c
        case other => other
      }
      grouping.exists(_.semanticEquals(inner)) &&
        !inner.exists { case u: UnresolvedFunction => isApprox(u); case _ => false }
    }

  private def lowerSelectList(exprs: Seq[NamedExpression],
      exemptGrouping: Int): (Seq[NamedExpression], Double) = {
    var pcts = Set.empty[Double]
    var loweredEntries = 0
    val out = exprs.map { ne =>
      var touched = false
      val rewritten = ne.transformUp {
        case u: UnresolvedFunction if isApprox(u) =>
          val (fn, arg, pct) = parseCall(u)
          pcts += pct
          touched = true
          val exact = UnresolvedFunction(Seq(fn), Seq(arg), isDistinct = u.isDistinct)
          if (fn == "avg") exact
          else Multiply(Cast(exact, DoubleType), Literal(100.0 / pct))
      }.asInstanceOf[NamedExpression]
      if (touched) loweredEntries += 1
      rewritten
    }
    if (loweredEntries + exemptGrouping != exprs.length)
      throw new IllegalArgumentException(
        "APPROX_* aggregates cannot be mixed with exact aggregates in one " +
          "SELECT: the shared sample would silently skew the exact ones. " +
          "Split the query or make every aggregate APPROX_*.")
    if (pcts.size != 1)
      throw new IllegalArgumentException(
        s"all APPROX_* calls in one SELECT must use the same sample percent, " +
          s"got: ${pcts.toSeq.sorted.mkString(", ")}")
    (out, pcts.head)
  }

  /** `APPROX_SUM(expr[, pct])`; `*` (as in APPROX_COUNT(*)) becomes the
    * conventional COUNT(1). */
  private def parseCall(u: UnresolvedFunction): (String, Expression, Double) = {
    val name = u.nameParts.head.toLowerCase
    val fn = approxAggs(name)
    val (argRaw, pct) = u.arguments match {
      case Seq(a) => (a, 10.0)
      case Seq(a, Literal(p, _)) =>
        val v = p.toString.toDouble
        require(v > 0 && v <= 100, s"$name: sample percent out of (0, 100]: $v")
        (a, v)
      case _ => throw new IllegalArgumentException(
        s"$name expects (expr[, literal percent]), got ${u.arguments.length} args")
    }
    val arg = argRaw match {
      case _: UnresolvedStar => Literal(1)
      case e => e
    }
    (fn, arg, pct)
  }
}
