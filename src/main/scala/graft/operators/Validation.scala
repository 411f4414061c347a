package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (Deequ-style) compiled into ONE
  * aggregation pass — the admission gate a pipeline runs before letting a
  * new data drop into the corpus. Each check yields a row
  * `(check, n_violations, n_rows)`; the caller decides the policy
  * (fail the batch, quarantine, alert).
  *
  * Scale shape: every single-table check becomes one conditional-sum
  * aggregate in a single `df.agg(...)` — one scan, map-side partial
  * aggregation, a 1-row result exploded to long format on the driver side
  * of the plan. [[Check.Unique]] adds a COUNT(DISTINCT) (an Expand, same
  * one-pass shape [[Profiling]] uses). Referential integrity is the one
  * check that cannot ride the same scan: it is a key-only anti-join
  * (both sides project to the key before any shuffle; the parent side is
  * broadcast when small, AQE's call).
  */
object Validation {

  sealed trait Check { def name: String }
  object Check {
    /** Rows where `colName` is null violate. */
    final case class NotNull(colName: String) extends Check {
      val name = s"not_null($colName)"
    }
    /** Non-null rows outside `[lo, hi]` violate (nulls pass — pair with
      * [[NotNull]] to forbid them). */
    final case class InRange(colName: String, lo: Double, hi: Double) extends Check {
      val name = s"in_range($colName)"
    }
    /** Excess rows beyond one per distinct non-null key combination. */
    final case class Unique(colNames: Seq[String]) extends Check {
      val name = s"unique(${colNames.mkString(",")})"
    }
    /** Rows where `cond` is not true (null counts as a violation). */
    final case class Satisfies(checkName: String, cond: Column) extends Check {
      val name = s"satisfies($checkName)"
    }
  }

  private def violations(c: Check): Column = c match {
    case Check.NotNull(cn) =>
      sum(when(col(cn).isNull, lit(1L)).otherwise(lit(0L)))
    case Check.InRange(cn, lo, hi) =>
      sum(when(col(cn).isNotNull && (col(cn) < lit(lo) || col(cn) > lit(hi)),
        lit(1L)).otherwise(lit(0L)))
    case Check.Unique(cns) =>
      sum(when(cns.map(col(_).isNotNull).reduce(_ && _), lit(1L)).otherwise(lit(0L))) -
        count_distinct(col(cns.head), cns.tail.map(col): _*)
    case Check.Satisfies(_, cond) =>
      sum(when(coalesce(cond, lit(false)), lit(0L)).otherwise(lit(1L)))
  }

  /** Run all `checks` over `df` in one aggregation pass. Output:
    * `(check STRING, n_violations BIGINT, n_rows BIGINT)`, one row per
    * check, in the order given. */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "checks must be non-empty")
    val aggs = count(lit(1)).as("__n") +:
      checks.zipWithIndex.map { case (c, i) => coalesce(violations(c), lit(0L)).as(s"__v$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), col(s"__v$i").as("n_violations"),
        col("__n").as("n_rows"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Foreign-key check: child rows whose (non-null) `childKey` has no match
    * in `parent.parentKey` violate; null FKs pass (SQL semantics). Returns
    * the same one-row `(check, n_violations, n_rows)` shape as [[validate]]
    * so results union into one report. */
  def referentialIntegrity(child: DataFrame, childKey: Seq[String],
      parent: DataFrame, parentKey: Seq[String], checkName: String): DataFrame = {
    require(childKey.length == parentKey.length && childKey.nonEmpty,
      "key lists must be non-empty and same length")
    val total = child.agg(count(lit(1)).as("n_rows"))
    val childKeys = child.select(childKey.map(col): _*)
      .filter(childKey.map(col(_).isNotNull).reduce(_ && _))
    val parentKeys = parent.select(parentKey.map(col): _*)
    val joinCond = childKey.zip(parentKey)
      .map { case (c, p) => childKeys(c) === parentKeys(p) }.reduce(_ && _)
    val orphans = childKeys.join(parentKeys, joinCond, "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    orphans.crossJoin(total)
      .select(lit(s"foreign_key($checkName)").as("check"),
        col("n_violations"), col("n_rows"))
  }
}
