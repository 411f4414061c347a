package graft.parser

import scala.util.matching.Regex

import graft.model.{AggKind, ApproxSpec, SamplingStrategy}

/** SQL-string front door — the Spark twin of the reference's two parsers:
  * the C++ regex parser (parser.cpp:20-76: single aggregate of a single
  * column, one FROM table, optional WHERE / GROUP BY) and the Python
  * `APPROX(...)` pre-rewrite (enhanced_aqe_cli.py:83-95).
  *
  * We only parse the *approximation envelope*; anything fancier should go
  * through `spark.sql` / the AqeSession API directly. Unlike the reference,
  * the WHERE text is handed to Catalyst (`df.filter(expr(where))`) rather
  * than being spliced into generated SQL (kills bug class B4, SURVEY §2.6).
  */
object QueryParser {

  /** `APPROX( inner )` embedded-syntax rewrite. Returns (cleanQuery, found). */
  def stripApprox(sql: String): (String, Boolean) = {
    val re: Regex = "(?i)APPROX\\s*\\(\\s*([^)]+)\\s*\\)".r
    re.findFirstMatchIn(sql) match {
      case Some(m) => (sql.substring(0, m.start) + m.group(1).trim + sql.substring(m.end), true)
      case None    => (sql, false)
    }
  }

  private val selectRe: Regex =
    """(?is)^\s*SELECT\s+(\w+)\s*\(\s*(\*|[\w.]+)\s*\)\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*?))?(?:\s+GROUP\s+BY\s+([\w.]+))?\s*;?\s*$""".r

  /** Parse `SELECT agg(col) FROM t [WHERE pred] [GROUP BY g]`, plus CLI-level
    * directives (sample % / error threshold / CI) into an [[ApproxSpec]]. */
  def parse(sql: String,
      samplePercent: Option[Double] = None,
      errorThresholdPct: Option[Double] = None,
      withCi: Boolean = false,
      confidence: Double = 0.95): ApproxSpec = {
    val (clean, embeddedApprox) = stripApprox(sql)
    clean match {
      case selectRe(aggName, column, table, whereOrNull, groupOrNull) =>
        val sampling: SamplingStrategy = (samplePercent, errorThresholdPct) match {
          case (_, Some(err)) => SamplingStrategy.Adaptive(err, confidence = confidence)
          case (Some(pct), _) =>
            require(pct > 0 && pct <= 100, s"sample percent out of range: $pct")
            if (pct >= 100) SamplingStrategy.Exact else SamplingStrategy.Uniform(pct / 100.0)
          case (None, None) if embeddedApprox =>
            // reference default for bare APPROX(): 10% sample
            // (enhanced_aqe_cli.py:487-494 routes by heuristic; 10 is its
            // random-path default)
            SamplingStrategy.Uniform(0.10)
          case _ => SamplingStrategy.Exact
        }
        ApproxSpec(
          agg = AggKind.parse(aggName),
          column = if (column == "*") "*" else column,
          table = table,
          where = Option(whereOrNull).map(_.trim).filter(_.nonEmpty),
          groupBy = Option(groupOrNull).map(_.trim).filter(_.nonEmpty),
          sampling = sampling,
          withCi = withCi,
          confidence = confidence)
      case _ =>
        throw new IllegalArgumentException(
          s"unsupported query shape (expected SELECT agg(col) FROM t [WHERE ..] [GROUP BY g]): $sql")
    }
  }
}
