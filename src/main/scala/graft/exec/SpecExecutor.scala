package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.AqeSession
import graft.model.{AggKind, ApproxSpec, SamplingStrategy}

/** Executes a parsed [[ApproxSpec]] against registered tables — the planner+
  * runner that replaces the reference's route step (enhanced_aqe_cli.py:483-497)
  * and `execute_query*` family (executor.cpp:28-321).
  *
  * COUNT compat quirk (reference A4, SURVEY §2.3): with
  * `spec.countExactCompat` the stored exact total is returned for COUNT under
  * sampling, as the enhanced CLI does; default is the documented scaling
  * contract.
  */
object SpecExecutor {

  def run(spark: SparkSession, spec: ApproxSpec): DataFrame = {
    val base0 = spark.table(spec.table)
    val base = spec.where.map(w => base0.filter(expr(w))).getOrElse(base0)
    val t = AqeSession(spark).table(base)
    val valueCol = if (spec.column == "*") lit(1L) else col(spec.column)
    val alias = s"${spec.agg.sqlName}_${if (spec.column == "*") "all" else spec.column}"

    if (spec.countExactCompat && spec.agg == AggKind.Count &&
        spec.sampling != SamplingStrategy.Exact) {
      // A4: answer COUNT from the exact stored total even when sampling
      return base.agg(count(lit(1)).cast("double").as(alias))
    }

    (spec.groupBy, spec.sampling) match {
      case (None, a: SamplingStrategy.Adaptive) =>
        val r = AdaptiveExecutor.run(base, valueCol, spec.agg, a)
        import spark.implicits._
        Seq((r.result.value, r.result.ciLower, r.result.ciUpper,
          r.result.samplesUsed, r.result.status.toString))
          .toDF(alias, s"${alias}_ci_lower", s"${alias}_ci_upper",
            s"${alias}_n", "status")
      case (Some(g), _) if spec.withCi =>
        t.approxAggCiBy(spec.agg, valueCol, Seq(col(g)), spec.sampling, alias,
          spec.confidence).orderBy(col(g))
      case (Some(g), _) =>
        t.approxAggBy(spec.agg, valueCol, Seq(col(g)), spec.sampling, alias)
          .orderBy(col(g))
      case (None, _) if spec.withCi =>
        t.approxAggCi(spec.agg, valueCol, spec.sampling, alias, spec.confidence)
      case (None, _) =>
        t.approxAgg(spec.agg, valueCol, spec.sampling, alias)
    }
  }
}
