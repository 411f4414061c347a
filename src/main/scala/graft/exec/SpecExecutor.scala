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
      case (None, fl: SamplingStrategy.FileLevel) =>
        // the only design that skips I/O on columnar storage: re-plan the
        // scan over every step-th part-file of the registered table and
        // never open the rest. Estimation is cluster sampling with files
        // as clusters: scale = totalFiles/picked, CI from between-file
        // variance — the design-honest interval (a row-level SRS formula
        // would under-cover whenever files are internally homogeneous).
        val sf = graft.sources.FileSampling.fromFiles(
          spark, base0.inputFiles.toIndexedSeq, fl.step, fl.offset)
        val sampled = spec.where.map(w => sf.df.filter(expr(w))).getOrElse(sf.df)
        val scale = sf.scaleFactor
        if (spec.withCi) spec.agg match {
          case AggKind.Sum => Estimators.blockCiSum(sampled,
            input_file_name(), valueCol, scale, alias, spec.confidence)
          case AggKind.Count => Estimators.blockCiSum(sampled,
            input_file_name(), lit(1L), scale, alias, spec.confidence)
          case AggKind.Avg => Estimators.blockCiAvg(sampled,
            input_file_name(), valueCol, scale, alias, spec.confidence)
          case other => throw new IllegalArgumentException(
            s"file-level CI undefined for $other (SUM/COUNT/AVG only)")
        } else spec.agg match {
          case AggKind.Sum => sampled.agg(
            (sum(valueCol.cast("decimal(18,2)")).cast("double") * lit(scale)).as(alias))
          case AggKind.Count => sampled.agg(
            (count(lit(1)).cast("double") * lit(scale)).as(alias))
          case AggKind.Avg => sampled.agg(avg(valueCol).as(alias))
          case other => throw new IllegalArgumentException(
            s"file-level sampling undefined for $other (SUM/COUNT/AVG only)")
        }
      case (Some(_), _: SamplingStrategy.FileLevel) =>
        throw new IllegalArgumentException(
          "file-level sampling does not support GROUP BY (group coverage per " +
            "file is not controlled); use a row-level design (--method systematic)")
      case (grp, p: SamplingStrategy.Priority) =>
        // fixed-size weighted design: content-hash key (same rationale as
        // AqeSession's no-key table — reproducible on any partitioning),
        // weight = the aggregated value (COUNT weights every row 1, where
        // the design degenerates to uniform-without-replacement — still
        // unbiased via the same threshold estimator)
        val pkey = abs(xxhash64(struct(base.columns.map(col).toIndexedSeq: _*)))
        val weight = spec.agg match {
          // the design's domain is non-negative weights (a negative weight
          // gets a negative priority, is never sampled, and silently biases
          // the threshold estimator — Sampling.prioritySample scaladoc);
          // arbitrary CLI queries get a loud per-row guard, not silent bias
          case AggKind.Sum => when(valueCol < 0, raise_error(concat(
              lit("priority sampling requires non-negative weights; got "),
              valueCol.cast("string"),
              lit(" — use a row-level design (--method systematic) for " +
                "signed measures")))).otherwise(valueCol)
          case AggKind.Count => lit(1.0)
          case other => throw new IllegalArgumentException(
            s"priority sampling undefined for $other (SUM/COUNT only)")
        }
        grp match {
          case None =>
            val top = Sampling.prioritySample(base, pkey, weight, p.k)
            Sampling.prioritySumEstimate(top, p.k)
              .select(col("sum_est").as(alias), col("n_used").as(s"${alias}_n"))
          case Some(g) =>
            // GROUP BY: the fixed k becomes a PER-GROUP budget — every
            // group gets its own size-k sample and threshold τ_g
            // (Skew.priorityPerKey, shard-salted two-phase top-(k+1); a
            // hot group never pins one reducer)
            graft.operators.Skew.priorityPerKey(base, Seq(g), pkey, weight, p.k)
              .select(col(g), col("sum_est").as(alias),
                col("n_used").as(s"${alias}_n"))
              .orderBy(col(g))
        }
      case (None, a: SamplingStrategy.Adaptive) =>
        val r = AdaptiveExecutor.run(base, valueCol, spec.agg, a)
        import spark.implicits._
        Seq((r.result.value, r.result.ciLower, r.result.ciUpper,
          r.result.samplesUsed, r.result.status.toString))
          .toDF(alias, s"${alias}_ci_lower", s"${alias}_ci_upper",
            s"${alias}_n", "status")
      case (Some(g), a: SamplingStrategy.Adaptive) =>
        // GROUP BY adaptive: the per-group deterministic CLT ladder
        // (AdaptiveExecutor.runGroupedDeterministic) — each group stops at
        // ITS first converged round, sub-floor groups route exact. Key =
        // content hash (the no-key rationale above). SUM is the expansion
        // estimator, AVG the same moment ladder with a mean (ratio) CI and
        // no scale factor, COUNT the n-moment alone with a
        // finite-population Bernoulli margin.
        val ladderAgg = spec.agg match {
          case AggKind.Sum => "sum"
          case AggKind.Avg => "avg"
          case AggKind.Count => "count"
          case other => throw new IllegalArgumentException(
            s"grouped adaptive undefined for $other (SUM/AVG/COUNT only — " +
              "use a row-level design for other aggregates)")
        }
        val akey = abs(xxhash64(struct(base.columns.map(col).toIndexedSeq: _*)))
        // valueCol is already lit(1L) for COUNT(*); for COUNT(col) the
        // ladder's count(xc) moment is non-null-aware, matching SQL
        AdaptiveExecutor.runGroupedDeterministic(base, valueCol, akey,
            col(g), errorThresholdPct = a.errorThresholdPct,
            confidence = a.confidence, agg = ladderAgg)
          .select(col("group").as(g), col("sum_est").as(alias),
            col("ci_lower").as(s"${alias}_ci_lower"),
            col("ci_upper").as(s"${alias}_ci_upper"),
            col("n_used").as(s"${alias}_n"), col("status"))
          .orderBy(col(g))
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
