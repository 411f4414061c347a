package graft.model

/** Core model for the approximate-query engine.
  *
  * Mirrors the *capabilities* of the reference
  * (saumyarr8/ApproximateQueryEngine) — see SURVEY.md §1/§2 — re-expressed as
  * plain Scala ADTs that a Spark-side planner/executor consumes. The
  * reference's ~27 physical samplers (custom_bplus_db.cpp:345-2048) collapse
  * to the distinct *statistical designs* below; thread/region mechanics are
  * Spark partitions.
  */
sealed trait AggKind { def sqlName: String }
object AggKind {
  case object Sum   extends AggKind { val sqlName = "sum"   }
  case object Count extends AggKind { val sqlName = "count" }
  case object Avg   extends AggKind { val sqlName = "avg"   }
  case object Min   extends AggKind { val sqlName = "min"   } // extension: absent in reference (SURVEY §2.3)
  case object Max   extends AggKind { val sqlName = "max"   } // extension

  def parse(s: String): AggKind = s.trim.toLowerCase match {
    case "sum"   => Sum
    case "count" => Count
    case "avg" | "mean" => Avg
    case "min"   => Min
    case "max"   => Max
    case other   => throw new IllegalArgumentException(s"unsupported aggregate: $other")
  }
}

/** Statistical sampling designs (SURVEY §2.4). All deterministic given their
  * parameters — Bernoulli via fixed seed, the others via key arithmetic —
  * which is what makes sampled queries testable and (for key-mod designs)
  * oracle-matchable in any other SQL engine.
  */
sealed trait SamplingStrategy {
  /** Multiplier applied to SUM/COUNT estimates (1/inclusion-probability). */
  def scaleFactor: Double
}
object SamplingStrategy {
  /** No sampling: exact execution. */
  case object Exact extends SamplingStrategy { val scaleFactor = 1.0 }

  /** Per-row Bernoulli sampling (`df.sample`) — the idiomatic Spark default;
    * maps reference R1/R11 (custom_bplus_db.cpp:345-363, 856-882). */
  final case class Uniform(fraction: Double, seed: Long = 42L) extends SamplingStrategy {
    require(fraction > 0 && fraction <= 1.0, s"fraction must be in (0,1]: $fraction")
    def scaleFactor: Double = 1.0 / fraction
  }

  /** Systematic sampling: keep rows where `hash-free key arithmetic % step ==
    * offset`. The Spark twin of the reference's `rowid % step = 0` rewrite
    * (executor.cpp:36-41) and the R2/R3/R7/R8 stride family. Deterministic
    * and expressible in ANSI SQL → DuckDB-oracle-matchable. */
  final case class Systematic(step: Long, offset: Long = 0L) extends SamplingStrategy {
    require(step >= 1, s"step must be >= 1: $step")
    require(offset >= 0 && offset < step, s"offset must be in [0,step): $offset")
    def scaleFactor: Double = step.toDouble
  }

  /** Block/cluster sampling: keep every `skip`-th block of `blockSize`
    * consecutive key values (reference R4/R14/R15/R16,
    * custom_bplus_db.cpp:489-532, 1151-1271). Whole-block inclusion means the
    * variance estimator must account for the design effect (SURVEY §7.4.4). */
  final case class Block(blockSize: Long, skip: Long) extends SamplingStrategy {
    require(blockSize >= 1 && skip >= 1)
    def scaleFactor: Double = skip.toDouble
  }

  /** File-level cluster sampling (reference R29/R30 block modes + the S6
    * raw page reader, re-expressed for columnar storage): keep every
    * `step`-th part-file of the dataset and NEVER OPEN the rest. The one
    * design whose scan cost actually scales with the sampled fraction on
    * parquet — row-level designs filter inside the scan and still read
    * every row group (FileSampling scaladoc). Estimation treats files as
    * clusters: scale = totalFiles/pickedFiles, CI from between-file
    * variance (`Estimators.blockCiSum` over file ids). */
  final case class FileLevel(step: Int, offset: Int = 0) extends SamplingStrategy {
    require(step >= 1, s"step must be >= 1: $step")
    require(offset >= 0 && offset < step, s"offset must be in [0,step): $offset")
    def scaleFactor: Double = step.toDouble
  }

  /** Dual-rate sampling (reference R9 `dual_pointer_sample`): union of a
    * coarse stride (`key % coarseStep == 0`) and a fine stride on offset 1
    * (`key % fineStep == 1`). Deterministic key-mod design, so n is fixed
    * given the population; scale is 1/p by inclusion–exclusion. */
  final case class DualRate(coarseStep: Long, fineStep: Long) extends SamplingStrategy {
    require(coarseStep >= 2 && fineStep >= 2 && coarseStep != fineStep,
      s"strides must differ and be >= 2: ($coarseStep, $fineStep)")
    def scaleFactor: Double = {
      val overlap =
        if (BigInt(coarseStep).gcd(BigInt(fineStep)) == 1)
          1.0 / (coarseStep.toDouble * fineStep)
        else 0.0
      1.0 / (1.0 / coarseStep + 1.0 / fineStep - overlap)
    }
  }

  /** Stratified sampling: per-stratum fractions (reference R17/R18,
    * custom_bplus_db.cpp:1273-1379) via `df.stat.sampleBy` or per-stratum
    * systematic steps. */
  final case class Stratified(strataCol: String, fraction: Double, seed: Long = 42L)
      extends SamplingStrategy {
    require(fraction > 0 && fraction <= 1.0)
    def scaleFactor: Double = 1.0 / fraction
  }

  /** Priority sampling (extension; Duffield–Lund–Thorup JACM'07): the
    * fixed-size-k weighted design — top k rows by `weight·M/hash(key)`,
    * estimated with the threshold estimator `Σ max(w, τ)`. Unlike every
    * other design here the inclusion probability depends on the VALUE
    * column, so the estimator is not a flat multiplier: `scaleFactor` is
    * 1 and `SpecExecutor` routes to `Sampling.prioritySample` +
    * `prioritySumEstimate`. SUM/COUNT only (a fixed-size weighted design
    * has no meaningful plain AVG). */
  final case class Priority(k: Int) extends SamplingStrategy {
    require(k >= 1, s"k must be >= 1: $k")
    def scaleFactor: Double = 1.0
  }

  /** Adaptive CLT-validated sampling (reference R12/R13/R24/R28): staged
    * fractions grown until the CI margin meets `errorThresholdPct`. The
    * driver-side loop replaces the reference's fast/slow thread pools. */
  final case class Adaptive(
      errorThresholdPct: Double,
      initialFraction: Double = 0.01,
      growthFactor: Double = 2.0,
      maxFraction: Double = 0.5,
      maxRounds: Int = 6,
      confidence: Double = 0.95,
      seed: Long = 42L) extends SamplingStrategy {
    def scaleFactor: Double = 1.0 / initialFraction // per-round scale computed by the executor
  }
}

/** Convergence verdicts — semantics of custom_scheduler.hpp:8-13. */
sealed trait ApproximationStatus
object ApproximationStatus {
  case object Stable           extends ApproximationStatus
  case object Drifting         extends ApproximationStatus
  case object InsufficientData extends ApproximationStatus
  case object Failed           extends ApproximationStatus
}

/** Scalar approximate-query result (reference executor.h:5-14 `QueryResult`
  * + custom_scheduler.hpp:15-22 `CustomValidationResult`, unified). */
final case class ApproxResult(
    value: Double,
    ciLower: Double,
    ciUpper: Double,
    confidence: Double,
    samplesUsed: Long,
    status: ApproximationStatus,
    millis: Long) {
  def errorMargin: Double = (ciUpper - ciLower) / 2.0
  def relativeErrorPct: Double =
    if (value == 0.0) Double.PositiveInfinity else 100.0 * errorMargin / math.abs(value)
}

/** Parsed query + approximation directives — the engine's logical input
  * (reference parser.cpp:20-76 `Query` + the CLI flags that ride alongside). */
final case class ApproxSpec(
    agg: AggKind,
    column: String,
    table: String,
    where: Option[String] = None,
    groupBy: Option[String] = None,
    sampling: SamplingStrategy = SamplingStrategy.Exact,
    withCi: Boolean = false,
    confidence: Double = 0.95,
    /** Reference quirk A4 (SURVEY §2.3): enhanced CLI answers COUNT under
      * sampling with the exact stored total. Off by default (we scale). */
    countExactCompat: Boolean = false)
