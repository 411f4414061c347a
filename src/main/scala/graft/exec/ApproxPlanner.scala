package graft.exec

import graft.model.{ApproxSpec, SamplingStrategy}

/** Reference-compat planner (SURVEY §7.1's `ApproxPlanner`): reproduces the
  * reference CLI's fixed policy tables so a user of the reference gets the
  * SAME sampling decisions from `--compat` mode, while the default path
  * keeps the (better) adaptive CLT loop.
  *
  * Sources mirrored:
  *  - error→fraction table: enhanced_aqe_cli.py:243-250
  *    (≤1%→20%, ≤2%→15%, ≤5%→10%, else 5%)
  *  - size-based sampler router: enhanced_aqe_cli.py:178-186
  *    (>50k records→memory-stride, >10k→direct-access, else sequential)
  *  - query-shape method router: enhanced_aqe_cli.py:116-131
  *    (SUM/COUNT large→'revolutionary', SUM/COUNT→'clt', AVG→'random',
  *     GROUP BY→'parallel', else 'adaptive')
  *  - `--method` choices: enhanced_aqe_cli.py:38-80 METHODS table
  *    (random | clt | block | adaptive | parallel | revolutionary), plus
  *    `systematic` (exposed by bindings.cpp:50-101 but not the Python CLI).
  *
  * Spark mapping rationale: the reference's "memory stride" IS systematic
  * sampling (a stride over the record array → a key-mod stride over rows);
  * "direct access" is uniform random probing → Bernoulli; "sequential" reads
  * a contiguous region → block/cluster sampling; "parallel" is thread
  * fan-out, which Spark gives every design for free via partitions, so it
  * maps to Bernoulli over all partitions.
  */
object ApproxPlanner {

  /** Fixed error→sample-fraction policy (enhanced_aqe_cli.py:243-250). */
  def compatFractionForError(errorPct: Double): Double =
    if (errorPct <= 1.0) 0.20
    else if (errorPct <= 2.0) 0.15
    else if (errorPct <= 5.0) 0.10
    else 0.05

  /** Size-based sampler choice (enhanced_aqe_cli.py:178-186), expressed as
    * the Spark-side design for a given fraction. */
  def routeBySize(totalRecords: Long, fraction: Double, seed: Long): SamplingStrategy = {
    val step = math.max(1L, math.round(1.0 / fraction))
    if (totalRecords > 50000L)
      SamplingStrategy.Systematic(step) // "memory stride"
    else if (totalRecords > 10000L)
      SamplingStrategy.Uniform(fraction, seed) // "direct access"
    else
      SamplingStrategy.Block(blockSize = 64L, skip = step) // "sequential"
  }

  /** Query-shape method recommendation (enhanced_aqe_cli.py:116-131). */
  def optimalMethod(sql: String, totalRecords: Option[Long]): String = {
    val u = sql.toUpperCase
    if (u.contains("SUM(") || u.contains("COUNT(")) {
      if (totalRecords.exists(_ > 100000L)) "revolutionary" else "clt"
    } else if (u.contains("AVG(")) "random"
    else if (u.contains("GROUP BY")) "parallel"
    else "adaptive"
  }

  /** Resolve an explicit `--method` name to a [[SamplingStrategy]].
    * `errorPct` feeds the CLT/adaptive designs; `fraction` the fixed-rate
    * ones (default 10%, the reference's random-path default). */
  def strategyForMethod(method: String, fraction: Double = 0.10,
      errorPct: Double = 5.0, totalRecords: Option[Long] = None,
      seed: Long = 42L, compat: Boolean = false): SamplingStrategy = {
    val step = math.max(1L, math.round(1.0 / fraction))
    method.trim.toLowerCase match {
      case "random" | "parallel" => SamplingStrategy.Uniform(fraction, seed)
      case "systematic"          => SamplingStrategy.Systematic(step)
      case "block" | "sequential" => SamplingStrategy.Block(blockSize = 64L, skip = step)
      case "clt" | "adaptive" =>
        if (compat) SamplingStrategy.Uniform(compatFractionForError(errorPct), seed)
        else SamplingStrategy.Adaptive(errorPct, seed = seed)
      case "revolutionary" =>
        routeBySize(totalRecords.getOrElse(100001L), fraction, seed)
      case "file" =>
        // the only speedup-bearing design on columnar storage (FileSampling
        // scaladoc): keep every step-th part-file, never open the rest
        SamplingStrategy.FileLevel(step.toInt)
      case "priority" =>
        // extension: fixed-size weighted sample; k from fraction × known
        // size when available, else a 1000-row budget
        SamplingStrategy.Priority(
          totalRecords.map(n => math.max(1L, math.round(n * fraction))
            .min(1000000L).toInt).getOrElse(1000))
      case other =>
        throw new IllegalArgumentException(
          s"unknown method '$other' (random|clt|block|adaptive|parallel|revolutionary|systematic|file|priority)")
    }
  }

  /** Apply compat/method/seed CLI policy to a parsed spec.
    *
    *  - `--compat --error E` → fixed fraction from the reference table
    *    (instead of the adaptive loop the default path runs);
    *  - `--method M` → explicit design override;
    *  - `--seed S` → re-seed whatever Bernoulli design was chosen.
    */
  def plan(spec: ApproxSpec, method: Option[String], compat: Boolean,
      seed: Option[Long], totalRecords: Option[Long] = None): ApproxSpec = {
    val s = seed.getOrElse(42L)
    val errorPct = spec.sampling match {
      case a: SamplingStrategy.Adaptive => a.errorThresholdPct
      case _                            => 5.0
    }
    val fraction = spec.sampling match {
      case u: SamplingStrategy.Uniform => u.fraction
      case _                           => 0.10
    }
    val resolved: SamplingStrategy = method match {
      case Some(m) =>
        strategyForMethod(m, fraction, errorPct, totalRecords, s, compat)
      case None =>
        spec.sampling match {
          case a: SamplingStrategy.Adaptive if compat =>
            // reference behaviour for --error: fixed fraction, no loop
            SamplingStrategy.Uniform(compatFractionForError(a.errorThresholdPct), s)
          case u: SamplingStrategy.Uniform if seed.isDefined =>
            u.copy(seed = s)
          case a: SamplingStrategy.Adaptive if seed.isDefined =>
            a.copy(seed = s)
          case other => other
        }
    }
    spec.copy(sampling = resolved)
  }
}
