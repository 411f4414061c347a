package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Checkpoints.StageOps
import graft.model.SamplingStrategy
import graft.model.SamplingStrategy._

/** A sampled DataFrame plus the scale factor to apply to SUM/COUNT
  * estimates (1 / inclusion probability). AVG is never scaled
  * (reference contract, parser.h:4-16).
  */
final case class SampledFrame(df: DataFrame, scaleFactor: Double, strategy: SamplingStrategy)

/** Physical sampling, Spark-first.
  *
  * The reference implements ~27 samplers as imperative strides over a flat
  * in-memory record array (SURVEY §2.4, custom_bplus_db.cpp:345-2048). On
  * Spark each design is one declarative transformation, and its
  * parallelism/region-splitting (threads in the reference) is the
  * partitioning of the scan — free and cluster-scalable:
  *
  *  - Uniform    → `df.sample` (per-row Bernoulli; pushed into the scan
  *                 iterator, no shuffle, no materialization).
  *  - Systematic → `key % step == offset` filter. Evaluated inside the scan
  *                 stage (whole-stage codegen); no shuffle; deterministic;
  *                 expressible in ANSI SQL so a foreign oracle can reproduce
  *                 it bit-for-bit. This is the honest Spark twin of the
  *                 reference's `rowid % step = 0` rewrite (executor.cpp:36-41).
  *  - Block      → `(key / blockSize) % skip == 0` — whole consecutive key
  *                 ranges, the cluster-sampling design of R14-R16. Also a
  *                 pure scan-stage filter.
  *  - Stratified → per-stratum Bernoulli via `df.stat.sampleBy`, or the
  *                 deterministic per-stratum systematic variant.
  *
  * 100 TB posture: every design here is a *narrow* transformation — a
  * predicate or per-row RNG inside the scan — so sampling cost is the scan
  * itself and parallelism is the number of input splits. Nothing collects,
  * nothing shuffles, nothing depends on a global row order (SURVEY §7.4.3:
  * we deliberately avoid `row_number()` over a global sort; key arithmetic
  * gives the same statistical design without the sort).
  */
object Sampling {

  /** Uniform Bernoulli sample (reference R1/R11).
    *
    * Implemented as a seeded `rand() < f` filter, NOT `df.sample`:
    * statistically identical (per-row Bernoulli, partition-seeded RNG,
    * scan-stage filter), but it emits no `Sample` node — so the
    * GraftExtensions auto-scaling rule, which gives *user* `TABLESAMPLE`/
    * `df.sample` aggregates estimator semantics, can never rewrite the
    * library's own estimator pipelines (whose moment aggregates must stay
    * raw; a scaled Σx with an unscaled n yields negative variance). */
  def uniform(df: DataFrame, fraction: Double, seed: Long = 42L): SampledFrame = {
    require(fraction > 0 && fraction <= 1.0)
    val sampled = if (fraction >= 1.0) df else df.filter(rand(seed) < fraction)
    SampledFrame(sampled, 1.0 / fraction, Uniform(fraction, seed))
  }

  /** Systematic sample by key arithmetic (reference R2/R3/R7/R8/R20-R23).
    * `key` must be a deterministic integer expression roughly uniform mod
    * `step` (e.g. a primary key, or `orderkey * 8 + linenumber`).
    */
  def systematic(df: DataFrame, key: Column, step: Long, offset: Long = 0L): SampledFrame =
    SampledFrame(df.filter(pmod(key, lit(step)) === lit(offset)),
      step.toDouble, Systematic(step, offset))

  /** Block / cluster sample (reference R4/R14/R15/R16): keep every `skip`-th
    * block of `blockSize` consecutive key values, whole blocks at a time. */
  def block(df: DataFrame, key: Column, blockSize: Long, skip: Long): SampledFrame =
    SampledFrame(df.filter(pmod(floor(key / lit(blockSize)), lit(skip)) === lit(0)),
      skip.toDouble, Block(blockSize, skip))

  /** Hard cap on the number of strata [[stratified]]/[[neymanStratified]]
    * will enumerate on the driver. Stratified designs only make statistical
    * sense over low-cardinality strata; a high-cardinality column here is
    * caller error, and the loud failure below beats an OOM'd driver. */
  val MaxStrata = 10000

  /** Stratified Bernoulli sample with equal FRACTION per stratum —
    * proportional allocation (n_h ∝ N_h). The reference's R18 equal-SIZE
    * allocation over value ntiles is [[equalAllocationStratified]].
    * Uses `sampleBy`, which needs
    * the stratum keys: they are computed with one small distinct job
    * (bounded by stratum cardinality, fine at any scale for low-cardinality
    * strata — the only kind the design makes sense for). Fails with
    * `IllegalArgumentException` above [[MaxStrata]] distinct strata; the
    * probe is `limit(MaxStrata + 1)`-bounded so the driver never holds more
    * than the cap regardless of the column's true cardinality. For
    * high-cardinality keys use [[stratifiedSystematic]], which needs no
    * driver-side stratum enumeration. */
  def stratified(df: DataFrame, strataCol: String, fraction: Double, seed: Long = 42L): SampledFrame = {
    val strata = df.select(strataCol).distinct()
      .limit(MaxStrata + 1).collect().map(_.get(0))
    require(strata.length <= MaxStrata,
      s"stratified: column '$strataCol' has more than $MaxStrata distinct " +
        "strata; a driver-enumerated stratified design is only meant for " +
        "low-cardinality strata — use stratifiedSystematic instead")
    val fractions = strata.map(s => s -> fraction).toMap
    SampledFrame(df.stat.sampleBy(col(strataCol), fractions, seed),
      1.0 / fraction, Stratified(strataCol, fraction, seed))
  }

  /** Variance-aware stratified sampling — the intent of the reference's
    * `adaptive_block_sample` (R17, custom_bplus_db.cpp:1273-1329: per-zone
    * variance → smaller blocks in high-variance zones), done properly as
    * Neyman allocation: sampling rate per stratum ∝ σ_h, normalized so the
    * expected total sample ≈ `totalFraction`·N. Two passes: a cheap
    * per-stratum moment job (one shuffle of 3 numbers per stratum), then
    * `sampleBy` with the computed fractions. The returned per-stratum scale
    * factors (1/f_h) are carried in a join-able DataFrame since a single
    * global scale no longer applies. */
  def neymanStratified(df: DataFrame, strataCol: String, value: Column,
      totalFraction: Double, seed: Long = 42L,
      minFraction: Double = 0.01): (SampledFrame, DataFrame) = {
    require(totalFraction > 0 && totalFraction <= 1.0)
    val stats = df.groupBy(col(strataCol)).agg(
      count(value).as("n_h"), stddev_samp(value).as("sd_h"))
      .limit(MaxStrata + 1).collect()
    require(stats.length <= MaxStrata,
      s"neymanStratified: column '$strataCol' has more than $MaxStrata " +
        "distinct strata — driver-side allocation is for low-cardinality " +
        "strata only; use stratifiedSystematic for high-cardinality keys")
    val weights = stats.map { r =>
      val n = r.getLong(1).toDouble
      val sd = if (r.isNullAt(2) || r.getDouble(2) <= 0) 1e-9 else r.getDouble(2)
      (r.get(0), n, n * sd)
    }
    val totalN = weights.map(_._2).sum
    val totalW = weights.map(_._3).sum
    val fractions = weights.map { case (k, n, w) =>
      val f = math.min(1.0, math.max(minFraction,
        totalFraction * totalN * (w / totalW) / n))
      k -> f
    }.toMap
    val sampled = df.stat.sampleBy(col(strataCol), fractions, seed)
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val scales = spark.createDataFrame(
      fractions.toSeq.map { case (k, f) =>
        org.apache.spark.sql.Row(k, 1.0 / f)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(strataCol,
          df.schema(strataCol).dataType),
        org.apache.spark.sql.types.StructField("strata_scale",
          org.apache.spark.sql.types.DoubleType))))
    (SampledFrame(sampled, 1.0 / totalFraction, Stratified(strataCol, totalFraction, seed)),
      scales)
  }

  /** Reference R18's actual design (custom_bplus_db.cpp:1331-1379): sort by
    * `value`, cut `strataCount` equal-size strata (ntile), take the same
    * number of evenly-spaced samples from EACH stratum (equal-size
    * allocation; within-stratum stride = floor(N_h / samplesPerStratum)).
    * Fully deterministic given a total tie-break order → ANSI-SQL
    * expressible and oracle-matchable.
    *
    * Scale note: the global `ntile` is a total sort — the one design here
    * that is not a pure scan-stage filter, faithfully mirroring the
    * reference's sort-based construction. At 100 TB, cut strata on value
    * RANGES from `approx_percentile` boundaries instead (same estimator,
    * boundaries collected once); this exact-ntile form is the
    * oracle-checkable semantics statement.
    *
    * Output gains `stratum` (1-based), `n_h` (stratum population size) —
    * the per-stratum expansion weight is n_h / n_sampled_h. */
  def equalAllocationStratified(df: DataFrame, value: Column, tieBreak: Column,
      strataCount: Int, samplesPerStratum: Int): DataFrame = {
    require(strataCount >= 1 && samplesPerStratum >= 1)
    val w = org.apache.spark.sql.expressions.Window.orderBy(value, tieBreak)
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(value, tieBreak)
    val wh = org.apache.spark.sql.expressions.Window.partitionBy(col("stratum"))
    df.withColumn("stratum", ntile(strataCount).over(w))
      .withColumn("rn", row_number().over(ws))
      .withColumn("n_h", count(lit(1)).over(wh))
      .withColumn("step_h",
        greatest(lit(1L), floor(col("n_h") / lit(samplesPerStratum))))
      .filter(pmod(col("rn") - 1, col("step_h")) === 0 &&
        col("rn") <= col("step_h") * lit(samplesPerStratum.toLong))
      .drop("rn", "step_h")
  }

  /** Deterministic Neyman allocation (driver-gated twin of
    * [[neymanStratified]]): per-stratum systematic steps derived from EXACT
    * pilot moments, so the selected row set is a pure function of the data —
    * oracle-expressible. Allocation math (computed on the driver from one
    * tiny distributed moment job, fixed operation order so a foreign engine
    * reproduces the same IEEE doubles):
    *
    *   sd_h   = sqrt((s2_h − s_h²/n_h) / (n_h − 1))   (moments from exact decimal sums)
    *   w_h    = n_h · sd_h ;  W = Σ w_h  (folded in stratum sort order)
    *   f_h    = min(1, max(minFraction, totalFraction · N · w_h / (W · n_h)))
    *   step_h = max(1, floor(1/f_h + 0.5))
    *
    * Sample = rows with `key % step_h == 0` in stratum h. Returns the
    * sampled frame and the per-stratum steps (the per-stratum scale for SUM
    * estimates is step_h itself). */
  def neymanSystematic(df: DataFrame, strataCol: String, value: Column,
      key: Column, totalFraction: Double, minFraction: Double = 0.01): (DataFrame, Seq[(String, Long)]) = {
    require(totalFraction > 0 && totalFraction <= 1.0)
    val dec = value.cast("decimal(18,2)")
    val stats = df.groupBy(col(strataCol)).agg(
      count(value).as("n_h"),
      sum(dec).cast("double").as("s_h"),
      sum(dec * dec).cast("double").as("s2_h"))
      .collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1) // fixed fold order
    val weights = stats.map { case (k, n, s, s2) =>
      val nd = n.toDouble
      val sd = if (n > 1) math.sqrt((s2 - s * s / nd) / (nd - 1.0)) else 0.0
      (k, nd, nd * math.max(sd, 1e-9))
    }
    val totalN = weights.map(_._2).sum
    val totalW = weights.foldLeft(0.0)((acc, w) => acc + w._3) // sort order
    val steps = weights.map { case (k, n, wgt) =>
      val f = math.min(1.0, math.max(minFraction,
        totalFraction * totalN * wgt / (totalW * n)))
      k -> math.max(1L, math.floor(1.0 / f + 0.5).toLong)
    }
    val stepCol = steps.tail.foldLeft(
      when(col(strataCol) === steps.head._1, lit(steps.head._2))) {
      case (acc, (k, st)) => acc.when(col(strataCol) === k, lit(st))
    }.otherwise(lit(1L))
    (df.filter(pmod(key, stepCol) === 0), steps.toSeq)
  }

  /** Deterministic stratified-systematic with ONE shared step — proportional
    * allocation (each stratum contributes ∝ its size); SQL-expressible,
    * unlike `sampleBy`. */
  def stratifiedSystematic(df: DataFrame, strataCol: String, key: Column, step: Long): SampledFrame =
    SampledFrame(df.filter(pmod(key, lit(step)) === lit(0)),
      step.toDouble, Systematic(step, 0L))

  /** Dual-rate sample (reference R9 `dual_pointer_sample`): union of a
    * coarse stride (`key % coarseStep == 0`) and a fine stride on offset 1
    * (`key % fineStep == 1`). Inclusion probability by inclusion-exclusion:
    * 1/c + 1/f − overlap, where the residue classes intersect (CRT) iff
    * gcd(c, f) divides 1, i.e. gcd == 1, with density 1/(c·f). */
  def dualRate(df: DataFrame, key: Column, coarseStep: Long, fineStep: Long): SampledFrame = {
    val strategy = DualRate(coarseStep, fineStep)
    val sampled = df.filter(pmod(key, lit(coarseStep)) === lit(0) ||
      pmod(key, lit(fineStep)) === lit(1))
    SampledFrame(sampled, strategy.scaleFactor, strategy)
  }

  /** Gather rows whose key is in an explicit index list (reference R27
    * `get_records_by_indices`, custom_bplus_db.cpp:1820-1836). Small lists
    * become an IN-filter in the scan; large ones a broadcast semi-join. */
  def byIndex(df: DataFrame, key: Column, indices: Seq[Long]): DataFrame =
    if (indices.size <= 1000) df.filter(key.isin(indices: _*))
    else {
      val idxDf = df.sparkSession.createDataFrame(
        indices.map(Tuple1(_))).toDF("__idx")
      df.join(broadcast(idxDf), key === col("__idx"), "left_semi")
    }

  /** Deterministic PPS (probability-proportional-to-size) Poisson sample —
    * the unequal-probability design the equal-probability family can't
    * express: big rows are more likely sampled, and the Horvitz–Thompson
    * estimator `Σ y_i / p_i` over the sample is unbiased for `Σ y` with far
    * lower variance when y correlates with the size column.
    *
    * Row i is kept iff `hash(key_i) < p_i · M` where the affine hash is
    * uniform on [0, M) and `p_i = min(1, f·N·size_i / Σsize)` (so E[n] =
    * f·N absent clamping). Fully deterministic given the key → replayable
    * by any engine; the pre-mod keeps 64-bit arithmetic overflow-free for
    * any key magnitude.
    *
    * Scale shape: one tiny moments job (COUNT + exact decimal Σsize →
    * two driver scalars), then a pure scan-stage filter. Output keeps
    * `pps_p`; estimate SUMs as `Σ (y/pps_p)` **through decimal** — the HT
    * terms are doubles and a raw double sum is partition-order dependent.
    *
    * @return (sampled frame with `pps_p`, N, Σsize) */
  def pps(df: DataFrame, sizeCol: Column, key: Column,
      targetFraction: Double): (DataFrame, Long, Double) = {
    require(targetFraction > 0 && targetFraction <= 1.0)
    val m = 1000003L
    val row = df.agg(count(lit(1)),
      sum(sizeCol.cast("decimal(18,2)")).cast("double")).collect()(0)
    val (n, s) = (row.getLong(0), row.getDouble(1))
    val c = targetFraction * n // one driver multiply, mirrored by oracles
    val p = least(lit(1.0), lit(c) * sizeCol / lit(s))
    val h = pmod(pmod(key, lit(m)) * lit(1299709L) + lit(104729L), lit(m))
    (df.withColumn("pps_p", p).filter(h < col("pps_p") * lit(m.toDouble)), n, s)
  }

  /** Deterministic fixed-size weighted sample — priority sampling
    * (Duffield, Lund & Thorup, "Priority sampling for estimation of
    * arbitrary subset sums", JACM 2007). Where [[pps]] is a Poisson
    * design (random sample SIZE, expected f·N), priority sampling fixes
    * the size at exactly k while keeping probability-proportional-to-size
    * semantics, and its threshold estimator is unbiased with
    * near-optimal variance among fixed-size weighted designs.
    *
    * Row i gets priority `q_i = w_i · M / h_i` with `h_i` a deterministic
    * affine hash in [1, M] (the 1/h_i plays the role of 1/uniform(0,1]);
    * the sample is the top k by priority, and the threshold τ is the
    * (k+1)-th priority (0 when the population has ≤ k rows — the sample
    * is then exhaustive and the estimator degenerates to the exact sum).
    * Subset-sum estimator: `Σ_{top-k} max(w_i, τ)`.
    *
    * Scale shape: the priority is a scan-stage expression and the top
    * (k+1) runs as `TakeOrderedAndProject` — per-partition bounded heaps,
    * only k+1 rows per partition ever move, no global sort. Ties are
    * broken by `key`, so the selected set — and therefore the estimate —
    * is bit-reproducible in any engine (the hash-gate contract).
    *
    * Weights must be NON-NEGATIVE (the design's domain) — ENFORCED
    * IN-PLAN: an `assert_true` fused into the scan-stage select fails the
    * job with a named error on the first negative weight (the
    * [[graft.operators.Multimodal]] packSlotKeys pattern — round-12
    * verdict item 4). A negative weight would get a negative priority,
    * never be sampled, and silently bias the subset-sum estimate. Zero
    * weights are fine (sampled only once every positive weight is,
    * estimator contribution 0 when τ=0); NULL weights pass the guard but
    * are FILTERED OUT before the top-k: a null weight means "no weight",
    * and the DLT design has no place for it. (Without the filter, a
    * population with fewer than k+1 non-null weights would let null rows
    * pad the top-(k+1): the count===k+1 test in [[prioritySumEstimate]]
    * then sets τ to the minimum NON-null priority instead of 0, and each
    * padded null row contributes greatest(null, τ)=τ to the sum while
    * inflating n_used — an upward bias. Round-13 ADVICE.)
    *
    * @return the top-(k+1) frame `(ps_key, ps_w, ps_prio)`, priority
    *         descending. Feed to [[prioritySumEstimate]]. */
  def prioritySample(df: DataFrame, key: Column, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val m = 1000003L
    val h = pmod(pmod(col("ps_key"), lit(m)) * lit(1299709L) + lit(104729L),
      lit(m)) + lit(1L)
    val wRaw = weight.cast("double")
    val guard = assert_true(wRaw.isNull || wRaw >= 0.0,
      lit("prioritySample weight contract violated: weights must be " +
        "non-negative — a negative weight gets a negative priority, is " +
        "never sampled, and silently biases the subset-sum estimate"))
    df.select(key.as("ps_key"), when(guard.isNull, wRaw).as("ps_w"))
      .filter(col("ps_w").isNotNull)
      .withColumn("ps_prio", col("ps_w") * lit(m.toDouble) / h)
      .orderBy(col("ps_prio").desc, col("ps_key").asc)
      .limit(k + 1)
  }

  /** Threshold estimator over a [[prioritySample]] result: one row
    * `(sum_est, tau, n_used)`. The window/aggregate here run over ≤ k+1
    * rows — driver-bounded by construction, never by the input size. The
    * `max(w, τ)` terms are doubles, so they sum through decimal after a
    * fixed rounding (partition-order-independent, cross-engine exact). */
  def prioritySumEstimate(topKPlus1: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the ≤ k+1 sample rows feed TWO plan branches (τ and the ranked
    // filter); materialize them once (trivial — hundreds of rows) so the
    // underlying TakeOrderedAndProject SCAN runs once, not per branch —
    // at 100 TB the double table scan is the whole query cost
    val top = topKPlus1.staged
    val w = Window.orderBy(col("ps_prio").desc, col("ps_key").asc)
    val ranked = top.withColumn("ps_rn", row_number().over(w))
    val tau = ranked.agg(
      when(count(lit(1)) === lit(k + 1), min(col("ps_prio")))
        .otherwise(lit(0.0)).as("tau"))
    ranked.filter(col("ps_rn") <= lit(k))
      .crossJoin(broadcast(tau))
      .agg(
        sum(round(greatest(col("ps_w"), col("tau")), 4)
          .cast("decimal(28,4)")).cast("double").as("sum_est"),
        count(lit(1)).as("n_used"))
  }

  /** [[prioritySumEstimate]] with the design's own error bar — the
    * Duffield–Lund–Thorup variance estimator. DLT's central result is
    * that priority sampling has ZERO covariance between distinct items
    * (JACM 2007, Thm 1), so the total's variance is the sum of per-item
    * variances, and `Σ_{i∈S} max(w_i, τ)·max(τ − w_i, 0)` over the k
    * sampled items estimates it unbiasedly (τ and the weights share
    * units: priority q_i = w_i/u_i with u_i uniform (0,1]). When the
    * sample is exhaustive (τ = 0) every term vanishes — the estimate is
    * exact and the CI collapses to a point, as it should.
    *
    * Same scale/determinism contract as [[prioritySumEstimate]]: the
    * aggregate runs over ≤ k+1 rows, each term is fixed-rounded and
    * summed through decimal, and the final interval is one closed-form
    * IEEE expression — bit-replayable by a foreign engine (q166).
    *
    * @return one row `(sum_est, ci_lower, ci_upper, n_used)`. */
  def prioritySumEstimateCi(topKPlus1: DataFrame, k: Int,
      confidence: Double = 0.95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val z = graft.exec.Estimators.zScore(confidence)
    // one scan, two branches — see prioritySumEstimate
    val top = topKPlus1.staged
    val w = Window.orderBy(col("ps_prio").desc, col("ps_key").asc)
    val ranked = top.withColumn("ps_rn", row_number().over(w))
    val tau = ranked.agg(
      when(count(lit(1)) === lit(k + 1), min(col("ps_prio")))
        .otherwise(lit(0.0)).as("tau"))
    ranked.filter(col("ps_rn") <= lit(k))
      .crossJoin(broadcast(tau))
      .agg(
        sum(round(greatest(col("ps_w"), col("tau")), 4)
          .cast("decimal(28,4)")).cast("double").as("sum_est"),
        sum(round(greatest(col("ps_w"), col("tau")) *
            greatest(col("tau") - col("ps_w"), lit(0.0)), 4)
          .cast("decimal(38,4)")).cast("double").as("var_est"),
        count(lit(1)).as("n_used"))
      .select(col("sum_est"),
        (col("sum_est") - lit(z) * sqrt(col("var_est"))).as("ci_lower"),
        (col("sum_est") + lit(z) * sqrt(col("var_est"))).as("ci_upper"),
        col("n_used"))
  }

  /** Apply a [[SamplingStrategy]] given the table's sampling key. */
  def apply(df: DataFrame, strategy: SamplingStrategy, key: => Column): SampledFrame =
    strategy match {
      case Exact                       => SampledFrame(df, 1.0, Exact)
      case Uniform(f, seed)            => uniform(df, f, seed)
      case Systematic(step, off)       => systematic(df, key, step, off)
      case Block(bs, skip)             => block(df, key, bs, skip)
      case DualRate(coarse, fine)      => dualRate(df, key, coarse, fine)
      case Stratified(c, f, seed)      => stratified(df, c, f, seed)
      case a: SamplingStrategy.Adaptive =>
        throw new IllegalArgumentException(
          s"Adaptive($a) is executed by graft.exec.AdaptiveExecutor, not Sampling()")
      case p: SamplingStrategy.Priority =>
        throw new IllegalArgumentException(
          s"Priority($p) needs the value column — routed by SpecExecutor to " +
            "prioritySample/prioritySumEstimate, not Sampling()")
      case f: SamplingStrategy.FileLevel =>
        throw new IllegalArgumentException(
          s"FileLevel($f) re-plans the scan — routed by SpecExecutor to " +
            "sources.FileSampling, not Sampling()")
    }
}
