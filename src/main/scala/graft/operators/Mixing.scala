package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing and exact-size sampling — how a pretraining pipeline turns
  * "we want 30% web, 30% code, 5% of everything else" into a row filter, and
  * how it draws an exact-n pseudo-random subset without a `rand()` that no
  * other engine can replay.
  *
  * Both designs ride on one deterministic affine hash of the row id,
  * `h(id) = (id·1299709 + 104729) mod 1000003` (primes; max |id|·1.3e6 keeps
  * 64-bit arithmetic overflow-free past 10^12 ids). Unlike raw `id % step`,
  * `h` is uniform modulo any step even when ids are structurally striped
  * (the fixtures assign `source = src(doc_id % 20)`, so raw-id strides that
  * share a factor with 20 would select all-or-nothing within a source).
  */
object Mixing {

  /** Take the highest-quality documents whose total token count fits
    * `budget` — WITHOUT the global sort the naive "ORDER BY quality DESC
    * take-while" needs (a total order over 100 TB is the one thing you
    * never want to materialize).
    *
    * Semantics (deterministic, engine-replayable): order docs by
    * (quality bucket DESC, id ASC) with `buckets` fixed-width quality
    * buckets on [0,1]; keep every doc whose inclusive running token sum
    * ≤ budget. Equivalently: whole buckets are taken best-first while they
    * fit; the one marginal bucket is taken as an id-ordered prefix.
    *
    * Scale shape: two histogram passes + one bounded window.
    *   1. per-bucket token totals (≤ `buckets` rows to the driver) pick
    *      the marginal bucket;
    *   2. the marginal bucket alone is re-histogrammed by id range
    *      (`boundaryRanges` rows to the driver) picking the marginal
    *      range;
    *   3. only the marginal RANGE — ~1/(buckets·boundaryRanges) of the
    *      corpus — pays a single-partition running-sum window.
    * Everything else is scan-stage filters. Compare q43/q141's documented
    * single-task sorts: this is the same selection problem solved with
    * the histogram recursion you would actually run at 100 TB. */
  def selectByQualityBudget(df: DataFrame, idCol: String, quality: Column,
      tokens: Column, budget: Long, buckets: Int = 1000,
      boundaryRanges: Int = 1024): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(buckets >= 2 && boundaryRanges >= 2, "need at least 2 buckets")
    val qb = least(floor(least(greatest(quality, lit(0.0)), lit(1.0))
      * lit(buckets)).cast("int"), lit(buckets - 1))
    val base = df.withColumn("__qb", qb)
      .withColumn("__tok", tokens.cast("long"))
    val hist = base.groupBy(col("__qb")).agg(sum(col("__tok")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var cum = 0L; var bStar = -1
    for (b <- (buckets - 1) to 0 by -1 if bStar < 0) {
      val t = hist.getOrElse(b, 0L)
      if (t > 0 && cum + t > budget) bStar = b else cum += t
    }
    if (bStar < 0) return df // everything fits
    val remaining = budget - cum
    val keepFull = base.filter(col("__qb") > bStar)
    // refine the marginal bucket by id range so the final running-sum
    // window touches ~1/boundaryRanges of it, not all of it
    val bdocs = base.filter(col("__qb") === bStar)
    val mm = bdocs.agg(min(col(idCol).cast("long")),
      max(col(idCol).cast("long"))).head
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val width = (mx - mn) / boundaryRanges + 1 // ≥ 1, covers mx
    val ranged = bdocs
      .withColumn("__k", col(idCol).cast("long") - lit(mn))
      .withColumn("__rid", expr(s"__k div ${width}L")) // exact long division
    val rhist = ranged.groupBy(col("__rid")).agg(sum(col("__tok")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var cum2 = 0L; var rStar = -1L
    for ((r, t) <- rhist if rStar < 0) {
      if (cum2 + t > remaining) rStar = r else cum2 += t
    }
    // rStar exists: the marginal bucket crosses `remaining` by construction
    val remaining2 = remaining - cum2
    val keepRanges = ranged.filter(col("__rid") < rStar).drop("__k", "__rid")
    val wPrefix = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = ranged.filter(col("__rid") === rStar)
      .withColumn("__cum", sum(col("__tok")).over(wPrefix))
      .filter(col("__cum") <= remaining2)
      .drop("__cum", "__k", "__rid")
    keepFull.union(keepRanges).union(boundary).drop("__qb", "__tok")
  }

  /** Deterministic pseudo-random priority in [0, 1000003). */
  def hashPriority(id: Column): Column =
    pmod(id.cast("long") * lit(1299709L) + lit(104729L), lit(1000003L))

  /** SQL text of [[hashPriority]] for oracle twins. */
  def hashPrioritySql(idExpr: String): String =
    s"(($idExpr * 1299709 + 104729) % 1000003)"

  /** Seeded variant of [[hashPriority]]: a different seed is a different
    * (affine-independent) permutation — epoch reshuffles without rand().
    * `h(id, s) = ((id + s·7919)·1299709 + 104729) mod 1000003`. */
  def hashPrioritySeeded(id: Column, seed: Long): Column =
    pmod((id.cast("long") + lit(seed * 7919L)) * lit(1299709L) + lit(104729L),
      lit(1000003L))

  /** SQL text of [[hashPrioritySeeded]]. */
  def hashPrioritySeededSql(idExpr: String, seed: Long): String =
    s"((($idExpr + ${seed * 7919L}) * 1299709 + 104729) % 1000003)"

  /** DETERMINISTIC GLOBAL SHUFFLE — the reproducible random training
    * order every data run needs (and must be able to REPLAY for a
    * restart or an audit; `rand()`-based orderings are neither). Total
    * order = (seeded hash, id): `orderBy` range-partitions on the sort
    * key and sorts locally — the scalable plan (no single-task sort; at
    * 100 TB this is one range exchange, the same cost as any global
    * sort-write). Different `seed` ⇒ different epoch permutation. */
  def shuffleDeterministic(df: DataFrame, idCol: String,
      seed: Long = 0L): DataFrame =
    df.orderBy(hashPrioritySeeded(col(idCol), seed), col(idCol))

  /** Shuffled fixed-count SHARDING for training output: `shard` =
    * seeded-hash mod `nShards` (adds the column; callers
    * `.write.partitionBy("shard")` or repartition on it). Hash sharding
    * balances counts to ±O(√(N/shards)) and assigns every epoch's shard
    * deterministically; within a shard, order by [[hashPrioritySeeded]]
    * for the intra-shard shuffle. */
  def assignShards(df: DataFrame, idCol: String, nShards: Int,
      seed: Long = 0L): DataFrame = {
    require(nShards >= 1)
    df.withColumn("shard",
      pmod(hashPrioritySeeded(col(idCol), seed), lit(nShards.toLong)))
  }

  /** Downsample each group to its configured rate: keep rows with
    * `h(id) % step == 0` where `step = stepPerGroup(group)` (≈ keep 1/step),
    * `defaultStep` elsewhere; a step of 1 keeps everything. Adds `mix_step`
    * (the row's expansion weight for reweighted corpus statistics).
    *
    * Scale shape: a pure scan-stage filter — no shuffle, no lookup table,
    * pushes past column pruning; the group→step map is a compiled CASE
    * expression (corpus mixes have tens of sources, not millions — for a
    * per-key table of that size you would broadcast-join instead). */
  def corpusMix(df: DataFrame, idCol: String, groupCol: String,
      stepPerGroup: Map[String, Long], defaultStep: Long = 1L): DataFrame = {
    require(defaultStep >= 1 && stepPerGroup.values.forall(_ >= 1))
    val step = stepPerGroup.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultStep)) { case (acc, (g, s)) =>
        when(col(groupCol) === lit(g), lit(s)).otherwise(acc)
      }
    df.withColumn("mix_step", step)
      .filter(pmod(hashPriority(col(idCol)), col("mix_step")) === 0)
  }

  /** Exact-n pseudo-random sample per group, without replacement: the n rows
    * with the smallest hash priority (id tiebreak) in each group. The
    * deterministic twin of per-stratum reservoir sampling — any engine
    * replays the same row set.
    *
    * Scale shape: one shuffle on the group key, and the window's sort is a
    * per-group top-n (rank ≤ n prunes at the sort). For a single global
    * sample prefer [[exactNGlobal]], which compiles to a distributed
    * TakeOrderedAndProject (per-partition heaps, no full sort). */
  def exactNPerGroup(df: DataFrame, idCol: String, groupCol: String,
      n: Int): DataFrame = {
    require(n >= 1)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashPriority(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Exact-n global sample: ORDER BY priority LIMIT n — Spark plans this as
    * TakeOrderedAndProject (bounded per-partition heaps merged on one
    * reducer; only n rows ever move). */
  def exactNGlobal(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.orderBy(hashPriority(col(idCol)), col(idCol)).limit(n)

  /** Temperature (α) sampling across groups — the multilingual-pretraining
    * rebalance: draw `t_g = max(1, ⌊scale · n_g^α⌋)` docs from each group
    * of size `n_g`, so α = 1 keeps natural proportions, α → 0 flattens
    * toward uniform, and 0 < α < 1 up-weights the tail (the public
    * multilingual-LM recipe). The draw itself is [[exactNPerGroup]]'s
    * deterministic smallest-hash-priority rule with a per-group n.
    *
    * Exactness notes: t_g derives from the group size alone (no cross-group
    * float normalization — a Σ n^α over groups would sum in partition order
    * and break bit-reproducibility; callers wanting a corpus-size budget
    * pick `scale` from the group-count table, which is #groups-sized).
    * α = 0.5 routes through `sqrt` (IEEE correctly-rounded in every
    * engine) rather than `pow` (1-ulp licensed, engine-dependent).
    *
    * Scale shape: one tiny per-group count agg broadcast back, then the
    * per-group top-t_g window — shuffle on the group key. Output adds
    * `mix_target` (t_g). */
  /** Derive [[corpusMix]] steps that rebalance the corpus toward a TARGET
    * mixture under a row budget — the static importance-reweighting pass
    * (the DoReMi-style "match these domain weights" request, answered
    * with deterministic downsampling instead of random draws): group g
    * with n_g rows and target weight t_g gets
    * `step_g = max(1, ⌊n_g·Σt / (budget·t_g)⌋)`, so expected kept ≈
    * budget·t_g/Σt, clamped at keep-everything for under-represented
    * groups (steps only ever downsample — a group below its target share
    * keeps all rows; upsampling is an epochs decision, not a filter).
    *
    * All integer arithmetic over the per-group counts (one tiny agg; the
    * collect is bounded by group cardinality), so a foreign engine
    * replays the exact steps — and, through [[hashPriority]], the exact
    * kept set. */
  def stepsForTarget(df: DataFrame, groupCol: String,
      targets: Map[String, Long], defaultTarget: Long,
      budgetRows: Long): Map[String, Long] = {
    require(budgetRows >= 1, "budget must be positive")
    require((targets.values ++ Seq(defaultTarget)).forall(_ >= 1),
      "target weights must be positive")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // keysIterator, not keys.map: mapping the key SET would collapse
    // duplicate weight values before summing
    val tot = counts.keysIterator
      .map(g => targets.getOrElse(g, defaultTarget)).sum
    counts.map { case (g, n) =>
      val t = targets.getOrElse(g, defaultTarget)
      g -> math.max(1L, (n * tot) / (budgetRows * t))
    }
  }

  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double, scale: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1 && scale > 0)
    val sizes = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__gn"))
    val gn = col("__gn").cast("double")
    val weighted = if (alpha == 0.5) sqrt(gn)
      else if (alpha == 1.0) gn
      else pow(gn, lit(alpha))
    val t = greatest(lit(1L), floor(lit(scale) * weighted).cast("long"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashPriority(col(idCol)), col(idCol))
    df.join(broadcast(sizes), groupCol)
      .withColumn("mix_target", t)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("mix_target"))
      .drop("__gn", "__rn")
  }

  /** Solve for the [[temperatureMix]] `scale` that draws ≈ `targetTotal`
    * rows in aggregate: bisection over the collected per-group count table
    * (#groups rows — tens, not millions; this is the one legitimately
    * driver-side step). Because Σ max(1, ⌊scale·n^α⌋) is a monotone step
    * function, the returned scale draws at least `targetTotal` and
    * overshoots by at most one row per group. */
  def temperatureScaleForBudget(df: DataFrame, groupCol: String,
      alpha: Double, targetTotal: Long): Double = {
    val counts = df.groupBy(col(groupCol)).count()
      .collect().map(_.getLong(1))
    require(counts.nonEmpty && targetTotal >= counts.length,
      s"budget $targetTotal < one row per ${counts.length} groups")
    // same weighting branch as temperatureMix (pow(x, 0.5) may differ
    // from sqrt(x) by 1 ulp — enough to flip a floor at a boundary)
    def w(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble)
      else if (alpha == 1.0) n.toDouble
      else math.pow(n.toDouble, alpha)
    def drawn(scale: Double): Long =
      counts.map(n => math.max(1L, math.floor(scale * w(n)).toLong)).sum
    var lo = 0.0
    var hi = 1.0
    while (drawn(hi) < targetTotal) hi *= 2
    for (_ <- 0 until 60) {
      val mid = (lo + hi) / 2
      if (drawn(mid) >= targetTotal) hi = mid else lo = mid
    }
    hi
  }

  /** Deterministic train/val/test split: each row lands in the bucket whose
    * cumulative weight range contains `h(id) mod Σweights` — stable across
    * runs, engines, partitionings, and re-appends (a doc's split never
    * changes when the corpus grows, the property that keeps eval sets
    * leak-free across dataset versions). Adds `split`.
    *
    * Scale shape: pure scan-stage projection (a compiled CASE over the hash)
    * — no shuffle, no sampling state, splits any size corpus in one pass. */
  def splitAssign(df: DataFrame, idCol: String,
      weights: Seq[(String, Long)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 1))
    val total = weights.map(_._2).sum
    val slot = pmod(hashPriority(col(idCol)), lit(total))
    val (cases, _) = weights.foldLeft(
        (when(lit(false), lit("")), 0L)) { case ((acc, cum), (name, w)) =>
      (acc.when(slot < lit(cum + w), lit(name)), cum + w)
    }
    df.withColumn("split", cases)
  }

  /** EXACT-proportion stratified split: within every stratum, rows are
    * ranked by (seeded hash, id) and assigned by cumulative integer
    * cutoffs, so split i receives exactly
    * ⌊n·cum_i/total⌋ − ⌊n·cum_{i−1}/total⌋ of an n-row stratum — the
    * guarantee [[splitAssign]]'s per-row hash gives only in expectation.
    * That gap matters at the tails: a 50-doc source under hash
    * assignment can randomly end up with zero validation docs; here it
    * cannot. Ranks, counts and cutoffs are exact integer arithmetic
    * (`rn·total ≤ n·cum`), so any engine replays the full assignment.
    *
    * Scale shape: one exchange keyed on the stratum + one in-partition
    * sort shared by both window functions — the same single
    * Exchange+Sort every per-stratum window family in this engine rides
    * (q115/q106 audit). Strata are source labels (bounded, but each may
    * hold billions of rows — the sort is distributed within the hash
    * partition, never single-task). */
  def stratifiedSplitExact(df: DataFrame, idCol: String, strataCol: String,
      weights: Seq[(String, Long)], seed: Long = 0L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 1))
    import org.apache.spark.sql.expressions.Window
    val total = weights.map(_._2).sum
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashPrioritySeeded(col(idCol), seed), col(idCol))
    val rn = row_number().over(w).cast("long")
    val n = count(lit(1)).over(Window.partitionBy(col(strataCol))).cast("long")
    val (cases, _) = weights.init.foldLeft(
        (when(lit(false), lit("")), 0L)) { case ((acc, cum), (name, wt)) =>
      (acc.when(col("__rn") * lit(total) <= col("__n") * lit(cum + wt),
        lit(name)), cum + wt)
    }
    df.withColumn("__rn", rn).withColumn("__n", n)
      .withColumn("split", cases.otherwise(lit(weights.last._1)))
      .drop("__rn", "__n")
  }

  /** SQL text of [[splitAssign]]'s bucket expression for oracle twins. */
  def splitAssignSql(idExpr: String, weights: Seq[(String, Long)]): String = {
    val total = weights.map(_._2).sum
    val slot = s"(${hashPrioritySql(idExpr)} % $total)"
    val (cases, _) = weights.foldLeft(("", 0L)) { case ((acc, cum), (name, w)) =>
      (acc + s" WHEN $slot < ${cum + w} THEN '$name'", cum + w)
    }
    s"CASE$cases END"
  }

  /** Contiguous 0-based global row ids in `idCol` order — the distributed
    * zipWithIndex. A global `row_number()` window funnels the whole table
    * through ONE task; this instead (1) slices the key's [min, max] into
    * `partitions` fixed integer-width ranges (one min/max pre-pass — NOT
    * `repartitionByRange`, whose sampled boundaries are seeded by RDD id
    * and can differ between the two jobs below, silently duplicating
    * ids), (2) counts rows per slice and prefix-sums the counts into
    * offsets on the driver (≤ P numbers), (3) ranks WITHIN each slice
    * and adds its offset via a broadcast join. Parallelism = occupied
    * slices; no task ever sorts more than its slice. `idCol` must be a
    * unique integer key (the usual case: a surrogate/document id); a
    * skewed key just means uneven slices — raise `partitions`.
    * The training-shard id / example-numbering primitive. */
  def denseIds(df: DataFrame, idCol: Column, partitions: Int,
      idName: String = "rid"): DataFrame = {
    require(partitions >= 1)
    val mm = df.agg(min(idCol.cast("long")).as("mn"),
      max(idCol.cast("long")).as("mx")).collect().head
    if (mm.isNullAt(0)) return df.withColumn(idName, lit(0L)).limit(0)
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val width = ((mx - mn) / partitions.toLong) + 1L // ≥ 1, covers mx
    // `div` (exact integer division) — `/` on longs is DOUBLE division,
    // which loses exactness past 2^53
    val parted = df
      .withColumn("__k", idCol.cast("long") - lit(mn))
      .withColumn("__pid", expr(s"__k div ${width}L"))
      .drop("__k")
    val counts = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, n) =>
      val o = (p, acc); acc += n; o
    }
    val offsetDf = df.sparkSession
      .createDataFrame(offsets.toIndexedSeq)
      .toDF("__pid", "__offset")
    val w = Window.partitionBy(col("__pid")).orderBy(idCol)
    parted.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(idName,
        col("__offset") + row_number().over(w).cast("long") - lit(1L))
      .drop("__pid", "__offset")
  }
}
