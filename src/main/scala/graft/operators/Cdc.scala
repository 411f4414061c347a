package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot differencing — change-data-capture between two versions of a
  * keyed table (yesterday's corpus vs today's, a serving table vs its
  * rebuild). The output labels every key `added` / `removed` / `changed` /
  * `unchanged` and carries both versions of the compared columns, which is
  * exactly what an incremental pipeline needs to process only the delta
  * instead of rescanning 100 TB.
  *
  * Scale shape: ONE full-outer equi-join on the key — both sides shuffle
  * once on the primary key and nothing else moves. Snapshots written with
  * [[graft.sources.Layout]] bucketing on the key diff with zero exchanges;
  * AQE splits skewed keys. Comparison is null-safe (`<=>`), evaluated
  * inside the join's project, so no second pass.
  */
object Cdc {

  /** Diff `newDf` against `oldDf` by `keyCols`, comparing `valueCols`.
    * Returns key columns + `change_type` + `old_`/`new_`-prefixed copies of
    * each compared column. Key columns must be non-null (primary key). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val o = oldDf.select(
      keyCols.map(col) ++
        (valueCols.map(c => col(c).as(s"__old_$c")) :+ lit(true).as("__in_old")): _*)
    val n = newDf.select(
      keyCols.map(col) ++
        (valueCols.map(c => col(c).as(s"__new_$c")) :+ lit(true).as("__in_new")): _*)
    val anyChanged = valueCols
      .map(c => !(col(s"__old_$c") <=> col(s"__new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val changeType = when(!coalesce(col("__in_old"), lit(false)), lit("added"))
      .when(!coalesce(col("__in_new"), lit(false)), lit("removed"))
      .when(anyChanged, lit("changed"))
      .otherwise(lit("unchanged"))
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) ++
        (changeType.as("change_type") +:
          valueCols.flatMap(c =>
            Seq(col(s"__old_$c").as(s"old_$c"), col(s"__new_$c").as(s"new_$c")))): _*)
  }

  /** Explode a [[snapshotDiff]] output into SIGNED delta rows for
    * incremental aggregate maintenance: `sign = +1` rows carry the new
    * version of each `versionedCol` (added + changed), `sign = -1` rows the
    * old version (removed + changed); unchanged keys are dropped before the
    * explode, so the delta stream is proportional to the CHANGE volume, not
    * the snapshot. Feed this to a group-structured (subtractable) sketch —
    * e.g. [[graft.exec.Estimators.signedMomentSketch]] — and adding the
    * result to yesterday's rollup reproduces today's rebuild exactly. */
  def deltaRows(diff: DataFrame, keyCols: Seq[String],
      versionedCols: Seq[String]): DataFrame = {
    require(versionedCols.nonEmpty, "versionedCols must be non-empty")
    val newer = struct(versionedCols.map(c => col(s"new_$c").as(c)) :+
      lit(1L).as("sign"): _*)
    val older = struct(versionedCols.map(c => col(s"old_$c").as(c)) :+
      lit(-1L).as("sign"): _*)
    diff.filter(col("change_type") =!= "unchanged")
      .select(keyCols.map(col) :+ explode(array(
        when(col("change_type").isin("added", "changed"), newer),
        when(col("change_type").isin("removed", "changed"), older))).as("__r"): _*)
      .filter(col("__r").isNotNull)
      .select(keyCols.map(col) ++ versionedCols.map(c => col(s"__r.$c")) :+
        col("__r.sign").as("sign"): _*)
  }

  /** Type-2 slowly-changing-dimension build from an append-only change
    * log: per key, collapse consecutive rows whose tracked attribute did
    * not change, then emit one row per surviving state with its effective
    * interval — `valid_from_us` (inclusive), `valid_to_us` (exclusive; null
    * while current), a 1-based `version`, and `is_current`. `tsUs` must be
    * an exact integer timestamp (epoch micros — never float seconds, the
    * q93/q94 rounding trap); `tie` breaks equal timestamps so the state
    * sequence is a total order.
    *
    * Null-safe change detection (`IS DISTINCT FROM`): a null attribute is a
    * state like any other, not a row-dropper.
    *
    * Scale shape: both windows share one hash partition on the key and one
    * sort by (ts, tie) — a single exchange + sort pass, no self-join
    * against the snapshot (the usual SCD2 MERGE formulation) and nothing
    * driver-side. Output size is the number of state CHANGES, not the log
    * length. */
  def scd2(log: DataFrame, keyCols: Seq[String], attr: Column,
      tsUs: Column, tie: Column): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val keyCs = keyCols.map(col)
    val w = Window.partitionBy(keyCs: _*)
      .orderBy(col("__ts_us").asc, col("__tie").asc)
    log.select(keyCs ++ Seq(attr.as("attr"), tsUs.as("__ts_us"),
        tie.as("__tie")): _*)
      .withColumn("__prev", lag(col("attr"), 1).over(w))
      .filter(!(col("__prev") <=> col("attr")))
      .withColumn("valid_from_us", col("__ts_us"))
      .withColumn("valid_to_us", lead(col("__ts_us"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to_us").isNull)
      .drop("__prev", "__ts_us", "__tie")
  }

  /** Signed join-aggregate — the delta term of incremental JOIN-view
    * maintenance (classic IVM algebra):
    *
    *   A1 ⋈ B1 = A0 ⋈ B0  ⊕  ΔA ⋈ B0  ⊕  A1 ⋈ ΔB
    *
    * so a maintained aggregate over a join view needs only the two
    * delta-joins, whose cost is ∝ |ΔA|·sel + |ΔB|·sel — change volume,
    * never the corpus. Inputs carry a ±1 `sign` column (inserts +1,
    * deletes −1, an update = delete ⊕ insert); the join multiplies signs,
    * and the grouped aggregate sums `sign` (count delta) and
    * `sign · value` (sum delta) as EXACT integer/decimal — the same
    * subtractable-sketch discipline as [[graft.exec.Estimators.signedMomentSketch]]
    * (q103), extended across a join. Apply the delta to the old per-group
    * (n, sum) state by plain addition and drop groups whose n reaches 0.
    *
    * `left`/`right` must expose `sign`; value is taken from the left
    * (fact) side. One equi-join shuffle on the key — deltas are small, so
    * AQE broadcasts them against the big side. */
  def signedJoinAgg(left: DataFrame, right: DataFrame, key: String,
      groupCols: Seq[String], value: Column): DataFrame = {
    val l = left.withColumnRenamed("sign", "__sl")
    val r = right.withColumnRenamed("sign", "__sr")
    l.join(r, key)
      .withColumn("__s", col("__sl") * col("__sr"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__s")).as("dn"),
        sum(col("__s") * value.cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("dsum"))
  }
}
