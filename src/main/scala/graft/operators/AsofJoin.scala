package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward-looking temporal) join — for each left row, the single
  * latest right row with the same key and ordering value ≤ the left row's,
  * left-outer semantics. Spark has no native ASOF JOIN; the naive
  * formulation (range theta-join + per-left-row max) explodes into an
  * O(L×R)-per-key BroadcastNestedLoop or a sort-merge over an inequality.
  *
  * Plan here: interleave both sides into ONE dataset, shuffle once on the
  * key, and resolve every match with a running `last(payload, ignoreNulls)`
  * window over (orderCol, side, tiebreak) — right rows sort before left
  * rows at equal orderCol (≤ semantics), and the tiebreak makes the pick
  * deterministic when several right rows share the max orderCol. Cost is
  * one hash exchange + one sort of |L|+|R| rows per key — the same shape as
  * any windowed aggregate, no join explosion, AQE-splittable. Hot keys
  * serialize within one task (inherent to per-key ordering); if a single
  * key's history exceeds a task, pre-split by coarse time range first.
  */
object AsofJoin {

  /** Backward as-of join. `rightCols` are carried from the matched right
    * row into the output as `{prefix}{col}` (null when no right row
    * precedes the left row). `rightTieBreak` must totally order right rows
    * within (key, orderCol) — e.g. a unique id. */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftOrder: String, rightOrder: String, rightCols: Seq[String],
      rightTieBreak: String, prefix: String = "asof_"): DataFrame = {
    val payloadCols = (rightCols :+ rightTieBreak).distinct
    val payload = struct(payloadCols.map(c => col(c).as(c)): _*)
    val r = right.select(
      col(key).as("__k"), col(rightOrder).as("__ord"), lit(0).as("__side"),
      col(rightTieBreak).as("__tb"), payload.as("__r"))
    val payloadType = r.schema("__r").dataType
    val tbType = r.schema("__tb").dataType
    val l = left.select(
      (Seq(col(key).as("__k"), col(leftOrder).as("__ord"), lit(1).as("__side"),
        lit(null).cast(tbType).as("__tb"), lit(null).cast(payloadType).as("__r"))
        ++ left.columns.map(c => col(c).as(s"__L_$c"))): _*)
    // right rows carry no left payload — typed nulls keep unionByName happy
    val rPadded = l.schema.fields.foldLeft(r) { (df, f) =>
      if (df.columns.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val unioned = l.unionByName(rPadded)
    // nulls_first puts left rows' null tiebreak before right rows at the
    // same (__ord, __side) — irrelevant for correctness (sides differ) but
    // keeps the sort total and deterministic
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ord").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(
      (left.columns.toIndexedSeq.map(c => col(s"__L_$c").as(c)) ++
        rightCols.map(c => col("__m").getField(c).as(s"$prefix$c"))): _*)
  }
}
