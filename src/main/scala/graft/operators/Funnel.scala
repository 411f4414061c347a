package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream — "of the users who
  * did A, how many then did B, then C" with strict temporal ordering
  * (each step must happen strictly AFTER the first qualifying occurrence
  * of the previous step). The product-analytics staple; no counterpart in
  * the reference.
  *
  * Semantics: per user, t₁ = min ts of step 1; tᵢ = min ts of step i with
  * ts > tᵢ₋₁. `stage_reached` is the largest i with tᵢ defined (0 = user
  * never did step 1). First-occurrence chaining makes the result a pure
  * function of the event set — no dependence on row order.
  *
  * Scale shape: ONE hash exchange on the user key; the chained mins are
  * consecutive unbounded window aggregates over the same partitioning
  * (Spark plans them in one Exchange + a Window stack, no sort needed for
  * unbounded MIN), then one partial-aggregated groupBy on the same key —
  * AQE sees the co-partitioning, so nothing reshuffles. Never a self-join
  * per step (the naive N-step funnel is N joins on a 100 TB event table).
  */
object Funnel {

  /** Per-user funnel: `user, stage_reached, t_step1 … t_stepN` (micros;
    * null when the stage was not reached). */
  def userStages(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    val tsUs = unix_micros(col(tsCol))
    val base = events.select(col(userCol), tsUs.as("__ts"),
      col(typeCol).as("__type"))
    val withTs = steps.zipWithIndex.foldLeft(base) {
      case (df, (step, i)) =>
        val cond = if (i == 0) col("__type") === lit(step)
        else col("__type") === lit(step) && col("__ts") > col(s"__t$i") &&
          col(s"__t$i").isNotNull
        df.withColumn(s"__t${i + 1}",
          min(when(cond, col("__ts"))).over(w))
    }
    // ascending fold so the HIGHEST reached stage is the outermost branch:
    // when(t_N, N).otherwise(when(t_N-1, N-1).otherwise(... 0))
    val stage = steps.indices.foldLeft(lit(0L): Column) {
      case (acc, i) =>
        when(col(s"__t${i + 1}").isNotNull, lit(i + 1L)).otherwise(acc)
    }
    val aggs = steps.indices.map(i =>
      max(col(s"__t${i + 1}")).as(s"t_step${i + 1}")) :+
      max(stage).as("stage_reached")
    withTs
      .groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(userCol) +: col("stage_reached") +:
        steps.indices.map(i => col(s"t_step${i + 1}")): _*)
  }

  /** Funnel summary: users reaching AT LEAST stage i, for i = 1..N —
    * the cumulative counts a funnel chart plots. */
  def stageCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val stages = userStages(events, userCol, tsCol, typeCol, steps)
    val n = steps.size
    stages.agg(
      count(lit(1)).as("n_users"),
      (1 to n).map(i => sum(when(col("stage_reached") >= i, 1L)
        .otherwise(0L)).cast("long").as(s"n_stage$i")): _*)
  }
}
