package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Root-cause reproduction for the round-13 official stamp's impossible
  * `x_unijoin60_exact_sec` redemption (0.49 s for a 60 M-row no-broadcast
  * shuffle join whose healthy band is 3.4–4.5 s — round-13 verdict item
  * 1d).
  *
  * Mechanism under test: when a lane goes dirty DURING its in-place
  * `stableMedian` batch, stableMedian registers its plain thunk into
  * `probeRedo` immediately (Bench's in-place retry bookkeeping). The
  * unijoin60 lane re-registers a conf-scoped (`noBroadcast`) thunk into
  * `probeOnce` a few lines later — but `probeRedo` keeps the STALE
  * closure. End-of-run redemption iterated `probeRedo`, so a lane that
  * was spread-dirty (not only canary-flagged) redeemed through the
  * UNSCOPED thunk: under the session's default broadcast threshold the
  * 150 k-row orders side broadcasts, the join never shuffles 60 M rows,
  * and the "redeemed" number measures a BroadcastHashJoin.
  *
  * This main measures BOTH thunks on the same fixtures and prints each
  * plan's join node — expected: the stale path runs BroadcastHashJoin at
  * a fraction of the scoped path's SortMergeJoin time, reproducing the
  * 0.49-class stamp. The fix (redeem through `probeOnce`, which every
  * re-registration updates, plus the `CanaryAttribution
  * .plausibleRedemption` window) is verified by Bench itself.
  *
  * Usage: `runMain graft.tools.RedemptionProbe /root/testdata/sf0.1` */
object RedemptionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the bench's exact 60 M-row fixture shape (li10f unioned 10x,
    // written scattered), built from the same cache path when present
    val sfTag = new java.io.File(sfDir).getName
    val li = graft.Tables.lineitem(spark, sfDir)
    val li10 = Seq.fill(10)(li).reduce(_ union _)
    val li10Path = s"/tmp/graft_bench_li10_$sfTag.parquet"
    if (!new java.io.File(li10Path, "_SUCCESS").exists()) {
      li10.repartition(40).write.mode("overwrite").parquet(li10Path)
    }
    val li10f = spark.read.parquet(li10Path)
    val liScatteredPath = s"/tmp/graft_bench_li100_scattered_$sfTag.parquet"
    if (!new java.io.File(liScatteredPath, "_SUCCESS").exists()) {
      Seq.fill(10)(li10f).reduce(_ union _).repartition(80)
        .write.mode("overwrite").parquet(liScatteredPath)
    }
    val liScattered = spark.read.parquet(liScatteredPath)
    val ordSel = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"))

    def joined = liScattered
      .join(ordSel, col("l_orderkey") === col("o_orderkey"))
      .agg((sum(col("l_extendedprice")) * lit(1.0)).as("s"))
    def sumOnce(): Double = {
      val t0 = System.nanoTime()
      joined.first.getDouble(0): Unit
      (System.nanoTime() - t0) / 1e9
    }
    def noBroadcast[T](f: => T): T = {
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try f
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
    def joinNode(): String = {
      val plan = joined.queryExecution.executedPlan.toString()
      plan.linesIterator.map(_.trim)
        .find(l => l.contains("Join")).getOrElse("<no join node>")
    }

    sumOnce() // session warmup (codegen, footers, JIT)
    // 1. the STALE-thunk path: session-default broadcast threshold —
    //    what r13's redemption actually ran for a spread-dirty lane
    val staleTimes = Seq.fill(3)(sumOnce()).sorted
    val stalePlan = joinNode()
    // 2. the SCOPED path: what the lane measures in place
    val (scopedTimes, scopedPlan) = noBroadcast {
      sumOnce() // re-warm under this conf (fresh plan)
      (Seq.fill(3)(sumOnce()).sorted, joinNode())
    }
    println(f"[redemptionprobe] sf=$sfTag")
    println(f"[redemptionprobe] stale_thunk  median=${staleTimes(1)}%.3f s " +
      f"runs=${staleTimes.map(t => f"$t%.3f").mkString(",")} plan=$stalePlan")
    println(f"[redemptionprobe] scoped_thunk median=${scopedTimes(1)}%.3f s " +
      f"runs=${scopedTimes.map(t => f"$t%.3f").mkString(",")} plan=$scopedPlan")
    println(f"[redemptionprobe] ratio=${scopedTimes(1) / staleTimes(1)}%.2f" +
      "x — a stale redemption under-reports the lane by this factor")
    spark.stop()
  }
}
