package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off sizing of the grouped adaptive ladder at its 10⁶-group
  * contract ceiling (round-10 verdict item 8): the maxGroups lift to 10⁶
  * was spec'd at 10⁵ groups; this measures the real thing — wall time,
  * the broadcast active-set build, the driver-side heap footprint, and
  * (round-11 verdict item 6) the TASK-RESULT BYTES shipped to the driver
  * over the whole ladder (a listener sums TaskMetrics.resultSize, which
  * is exactly what collect()-style rounds pay) — so the Bench probe's
  * budget and the "driver traffic is output-sized" claim are picked from
  * measurements, not guesses. Synthetic frame: `groups` groups ×
  * `rowsPerGroup` rows (codegen range, no IO — isolates ladder machinery
  * from scan cost). */
object LadderProbe {
  def main(args: Array[String]): Unit = {
    val groups = args.headOption.map(_.toLong).getOrElse(1000000L)
    val rowsPerGroup = args.lift(1).map(_.toLong).getOrElse(64L)
    // NOTE: the heap is whatever -Xmx the launcher gave this JVM —
    // spark.driver.memory is launcher-time only and has no effect set
    // programmatically in local mode
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val resultBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            resultBytes.addAndGet(te.taskMetrics.resultSize): Unit
      })
    val n = groups * rowsPerGroup
    def frame = spark.range(n).select(
      col("id").as("k"),
      pmod(col("id"), lit(groups)).cast("string").as("grp"),
      (pmod(col("id"), lit(997L)) + lit(1)).cast("double").as("v"))
    (1 to 2).foreach { i =>
      val rt = Runtime.getRuntime
      System.gc()
      val heap0 = rt.totalMemory() - rt.freeMemory()
      resultBytes.set(0L)
      val t0 = System.nanoTime()
      val out = graft.exec.AdaptiveExecutor.runGroupedDeterministic(
        frame, value = col("v"), key = col("k"), group = col("grp"),
        exactBelow = 1L) // every group rides the LADDER route
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus before reading the counter — a fixed
      // sleep under-reports when late onTaskEnd events land after it on a
      // loaded machine (round-12 ADVICE); bounded wait so a deep backlog
      // degrades to a warned under-report, not a crashed probe run
      org.apache.spark.graftshim.ListenerShim
        .waitUntilListenerBusEmpty(spark.sparkContext): Unit
      val heap1 = rt.totalMemory() - rt.freeMemory()
      println(f"[ladderprobe] run=$i groups=$groups rows_per_group=" +
        f"$rowsPerGroup n=$n out_rows=$rows sec=$sec%.2f " +
        f"heap_delta_mb=${(heap1 - heap0) / 1e6}%.0f " +
        f"driver_result_mb=${resultBytes.get() / 1e6}%.1f")
    }
    spark.stop()
  }
}
