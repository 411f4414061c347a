package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Inventory

/** Round-14 attribution probe: runs named inventory queries once (after
  * warmup) under the bench conf with a listener that prints every Spark
  * job's wall-clock and stage shape — attributes a query's time to its
  * constituent jobs (broadcast builds, eager checkpoints, final action).
  * Usage: runMain graft.tools.JobTimeline <queryName ...>
  */
object JobTimeline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.put(e.jobId, (e.time, e.stageInfos.map(_.numTasks).sum)); ()
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.get(e.jobId)).foreach { case (t0, nTasks) =>
            lines.add(f"    job ${e.jobId}%4d ${(e.time - t0) / 1e3}%8.3f s  tasks=$nTasks")
          }
          ()
        }
      })
    args.foreach { n =>
      val q = Inventory.byName(n)
      q.run(spark, sfDir).collect() // warmup (fills codegen/file caches)
      Thread.sleep(300)
      lines.clear()
      val t0 = System.nanoTime()
      q.run(spark, sfDir).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain listener
      println(f"== $n  wall=$wall%.3f s")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
