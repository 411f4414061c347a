package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 attribution for dupClusters on the 10× fixture: per-job wall
  * inside the label-propagation loop. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    val docs10 = (0 until 10).map(i => docs.select(
        (col("doc_id") * 16 + lit(i)).as("doc_id"), col("text")))
      .reduce(_ union _)
    val pairs = graft.operators.Dedup.nearDupPairs(docs10, "doc_id", "text",
      threshold = 0.8)
    pairs.count()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        val t0s = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          t0s.put(e.jobId, e.time); ()
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(t0s.get(e.jobId)).foreach(t0 =>
            jobs.add(f"  job ${e.jobId}%4d ${(e.time - t0) / 1e3}%7.3f s"))
          ()
        }
      })
    (1 to 2).foreach { round =>
      jobs.clear()
      val t0 = System.nanoTime()
      graft.operators.Dedup.dupClusters(pairs).count()
      println(f"dupClusters round $round: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(500)
      jobs.forEach(println)
    }
    spark.stop()
  }
}
