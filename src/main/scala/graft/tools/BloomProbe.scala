package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Diagnostic: does the parquet reader actually prune row groups with the
  * written bloom filters? Measures task INPUT BYTES (the ground truth the
  * wall clock can hide behind page-cache warmth) for an absent-key point
  * lookup on the plain scattered layout vs the bloom-filtered layout of
  * the same rows. Run after graft.Bench has materialized the fixtures. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-bloom-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf = args.headOption.getOrElse("sf0.1")
    val plainPath = s"/tmp/graft_bench_li100_uidplain_$sf.parquet"
    val bloomPath = s"/tmp/graft_bench_li100_uidbloom_$sf.parquet"

    @volatile var bytes = 0L
    @volatile var records = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          bytes += t.taskMetrics.inputMetrics.bytesRead
          records += t.taskMetrics.inputMetrics.recordsRead
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // build the uid fixtures from the shared scattered fixture if the
    // bench hasn't materialized them yet (same recipe as graft.Bench)
    if (!new java.io.File(plainPath, "_SUCCESS").exists() ||
        !new java.io.File(bloomPath, "_SUCCESS").exists()) {
      val liUid = spark.read
        .parquet(s"/tmp/graft_bench_li100_scattered_$sf.parquet")
        .withColumn("uid", xxhash64(col("l_orderkey"), col("l_linenumber"),
          col("l_suppkey"), col("l_extendedprice")))
      liUid.repartition(80).write.mode("overwrite").parquet(plainPath)
      graft.sources.Layout.bloomFilteredWrite(liUid, bloomPath, Seq("uid"),
        files = 80, ndvPerFile = 800000L)
    }
    val plain = spark.read.parquet(plainPath)
    val bloom = spark.read.parquet(bloomPath)
    val absent = Iterator.iterate(1234567890123456789L)(_ + 9973L)
      .find(k => plain.filter(col("uid") === k).count() == 0L &&
        bloom.filter(col("uid") === k).count() == 0L).get
    println(s"[bloomprobe] absent key = $absent")

    def probe(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      // warmup not needed: we care about bytes, not time
      bytes = 0L; records = 0L
      val t0 = System.nanoTime()
      df.filter(col("uid") === absent)
        .agg(count(lit(1))).collect(): Unit
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      println(f"[bloomprobe] $tag%-8s time=$dt%.3fs bytesRead=${bytes / 1024.0 / 1024.0}%.1fMiB recordsRead=$records%d")
    }
    probe("plain", plain)
    probe("bloom", bloom)
    probe("plain2", plain)
    probe("bloom2", bloom)
    spark.stop()
  }
}
