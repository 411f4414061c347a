package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs the headline query set on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Each query gets one warmup run (JIT + codegen + file-cache) and the
  * median of 3 timed runs; the timed action is a full materialization
  * (`collect` on the final, already-aggregated result — all results here
  * are small aggregates, so collect cost is nil and the measured work is
  * the distributed plan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Inventory.all.filter(_.headline)
    val results = headline.map { q =>
      def once(): Double = {
        val t0 = System.nanoTime()
        q.run(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val t = try {
        once() // warmup
        val runs = Seq(once(), once(), once()).sorted
        runs(1) // median
      } catch { case _: Throwable => -1.0 }
      q.name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"headline_total","value":$total%.4f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
