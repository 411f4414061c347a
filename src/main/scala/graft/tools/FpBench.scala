package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** A/B probe: native [[graft.functions.StringFoldHash]] fingerprint vs the
  * interpreted higher-order-fold twin, over the documents fixture unioned
  * `reps` times. Usage: runMain graft.tools.FpBench [sfDir] [reps]
  */
object FpBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Seq.fill(reps)(graft.Tables.documents(spark, dir))
      .reduce(_ union _).select("text").cache()
    val n = docs.count()
    def time(f: => Unit): Double = {
      f // warmup
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    val tNative = time {
      docs.select(sum(TextAnalysis.fingerprint(col("text")))).collect(): Unit
    }
    val tFold = time {
      docs.select(sum(TextAnalysis.fingerprintFold(col("text")))).collect(): Unit
    }
    println(f"docs=$n native=$tNative%.3f s fold=$tFold%.3f s speedup=${tFold / tNative}%.1fx")
    spark.stop()
  }
}
