package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.exec.AdaptiveExecutor
import graft.model.{AggKind, SamplingStrategy}

object DebugAdaptive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val out = AdaptiveExecutor.run(li, col("l_extendedprice"), AggKind.Sum,
      SamplingStrategy.Adaptive(errorThresholdPct = 5.0, initialFraction = 0.05))
    out.rounds.foreach(r => println(
      f"f=${r.fraction}%.3f n=${r.n} est=${r.estimate}%.1f ci=[${r.ciLower}%.1f, ${r.ciUpper}%.1f] rel=${r.relMarginPct}%.2f%%"))
    println(s"status=${out.result.status} exact=${li.agg(sum("l_extendedprice")).head().getDouble(0)}")
    spark.stop()
  }
}
