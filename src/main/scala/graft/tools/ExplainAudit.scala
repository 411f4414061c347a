package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Inventory

/** Prints `explain("formatted")` for selected inventory queries so plan
  * regressions (lost pushdown, missing broadcast, shrunk codegen spans) are
  * visible. Usage: runMain graft.tools.ExplainAudit [queryName ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_sum_exact", "q10_approx_sum_sys10", "q20_join_revenue_by_nation",
        "q35_minhash_neardup_pairs", "q38_ann_bruteforce_top5")
    val dir = "/root/testdata/sf0.001"
    names.foreach { n =>
      println(s"\n======== $n ========")
      Inventory.byName(n).run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
