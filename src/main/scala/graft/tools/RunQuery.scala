package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Inventory

/** Runs named inventory queries once and prints row counts — debugging aid
  * for isolating runtime (codegen) issues per query.
  * Usage: runMain graft.tools.RunQuery <sfDir> <queryName ...>
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      val t0 = System.nanoTime()
      val rows = Inventory.byName(n).run(spark, dir).collect().length
      println(f"$n: $rows rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
