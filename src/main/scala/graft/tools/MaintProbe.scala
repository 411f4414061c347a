package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ann

/** Focused timing of the IVF index maintenance cycle (delete + upsert of
  * a ~9% id slice) — decomposed per op so a bench regression in
  * x_ann_index_maint_cycle_sec can be attributed without a full bench
  * run. Args: sfDir [rounds]. */
object MaintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val path = graft.TmpDirs.path("maintprobe_ivf")
    Ann.buildIvfIndex(emb, "vec_id", "embedding", path, numCentroids = 32)
    val maintIds = emb.filter(pmod(col("vec_id"), lit(11L)) === 5)
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (1 to rounds).foreach { i =>
      val td = t(Ann.deleteFromIvfIndex(spark, path,
        maintIds.select(col("vec_id")), "vec_id"): Unit)
      val tu = t(Ann.upsertIntoIvfIndex(
        maintIds.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", path))
      println(f"[maintprobe] round=$i delete=$td%.3f upsert=$tu%.3f cycle=${td + tu}%.3f")
    }
    spark.stop()
  }
}
