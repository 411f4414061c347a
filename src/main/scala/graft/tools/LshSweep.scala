package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ann

/** Parameter sweep for [[Ann.lshTopK]]: recall vs exact brute force and
  * candidate volume (the cost driver) across (bitsPerTable, numTables,
  * probeRadius) on the embeddings fixture. Tuning tool, not a gate.
  */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("lsh-sweep")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir).cache()
    val n = emb.count()
    val probes = emb.filter(col("vec_id") < 10)
    def nn(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = nn(Ann.bruteForceTopKFast(emb, probes, "vec_id", "embedding", 5))
    for {
      bits <- Seq(6, 8, 10)
      tables <- Seq(8, 16, 24)
      radius <- Seq(0, 1)
    } {
      val t0 = System.nanoTime()
      val got = nn(Ann.lshTopK(emb, probes, "vec_id", "embedding", k = 5,
        bitsPerTable = bits, numTables = tables, probeRadius = radius))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = got.intersect(exact).size.toDouble / exact.size
      println(f"bits=$bits%2d tables=$tables%2d r=$radius recall=$recall%.2f sec=$sec%.2f")
    }
    println(s"corpus n=$n")
    spark.stop()
  }
}
