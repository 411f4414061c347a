package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ann

/** Recall of the half-trained appended index BEFORE vs AFTER
  * retrainIvfIndex, per sf dir — picks q196's honest gate floor. */
object RetrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf")
      val probes = emb.filter(col("vec_id") < 10)
      val bf = Ann.bruteForceTopKFast(emb, probes, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id")).cache()
      val bfN = bf.count()
      val path = graft.TmpDirs.path(s"retrainprobe_$sf")
      Ann.buildIvfIndex(emb.filter(pmod(col("vec_id"), lit(2L)) === 0),
        "vec_id", "embedding", path, numCentroids = 32)
      Ann.appendToIvfIndex(emb.filter(pmod(col("vec_id"), lit(2L)) === 1),
        "vec_id", "embedding", path)
      def recall(np: Int): Double = bf.join(
        Ann.searchIvfIndex(spark, path, probes, "vec_id", "embedding", 5, np)
          .select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / bfN
      val before = recall(8)
      Ann.retrainIvfIndex(spark, path)
      val after = recall(8)
      println(f"[retrainprobe] $sf before(nProbe8)=$before%.4f after=$after%.4f")
    }
    spark.stop()
  }
}
