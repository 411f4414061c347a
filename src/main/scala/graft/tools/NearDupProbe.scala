package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Sub-stage decomposition of [[Dedup.nearDupPairs]] on the 10× documents
  * fixture — locates where the heaviest bench probe's time goes (bench
  * stamps cover pairs/clusters/anti; this splits PAIRS itself into
  * candidate mining, shingle materialization, and the verify join).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.NearDupProbe */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    val docs10 = (0 until 10).map(i => docs.select(
        (col("doc_id") * 16 + lit(i)).as("doc_id"), col("text")))
      .reduce(_ union _)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val cands = t("cands (mine+chk)") {
        Dedup.lshCandidatePairs(docs10, "doc_id", "text")
          .localCheckpoint(true)
      }
      println(s"  n_cands=${cands.count()}")
      val candIds = cands.select(col("id_a").as("doc_id"))
        .union(cands.select(col("id_b").as("doc_id"))).distinct()
      val sh = t("shingles (mat)") {
        docs10.join(candIds, Seq("doc_id"), "left_semi")
          .select(col("doc_id"),
            Dedup.shingleHashes64(col("text"), 3).as("sh"))
          .localCheckpoint(true)
      }
      println(s"  n_cand_docs=${sh.count()}")
      val verified = t("verify join+kernel") {
        cands
          .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            Dedup.jaccardHashedGE(col("sh_a"), col("sh_b"), 0.8).as("j"))
          .filter(col("j").isNotNull)
          .localCheckpoint(true)
      }
      println(s"  n_verified=${verified.count()}")
      t("fused nearDupPairs") {
        Dedup.nearDupPairs(docs10, "doc_id", "text", threshold = 0.8).count()
      }
    }
    spark.stop()
  }
}
