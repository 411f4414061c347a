package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B of unigramRarity's string-keyed vs hash-keyed exchange
  * (round-14): pairs alternate so host drift hits both legs equally. */
object RarityAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Tables.documents(spark, sfDir)

    def stringForm(): Unit = {
      val tok = df.select(col("doc_id"),
          explode(split(lower(col("text")), " +")).as("term"))
        .filter(length(col("term")) > 0)
      val counts = tok.groupBy(col("term")).agg(count(lit(1)).as("n_t"))
      val total = counts.agg(sum(col("n_t")).as("n_total"))
      tok.join(counts, "term")
        .crossJoin(broadcast(total))
        .withColumn("__rarity", expr("n_total div n_t"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("__rarity")).as("rarity_sum"))
        .withColumn("avg_rarity", col("rarity_sum").cast("double") / col("n_tokens"))
        .orderBy(col("doc_id")).collect(): Unit
    }
    def hashForm(): Unit = {
      graft.operators.TextAnalysis.unigramRarity(df, "doc_id", "text")
        .collect(): Unit
    }
    def t(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    stringForm(); hashForm() // warm
    val pairs = (1 to 7).map(_ => (t(() => stringForm()), t(() => hashForm())))
    val med = (xs: Seq[Double]) => xs.sorted.apply(xs.size / 2)
    println(f"string-keyed median: ${med(pairs.map(_._1))}%.3f s")
    println(f"hash-keyed   median: ${med(pairs.map(_._2))}%.3f s")
    spark.stop()
  }
}
