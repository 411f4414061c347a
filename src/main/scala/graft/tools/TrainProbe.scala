package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.QualityModel

/** One-off learning-curve probe for QualityModel.trainWeights — prints
  * teacher-agreement accuracy at several (iters, lr) points so the gated
  * query's floor is picked from measurement, not hope. */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    val teacher = QualityModel.marginCents(col("text")) > 0
    val label = when(teacher, lit(1.0)).otherwise(lit(0.0))
    val pos = docs.filter(teacher).count(); val n = docs.count()
    println(s"[trainprobe] $sfDir n=$n pos=$pos")
    for ((it, lr, dec) <- Seq((20, 2.0, 0.05), (30, 2.0, 0.05),
        (50, 2.0, 0.05))) {
      val t0 = System.nanoTime()
      val w = QualityModel.trainWeights(docs, "doc_id", "text", label,
        iters = it, lr = lr, decay = dec)
      val acc = QualityModel.marginCentsJoined(docs, "doc_id", "text", w)
        .join(docs.select(col("doc_id"), teacher.as("t")), "doc_id")
        .select(((col("margin_cents") > 0) === col("t")).cast("long").as("ok"))
        .agg(avg(col("ok"))).collect()(0).getDouble(0)
      val wstats = w.agg(min(col("weight_cents")), max(col("weight_cents")),
        sum(abs(col("weight_cents")))).collect()(0)
      println(f"[trainprobe] iters=$it lr=$lr decay=$dec acc=$acc%.4f wmin=${wstats.getLong(0)} wmax=${wstats.getLong(1)} wl1=${wstats.getLong(2)} t=${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }
}
