package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps the physical plan of Dedup.lshBands (the round-14 MinHashSig
  * kernel shape) to plans/r14/lshbands_after.txt — the q35 query plan
  * shows only the checkpointed result, so the sketch stage's own plan is
  * recorded here for the audit trail. */
object BandsPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val plan = graft.operators.Dedup.lshBands(docs, "doc_id", "text")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("plans/r14/lshbands_after.txt"),
      plan.getBytes("UTF-8"))
    spark.stop()
  }
}
