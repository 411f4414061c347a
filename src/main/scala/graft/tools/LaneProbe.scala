package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 lane-shaped spot timings (median of 5, bench conf): the heavy
  * dedup/pipeline bench lanes re-run standalone for fast iteration between
  * full bench stamps. Usage: runMain graft.tools.LaneProbe [lane ...]
  * (default: all). */
object LaneProbe {
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
    val docsAll = graft.Tables.documents(spark, sfDir)
    val docs10 = (0 until 10).map(i => docsAll.select(
        (col("doc_id") * 16 + lit(i)).as("doc_id"), col("text"),
        col("source")))
      .reduce(_ union _)
    val evalSet = docsAll.filter(pmod(col("doc_id"), lit(97L)) === 0)
      .select(col("doc_id"), col("text"))
    val lanes: Seq[(String, () => Unit)] = Seq(
      "spandedup10x" -> (() =>
        graft.operators.Dedup.removeDuplicatedSpans(docs10, "doc_id", "text",
            k = 8)
          .agg(sum(col("n_removed")), count(lit(1))).collect(): Unit),
      "spandedup" -> (() =>
        graft.operators.Dedup.removeDuplicatedSpans(docsAll, "doc_id", "text",
            k = 8)
          .agg(sum(col("n_removed")), count(lit(1))).collect(): Unit),
      "dedup10x_cands" -> (() =>
        graft.operators.Dedup.lshCandidatePairs(docs10, "doc_id", "text")
          .count(): Unit),
      "dedup10x_pairs" -> (() =>
        graft.operators.Dedup.nearDupPairs(docs10, "doc_id", "text",
          threshold = 0.8).count(): Unit),
      "dedup10x_neardup" -> (() =>
        graft.operators.Dedup.dropNearDups(docs10, "doc_id", "text",
            threshold = 0.8)
          .agg(count(lit(1))).collect(): Unit),
      "dedup10x_dupngram" -> (() =>
        graft.operators.Dedup.dupNgramStats(docs10, "doc_id", "text", n = 3)
          .agg(count(lit(1)), sum(col("n_dup"))).collect(): Unit),
      "pipeline" -> (() =>
        graft.operators.CurationPipeline.run(docsAll, Some(evalSet),
          "doc_id", "text", "source",
          graft.operators.CurationPipeline.Config(minQuality = 0.2,
            modelFilterMinMarginCents = Some(-1000L)))
          .agg(count(lit(1))).collect(): Unit),
      "pipeline_withspan" -> (() =>
        graft.operators.CurationPipeline.run(docsAll, Some(evalSet),
          "doc_id", "text", "source",
          graft.operators.CurationPipeline.Config(minQuality = 0.2,
            modelFilterMinMarginCents = Some(-1000L), spanDedupK = Some(8)))
          .agg(count(lit(1))).collect(): Unit))
    val want = if (args.isEmpty) lanes.map(_._1).toSet else args.toSet
    lanes.filter(l => want(l._1)).foreach { case (name, f) =>
      f(); f() // warm
      val xs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-20s ${xs.sorted.apply(2)}%7.2f s")
    }
    spark.stop()
  }
}
