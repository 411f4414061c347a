package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 micro-probe: quantifies candidate per-query costs on the sf0.1
  * fixture under the bench conf —
  *   decimal-sum vs long-cents-sum aggregation,
  *   trailing orderBy (range exchange) vs coalesce(1)+sortWithinPartitions,
  *   relation re-resolution (spark.read per run) vs a reused DataFrame.
  * Pure measurement; no engine behavior changes.
  */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def med(f: => Unit): Double = {
      f; f
      val xs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      xs.sorted.apply(xs.size / 2)
    }
    val li = graft.Tables.lineitem(spark, sfDir)

    println(f"count only:            ${med(li.agg(count(lit(1))).collect())}%8.1f ms")
    println(f"sum double:            ${med(li.agg(sum(col("l_extendedprice"))).collect())}%8.1f ms")
    println(f"sum dec(18,2):         ${med(li.agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")).collect())}%8.1f ms")
    println(f"sum cents long:        ${med(li.agg((sum((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")) / 100.0)).collect())}%8.1f ms")
    println(f"groupBy sum dec:       ${med(li.groupBy(col("l_returnflag")).agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")).orderBy(col("l_returnflag")).collect())}%8.1f ms")
    println(f"groupBy sum dec noord: ${med(li.groupBy(col("l_returnflag")).agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")).collect())}%8.1f ms")
    println(f"groupBy sum dec c1sort:${med(li.groupBy(col("l_returnflag")).agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")).coalesce(1).sortWithinPartitions(col("l_returnflag")).collect())}%8.1f ms")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    println(f"sum rev double:        ${med(li.agg(sum(rev)).collect())}%8.1f ms")
    println(f"sum round4 double:     ${med(li.agg(sum(round(rev, 4))).collect())}%8.1f ms")
    println(f"sum rev dec(18,4):     ${med(li.agg(sum(rev.cast("decimal(18,4)"))).collect())}%8.1f ms")
    println(f"sum round4 dec(18,4):  ${med(li.agg(sum(round(rev, 4).cast("decimal(18,4)"))).collect())}%8.1f ms")
    // relation resolution cost: fresh read vs reused frame
    println(f"fresh read + count:    ${med(graft.Tables.lineitem(spark, sfDir).agg(count(lit(1))).collect())}%8.1f ms")
    println(f"reused frame + count:  ${med(li.agg(count(lit(1))).collect())}%8.1f ms")
    // plan-only: how long does q.run construction take fresh vs reused
    println(f"build lineitem frame:  ${med { graft.Tables.lineitem(spark, sfDir); () }}%8.1f ms")
    // scan parallelism check
    println("scan partitions of lineitem: " + li.rdd.getNumPartitions)
    spark.stop()
  }
}
