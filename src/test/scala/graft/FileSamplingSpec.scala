package graft

import org.apache.spark.sql.functions._

import graft.sources.FileSampling

class FileSamplingSpec extends SparkSpec {

  test("file-level sample reads a 1/step subset and the estimator is calibrated") {
    val dir = java.nio.file.Files.createTempDirectory("fs_sample").toString
    Tables.lineitem(spark, sf0001).repartition(20)
      .write.mode("overwrite").parquet(dir)
    val full = spark.read.parquet(dir)
    val exactCount = full.count()
    val exactSum = full.agg(sum("l_extendedprice")).head.getDouble(0)

    val sf = FileSampling.parquetFileSample(spark, dir, step = 4)
    assert(sf.scaleFactor === 4.0)
    val est = sf.df.agg(sum("l_extendedprice")).head.getDouble(0) * sf.scaleFactor
    val estCount = sf.df.count() * sf.scaleFactor
    // round-robin repartition -> files are exchangeable clusters
    assert(math.abs(est - exactSum) / exactSum < 0.10, s"est=$est exact=$exactSum")
    assert(math.abs(estCount - exactCount) / exactCount < 0.10)
  }

  test("offsets partition the file set") {
    val dir = java.nio.file.Files.createTempDirectory("fs_part").toString
    Tables.lineitem(spark, sf0001).repartition(8)
      .write.mode("overwrite").parquet(dir)
    val total = (0 until 4).map(off =>
      FileSampling.parquetFileSample(spark, dir, 4, off).df.count()).sum
    assert(total === spark.read.parquet(dir).count())
  }
}
