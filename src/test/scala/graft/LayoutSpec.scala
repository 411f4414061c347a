package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave: bit j of value i → z-bit j*k + i. */
  private def zRef(vals: Seq[Long], bits: Int): Long = {
    val k = vals.size
    var z = 0L
    for (i <- 0 until bits; ci <- 0 until k)
      z |= ((vals(ci) >> i) & 1L) << (i * k + ci)
    z
  }

  test("zValue matches the reference interleave on randomized inputs") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong)) :+ ((0L, 0L)) :+ ((65535L, 65535L))
    val df = rows.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        Layout.zValue(Seq(col("x"), col("y")), bits = 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) === zRef(Seq(x, y), 16), s"($x,$y)")
    }
  }

  test("zValue three-column interleave and bit budget guard") {
    val df = Seq((5L, 3L, 6L)).toDF("a", "b", "c")
    val z = df.select(Layout.zValue(Seq(col("a"), col("b"), col("c")), 8))
      .first().getLong(0)
    assert(z === zRef(Seq(5L, 3L, 6L), 8))
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("a"), col("b"), col("c")), bits = 32)
    }
  }

  test("rangeBin clamps to [0, 2^bits) and is monotone") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 250.0).toDF("v")
    val bins = df.select(Layout.rangeBin(col("v"), 0.0, 100.0, 4).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(bins.head === 0L)   // below min clamps to 0
    assert(bins(1) === 0L)
    assert(bins(3) === 15L)    // max maps to top bin
    assert(bins(4) === 15L)    // above max clamps to top
    assert(bins === bins.sorted)
  }

  test("zorderWrite: both columns' bands land in a small file subset") {
    // 64×64 grid → every (x, y) combination; z-order written as 16 files.
    // With linear clustering on x, a y-band touches EVERY file; z-order
    // bounds either band to a strict subset of files.
    val grid = for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder_spec").toString
    val path = s"$dir/z.parquet"
    Layout.zorderWrite(df, path, Seq("x", "y"), files = 16, bits = 6)
    val re = spark.read.parquet(path)
    assert(re.count() === 64L * 64L)
    def filesTouched(c: String): Long = re
      .filter(col(c).between(8L, 15L)) // one-eighth band
      .select(input_file_name()).distinct().count()
    // a perfect single-column sort would hit 2/16; scattered hits 16/16;
    // z-order must bound BOTH dimensions well below the full file set
    assert(filesTouched("x") <= 8L)
    assert(filesTouched("y") <= 8L)
  }

  test("manifest pruning opens only intersecting files, same rows as full scan") {
    import graft.sources.Manifest
    val dir = tmpPath("layout_manifest")
    // clustered layout -> disjoint file ranges -> pruning can bite
    Layout.clusteredWrite(spark.range(10000).toDF("id")
      .withColumn("v", col("id").cast("double")), dir, "v", files = 10)
    val manifest = Manifest.build(spark, dir, "v")
    assert(manifest.count() == 10)
    val pruned = Manifest.prunedRead(spark, dir, manifest, "v", 2500.0, 3499.0)
    val full = spark.read.parquet(dir)
      .filter(col("v").between(2500.0, 3499.0))
    assert(pruned.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      full.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // ~1000 of 10000 rows -> at most 3 of 10 range-partitioned files
    val opened = pruned.select(input_file_name()).distinct().count()
    assert(opened <= 3, s"opened $opened files")
    // empty band -> empty result, correct schema, no files opened
    val none = Manifest.prunedRead(spark, dir, manifest, "v", 1e9, 2e9)
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "v"))
  }

  test("compactionPlan packs first-fit-decreasing, deterministically") {
    val files = Seq("a" -> 70L, "b" -> 50L, "c" -> 40L, "d" -> 30L,
      "e" -> 10L, "f" -> 250L)
    val plan = Layout.compactionPlan(files, targetBytes = 100L)
    // FFD on sizes (250, 70, 50, 40, 30, 10): f alone in an oversize bin,
    // then {a=70, d=30}, then {b=50, c=40, e=10}
    assert(plan.map(t => t._1 -> t._3).toMap ==
      Map("f" -> 0, "a" -> 1, "d" -> 1, "b" -> 2, "c" -> 2, "e" -> 2))
    // invariants that must hold regardless of exact packing: every
    // non-singleton bin fits the target; plan is a permutation of input
    val byBin = plan.groupBy(_._3).values
    byBin.foreach { grp =>
      assert(grp.size == 1 || grp.map(_._2).sum <= 100L)
    }
    assert(plan.map(p => p._1 -> p._2).toSet == files.toSet)
    assert(plan == Layout.compactionPlan(files, 100L)) // deterministic
  }

  test("bloomFilteredWrite: filters land in the footers, results identical, absent-key row groups rejectable") {
    import org.apache.spark.sql.functions._
    val path = tmpPath("bloom_layout")
    // high-cardinality scattered keys: min/max zone maps span the whole
    // domain in every file, so only the bloom filter can prune
    val df = spark.range(20000)
      .select((pmod(col("id") * 2654435761L, lit(1000003L)) * 2).as("k"),
        col("id").as("v"))
    graft.sources.Layout.bloomFilteredWrite(df, path, Seq("k"), files = 4,
      ndvPerFile = 20000L)
    val back = spark.read.parquet(path)
    assert(back.count() === 20000L)
    // footer introspection: the bloom filter exists for k in every file
    val conf = spark.sparkContext.hadoopConfiguration
    val files = graft.sources.Layout.listDataFiles(spark, path).map(_._1)
    files.foreach { f =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), conf))
      try {
        import scala.jdk.CollectionConverters._
        val cols = rd.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        val kCols = cols.filter(_.getPath.toDotString == "k")
        assert(kCols.nonEmpty &&
          kCols.forall(_.getBloomFilterOffset > 0),
          s"no bloom filter for k in $f")
      } finally rd.close()
    }
    // equality semantics unchanged: present key found, absent key empty
    // (all keys are even; any odd key is absent but inside min/max)
    val some = df.limit(1).collect()(0).getLong(0)
    assert(back.filter(col("k") === some).count() >= 1L)
    assert(back.filter(col("k") === some + 1).count() === 0L)
  }

  test("compactSmallFiles rewrites only small files and preserves rows") {
    val dir = tmpPath("layout_compact_in")
    val out = tmpPath("layout_compact_out")
    // 2000 rows scattered over 20 tiny files
    spark.range(2000).toDF("id").repartition(20)
      .write.mode("overwrite").parquet(dir)
    val before = Layout.listDataFiles(spark, dir)
    assert(before.size == 20)
    val totalBytes = before.map(_._2).sum
    val (rewritten, bins) = Layout.compactSmallFiles(spark, dir, out,
      targetBytes = totalBytes / 2 + 1, smallThreshold = Long.MaxValue)
    assert(rewritten == 20)
    assert(bins >= 2 && bins <= 3)
    assert(Layout.listDataFiles(spark, out).size == bins)
    assert(spark.read.parquet(out).count() == 2000L)
    // nothing below the threshold -> no-op
    assert(Layout.compactSmallFiles(spark, dir, out + "2",
      targetBytes = 1L << 20, smallThreshold = 1L) == ((0, 0)))
  }
}
