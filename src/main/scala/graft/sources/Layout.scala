package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout (sort-on-write) helpers — the write-side half of zone-map
  * pruning. Parquet keeps min/max stats per row group; a scan with a
  * pushed-down predicate skips any row group whose stats exclude the band.
  * Whether that skips 0% or 97% of a 100 TB table is decided entirely at
  * WRITE time by how rows map to files:
  *
  *   - [[clusteredWrite]] range-clusters on ONE column: near-perfect
  *     pruning for that column, none for any other.
  *   - [[zorderWrite]] interleaves the bits of SEVERAL columns' range-bin
  *     ranks (Morton/Z-order — the public technique behind Delta/Iceberg
  *     `OPTIMIZE ZORDER BY`): a band on ANY of the columns prunes to
  *     roughly N^((k-1)/k) of the files, trading the single-column
  *     optimum for multi-predicate coverage.
  *
  * The z-value is a plain bit-arithmetic Column expression (shifts / AND /
  * OR only) — whole-stage-codegen'd in the write job's projection, no UDF.
  * Bench probes `x_layout_*` / `x_zorder_*` measure both layouts against a
  * hash-scattered baseline at 60 M rows.
  */
object Layout {

  /** Interleave the low `bits` bits of pre-binned non-negative longs:
    * bit `j` of `binCols(i)` lands at z-bit `j * k + i` (k = column
    * count). Requires `bits * k <= 63`. */
  def zValue(binCols: Seq[Column], bits: Int): Column = {
    val k = binCols.size
    require(k >= 1 && bits >= 1 && bits * k <= 63,
      s"bits*k must fit a signed long, got $bits*$k")
    val terms = for {
      i <- 0 until bits
      (c, ci) <- binCols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + ci)
    terms.foldLeft(lit(0L))(_ bitwiseOR _)
  }

  /** Rank a numeric column into `2^bits` equi-width bins over [minV, maxV]
    * (min/max from a cheap pre-pass agg), clamped to the bin range. */
  def rangeBin(c: Column, minV: Double, maxV: Double, bits: Int): Column = {
    val top = (1L << bits) - 1L
    val span = math.max(maxV - minV, java.lang.Double.MIN_NORMAL)
    least(lit(top), greatest(lit(0L),
      floor((c.cast("double") - lit(minV)) / lit(span) * lit(top.toDouble))
        .cast("long")))
  }

  /** Write `df` range-clustered on one column: `files` range partitions,
    * rows sorted within each — every parquet row group covers a narrow
    * slice of `c`'s domain, so min/max stats prune band predicates on `c`
    * almost perfectly. */
  def clusteredWrite(df: DataFrame, path: String, c: String,
      files: Int): Unit =
    df.repartitionByRange(files, col(c)).sortWithinPartitions(col(c))
      .write.mode("overwrite").parquet(path)

  /** Write `df` with parquet BLOOM FILTERS on `bloomCols` — the scan
    * lever for point/equality predicates on columns the physical sort
    * CANNOT serve: a hash-scattered high-cardinality column spans the
    * full domain in every row group, so min/max zone maps prune nothing;
    * a per-row-group bloom filter rejects row groups that definitely
    * lack the key. The payoff is largest for ABSENT keys (membership
    * probes, decontamination id checks, CDC key lookups): every row
    * group is rejected from the footer alone and the data pages are
    * never decoded. False-positive rate `fpp` trades footer bytes for
    * pruning power; the reader (parquet-mr) consults the filters
    * automatically for `=` / `IN` predicates, nothing to configure at
    * read time. Composable with [[clusteredWrite]]/[[zorderWrite]]'s
    * sort levers — sort serves the band columns, bloom serves the
    * point-lookup ones. */
  def bloomFilteredWrite(df: DataFrame, path: String, bloomCols: Seq[String],
      files: Int, fpp: Double = 0.01, ndvPerFile: Long = 1000000L): Unit = {
    require(bloomCols.nonEmpty)
    val w = df.repartition(files).write.mode("overwrite")
    val withOpts = bloomCols.foldLeft(w) { (acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndvPerFile.toString)
        .option(s"parquet.bloom.filter.fpp#$c", fpp.toString)
    }
    withOpts.parquet(path)
  }

  /** First-fit-decreasing bin-packing of part-files into compaction
    * groups. Files are sorted by (size desc, path) — fully deterministic —
    * and each is placed in the first bin with room; a file at or above
    * `targetBytes` gets a bin of its own. Pure metadata: driver-side,
    * O(files × bins) on the file LISTING — at 100 TB that is the file
    * count (the small-file problem this exists to fix), never the data.
    * Returns (path, size, bin). */
  def compactionPlan(files: Seq[(String, Long)],
      targetBytes: Long): Seq[(String, Long, Int)] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val sorted = files.sortBy { case (p, sz) => (-sz, p) }
    val binFree = scala.collection.mutable.ArrayBuffer.empty[Long]
    sorted.map { case (p, sz) =>
      val fit = binFree.indexWhere(_ >= sz)
      val bin = if (fit >= 0) {
        binFree(fit) -= sz; fit
      } else {
        binFree += (targetBytes - sz).max(0L); binFree.size - 1
      }
      (p, sz, bin)
    }
  }

  /** Data files (name, bytes) under a parquet output directory, via the
    * Hadoop FS API (local, HDFS, object stores alike); `_SUCCESS`/metadata
    * files excluded, ordered by path. */
  def listDataFiles(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, Long)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(s => s.getPath.toString -> s.getLen)
      .sortBy(_._1)
  }

  /** Compact the small files of `dir` (strictly below `smallThreshold`
    * bytes) into ~`targetBytes` outputs under `outDir`, leaving large
    * files where they are. All small files are read in ONE multi-path job
    * and repartitioned to the planned bin count — compaction cares how
    * many output files exist, not which rows land in which, so a plain
    * round-robin repartition is the cheapest correct move (no sort, one
    * shuffle of only the small-file rows). Returns (files rewritten,
    * output files written); the caller swaps directories atomically the
    * way [[graft.streaming.UpsertSink]] versions its snapshots. */
  def compactSmallFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
      outDir: String, targetBytes: Long, smallThreshold: Long): (Int, Int) = {
    val small = listDataFiles(spark, dir).filter(_._2 < smallThreshold)
    if (small.isEmpty) return (0, 0)
    val nBins = compactionPlan(small, targetBytes).map(_._3).max + 1
    spark.read.parquet(small.map(_._1): _*)
      .repartition(nBins)
      .write.mode("overwrite").parquet(outDir)
    (small.size, nBins)
  }

  /** Write `df` Z-ordered on `cols` (numeric): one min/max pre-pass, bin
    * each column to `bits` bits, range-partition + sort on the interleaved
    * z-value. Band predicates on ANY of `cols` prune row groups; none is
    * favored. The z column itself is dropped before writing. */
  def zorderWrite(df: DataFrame, path: String, cols: Seq[String],
      files: Int, bits: Int = 16): Unit = {
    val stats = df.agg(
      cols.flatMap(c => Seq(min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c"))).head,
      cols.flatMap(c => Seq(min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c"))).tail: _*).first()
    val bins = cols.zipWithIndex.map { case (c, i) =>
      rangeBin(col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bits)
    }
    df.withColumn("__z", zValue(bins, bits))
      .repartitionByRange(files, col("__z")).sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
