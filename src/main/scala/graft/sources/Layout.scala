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
