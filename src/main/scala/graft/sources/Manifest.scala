package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max manifest — table-format-style data skipping (the
  * public idea behind Iceberg/Delta file statistics) without a table
  * format: one pass over a directory records each part-file's column
  * bounds; later band/point reads consult the manifest (a tiny table,
  * rows = file count) and open ONLY the files whose range intersects the
  * predicate.
  *
  * This prunes at PLANNING time from a manifest lookup — one level above
  * parquet row-group zone maps ([[Layout]] probes those): zone maps still
  * require opening every footer; the manifest never touches excluded
  * files at all. The two compose: manifest prunes files, zone maps prune
  * row groups inside the survivors — and both only bite if the write
  * side clustered the column ([[Layout.clusteredWrite]]/[[Layout
  * .zorderWrite]]); on a hash-scattered layout every file's range spans
  * the domain and nothing prunes.
  *
  * Scale shape: building is one distributed scan (groupBy on
  * `input_file_name` — combines map-side to one row per file); pruning
  * reads the manifest (metadata-sized) to the driver and hands Spark an
  * explicit file list. Persist the manifest next to the data and refresh
  * incrementally on append — only new files need stats.
  */
object Manifest {

  /** Build the manifest for one numeric column: `(file, min_v, max_v,
    * n_rows)`, one row per part-file. */
  def build(spark: SparkSession, dir: String, c: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c)).as("min_v"), max(col(c)).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** Read only the files whose [min_v, max_v] intersects [lo, hi], with
    * the band filter re-applied (the manifest prunes files, it does not
    * subset rows). `manifest` may be freshly built or loaded from disk.
    * Returns an empty frame (correct schema) when nothing intersects. */
  def prunedRead(spark: SparkSession, dir: String, manifest: DataFrame,
      c: String, lo: Double, hi: Double): DataFrame = {
    val keep = manifest
      .filter(col("max_v").cast("double") >= lo &&
        col("min_v").cast("double") <= hi)
      .select(col("file")).collect().map(_.getString(0)) // rows = file count
    val base =
      if (keep.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(keep.toIndexedSeq: _*)
    base.filter(col(c).cast("double").between(lo, hi))
  }
}
