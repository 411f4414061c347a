package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch as relational algebra — a mergeable frequency summary
  * (Cormode & Muthukrishnan 2005) for "how often does key X appear in
  * 100 TB" point lookups without retaining per-key counts. The sketch is a
  * tiny `(hash_idx, bucket, cnt)` table of at most `depth × width` rows;
  * estimates are an upper bound on the true count (collisions only ever
  * inflate), and sketches over disjoint row sets MERGE BY ADDING bucket
  * counts — per-day sketches roll up to a month without rescanning.
  *
  * Everything is integer arithmetic on a Mersenne-prime field
  * (`((key mod P) * a + b) mod P mod width`, P = 2^31−1), so buckets —
  * and therefore the whole sketch — are deterministic and reproducible in
  * any engine, which is what lets the driver oracle-check q98 bit-exactly.
  * `(key mod P) < 2^31` and `a < 2^31` keep the product under 2^62: no
  * ANSI overflow for any BIGINT key. Keys must be non-negative (engines
  * disagree on negative `mod`).
  *
  * Scale shape: build is explode(depth) → hash-groupBy with map-side
  * combine — shuffle volume is bounded by depth×width regardless of input
  * rows; estimate is a broadcast-sized join of probes against the sketch.
  */
object CountMin {

  val Prime = 2147483647L // 2^31 − 1

  /** Pairwise-independent-ish hash params (a, b) — depth = 4 rows. */
  val params: Seq[(Long, Long)] =
    Seq((1103515245L, 12345L), (69069L, 362437L), (214013L, 2531011L),
      (134775813L, 19L))

  def depth: Int = params.length

  /** Bucket of `key` under hash row (a, b): ((key mod P)·a + b) mod P mod w. */
  def bucket(key: Column, a: Long, b: Long, width: Int): Column =
    pmod(pmod(pmod(key, lit(Prime)) * lit(a) + lit(b), lit(Prime)), lit(width.toLong))

  /** Build the sketch table `(hash_idx, bucket, cnt)` over `key`. */
  def build(df: DataFrame, key: Column, width: Int): DataFrame = {
    require(width > 0, "width must be positive")
    df.select(posexplode(array(params.map { case (a, b) =>
        bucket(key, a, b, width) }: _*)).as(Seq("hash_idx", "bucket")))
      .groupBy(col("hash_idx"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built with the same params/width: bucket counts add. */
  def merge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "nothing to merge")
    sketches.reduce(_ unionAll _)
      .groupBy(col("hash_idx"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Equi-join cardinality estimate from two sketches over the join key
    * (AMS-style inner product, Alon–Matias–Szegedy 1996): per hash row,
    * Σ_buckets cntA·cntB ≥ the true join size (collisions only inflate);
    * the min over rows is the estimate. This is the sketch a planner
    * consults to size a shuffle BEFORE running the join — both sketches
    * are ≤ depth×width rows, so the estimate itself costs nothing.
    * Products accumulate in decimal(38,0): no overflow at any scale. */
  def joinSizeEstimate(sketchA: DataFrame, sketchB: DataFrame): DataFrame =
    sketchA.join(sketchB.withColumnRenamed("cnt", "cnt_b"),
        Seq("hash_idx", "bucket"))
      .groupBy(col("hash_idx"))
      .agg(sum(col("cnt").cast("decimal(18,0)") *
        col("cnt_b").cast("decimal(18,0)")).as("ip"))
      .agg(min(col("ip")).cast("long").as("join_size_est"))

  /** Estimated frequency of each distinct probe key: min over hash rows of
    * its bucket count (0 when a bucket is empty — key definitely absent). */
  def estimate(sketch: DataFrame, probes: DataFrame, key: Column,
      width: Int): DataFrame = {
    val pb = probes.select(key.as("probe_key")).distinct()
      .select(col("probe_key"),
        posexplode(array(params.map { case (a, b) =>
          bucket(col("probe_key"), a, b, width) }: _*)).as(Seq("hash_idx", "bucket")))
    pb.join(sketch, Seq("hash_idx", "bucket"), "left")
      .groupBy(col("probe_key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
