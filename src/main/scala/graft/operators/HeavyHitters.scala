package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT heavy hitters (frequent items) at scale via a two-pass
  * sketch-then-verify plan — the aggregation analogue of the repo's
  * LSH-then-verify dedup shape:
  *
  *   pass 1  per-partition Misra–Gries summaries over `xxhash64(key)` —
  *           at most k counters per partition regardless of key
  *           cardinality, so the candidate "shuffle" is a broadcast-sized
  *           list ∝ partitions × 1/support, never ∝ distinct keys
  *   pass 2  exact counts for candidate keys only (broadcast semi-join
  *           filters the scan BEFORE the groupBy), filtered to the true
  *           support threshold
  *
  * Guarantee (pigeonhole over partitions): any key with global count
  * > N/(k+1) survives Misra–Gries in at least one partition, and
  * k = 2·⌈1/support⌉ makes N/(k+1) < support·N ≤ threshold — so pass 1's
  * union is a superset of the true heavy hitters and pass 2 makes the
  * result exact and deterministic (independent of partitioning; hash
  * collisions only widen the candidate set). A plain groupBy-then-filter
  * computes the same answer but shuffles every distinct key — on a
  * heavy-tailed 100 TB key space that is the dominant cost; here the
  * full-cardinality shuffle never happens.
  *
  * mapPartitions is justified (SURVEY §7 preference order): Misra–Gries
  * is genuinely per-partition imperative state with data-dependent
  * eviction — no Catalyst aggregate expresses "bounded counters with
  * global decrement".
  */
object HeavyHitters {

  /** Per-partition Misra–Gries candidate hashes: every key whose
    * partition-local count exceeds n_p/(k+1) is guaranteed to survive.
    * Amortized O(1) per row (each decrement sweep destroys k tokens). */
  private[operators] def candidateHashes(df: DataFrame, key: Column, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(xxhash64(key).as("h")).as[Long].mapPartitions { it =>
      val counters = new java.util.HashMap[Long, Long](k * 2)
      while (it.hasNext) {
        val x = it.next()
        val cur = counters.get(x)
        if (cur != 0L || counters.containsKey(x)) counters.put(x, cur + 1L)
        else if (counters.size < k) counters.put(x, 1L)
        else {
          // decrement-all; drop zeros (classic Misra–Gries eviction)
          val iter = counters.entrySet().iterator()
          while (iter.hasNext) {
            val e = iter.next()
            if (e.getValue <= 1L) iter.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      counters.keySet().asScala.iterator
    }.toDF("h").distinct()
  }

  /** Keys of `df` whose exact row count is ≥ `support` × N, with that
    * exact count as `countAlias`. Two jobs: the candidate sketch pass and
    * the scoped exact count (plus one metadata-only count for N). */
  def heavyHitters(df: DataFrame, keyCol: String, support: Double,
      countAlias: String = "n"): DataFrame = {
    require(support > 0 && support < 1, "support must be in (0,1)")
    val total = df.count() // parquet metadata count — no data scan
    val threshold = math.ceil(support * total).toLong
    val k = 2 * math.ceil(1.0 / support).toInt
    val cand = candidateHashes(df, col(keyCol), k)
    df.join(broadcast(cand), xxhash64(col(keyCol)) === col("h"), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as(countAlias))
      .filter(col(countAlias) >= threshold)
  }
}
