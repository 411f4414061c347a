package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing and snapshot compaction — the two "shape the corpus for
  * training" operators a pretraining pipeline runs after filtering/dedup.
  */
object Packing {

  /** Assign each row to a token-budget pack: rows are taken in `idCol`
    * order within each `partCol` group, and a row's pack is
    * `floor(tokens_before_it / budget)` — contiguous fill, so a document
    * that crosses a budget boundary overflows its pack rather than being
    * split (packing-with-overflow; real packers then truncate or split
    * downstream).
    *
    * Scale shape: ONE window per partition key — the cumulative sum is
    * computed per group, so parallelism = number of groups (pass a
    * date/shard/source column, never a constant: a single global order
    * would funnel 100 TB through one task). Output adds `pack` and
    * `pack_fill` (tokens before this row within its pack). */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      partCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(partCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(col(tokenCol)).over(w), lit(0L))
    df.withColumn("__before", before)
      .withColumn("pack", (col("__before") - pmod(col("__before"), lit(budget))) / lit(budget))
      .withColumn("pack", col("pack").cast("long"))
      .withColumn("pack_fill", pmod(col("__before"), lit(budget)))
      .drop("__before")
  }

  /** Latest row per key — CDC/snapshot compaction: for each `keyCols`
    * group keep the single row that is maximal by `orderCols` (descending,
    * with the LAST order column as a total-order tiebreak so the winner is
    * deterministic). Scale shape: window row_number over the key — one
    * shuffle on the key columns, no driver state; AQE splits skewed keys.
    */
  def latestPerKey(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Single-pass argmax: the row that is maximal by `orderCols`
    * (lexicographic, descending) per key, as ONE `max(struct(...))`
    * aggregate. Same winner as [[latestPerKey]] when the order columns
    * form a total order (make the last one a unique id), but the plan is
    * an aggregation, not a window: partial aggregation collapses each map
    * task to one candidate row per key BEFORE the exchange, so the shuffle
    * moves |keys| structs instead of every row.
    *
    * Measured caveat (BENCH x_argmax_*): struct buffers are not
    * hash-aggregable, so Spark plans a SortAggregate whose PARTIAL stage
    * locally sorts every row by the group key — at 6 M rows × 32 cores
    * that double sort makes this path comparable to or slower than the
    * window despite the smaller exchange. The shuffle-volume win only pays
    * off when the exchange (not the local sort) is the bottleneck — i.e.
    * on a real multi-node cluster with network-bound shuffle. For the
    * plan that wins on BOTH axes when the key space is modest, use
    * [[argmaxViaJoin]]. Order columns must be non-null (null field
    * ordering inside struct comparison would make the winner engine-
    * specific); only `orderCols ++ payloadCols` survive into the output. */
  def argmaxPerKey(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], payloadCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val carried = orderCols ++ payloadCols
    val best = df.groupBy(keyCols.map(col): _*)
      .agg(max(struct(carried.map(col): _*)).as("__best"))
    best.select(keyCols.map(col) ++
      carried.map(c => col(s"__best.$c").as(c)): _*)
  }

  /** Argmax with NO full-data shuffle and NO full-data sort — the plan to
    * reach for when the key space is modest (fits a broadcast, i.e. up to
    * tens of millions of keys):
    *
    *  1. hash-aggregate `max(orderCol)` per key — primitive buffer, so the
    *     partial stage is a codegen'd HashAggregate (no sort), and the
    *     exchange carries |keys| rows;
    *  2. join the per-key maxima back onto the fact and keep rows whose
    *     `orderCol` equals their key's max. The broadcast is NOT forced:
    *     a hint would override `autoBroadcastJoinThreshold` and OOM the
    *     driver at the tens-of-millions-of-keys end of this operator's
    *     stated range. With AQE on (every graft session), a small maxima
    *     side still converts to a broadcast join at runtime — the fact's
    *     exchange degrades to a local shuffle read, no network transfer —
    *     while a huge key space falls back to a shuffle join instead of
    *     killing the driver;
    *  3. break ties among the (few) surviving rows with a window ordered
    *     by `tieBreakCols` — input is at most |keys| × ties rows.
    *
    * At 100 TB: scan 1 reads only `keyCols + orderCol` (column pruning),
    * scan 2 streams the fact through a broadcast join — total network
    * traffic is 2 × |keys| rows instead of the corpus. The window paths
    * shuffle the corpus; [[argmaxPerKey]] sorts it twice locally.
    *
    * Measured caveat (BENCH x_argmax_join_*): on local[32] the fact scan
    * itself is the bottleneck (shuffle is an in-memory copy), so paying
    * TWO scans measures ~0.5× the window — the trade only pays where it
    * is aimed: network-bound shuffles (real clusters) or a cached/
    * pre-projected input. Pick by deployment: window/argmaxPerKey when
    * scans dominate, this when the exchange does.
    *
    * Groups whose `orderCol` is entirely NULL are dropped (max() is null,
    * and `null == null` joins false) — same "order columns must be
    * non-null" contract as [[argmaxPerKey]].
    *
    * `broadcastMaxes`: opt-in forced broadcast of the maxima side for
    * callers who KNOW the key cardinality is modest (rule of thumb:
    * < ~10M keys ≈ < ~1 GB driver/executor memory for a key+max row —
    * beyond that the hint is how drivers die, use the default). The
    * default (false) lets AQE decide: a small maxima side still becomes a
    * broadcast join at runtime, but the fact's exchange map-write has
    * already happened by then (local, no network) — measured ~2-4× slower
    * than the hinted plan on local[32], which is the price of not OOMing
    * on an unbounded key space. */
  def argmaxViaJoin(df: DataFrame, keyCols: Seq[String], orderCol: String,
      tieBreakCols: Seq[String], broadcastMaxes: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val maxes = df.groupBy(keyCols.map(col): _*)
      .agg(max(col(orderCol)).as("__max_ord"))
    val buildSide = if (broadcastMaxes) broadcast(maxes) else maxes
    val survivors = df.join(buildSide, keyCols)
      .filter(col(orderCol) === col("__max_ord"))
      .drop("__max_ord")
    if (tieBreakCols.isEmpty) survivors
    else latestPerKey(survivors, keyCols, tieBreakCols)
  }
}
