package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampled frames for a join whose BOTH sides were filtered to the same
  * key universe, plus the Horvitz–Thompson scale for SUM/COUNT estimates
  * over the joined result. */
final case class UniverseSampled(left: DataFrame, right: DataFrame,
    scaleFactor: Double)

/** Universe (correlated) sampling for joins — the only sampling design
  * that commutes with an equi-join.
  *
  * Sampling through a join is where per-row designs break: if each side is
  * Bernoulli-sampled independently at rate p, a join pair survives with
  * probability p² (quadratically fewer rows, enormous variance), and
  * per-key structure — group counts, distinct keys, foreign-key fan-out —
  * is destroyed. The published fix (Quickr, SIGMOD'16 "Quickr: Lazily
  * approximating complex ad-hoc queries in big data clusters", §4.3
  * "universe sampling"; also join synopses, AQUA) is to sample the KEY
  * UNIVERSE: pick a deterministic hash h(k) → [0, M) and keep, on BOTH
  * sides, exactly the rows whose join key lands in the same hash band.
  * Then the sampled join IS the true join restricted to a p-fraction of
  * the key space — every surviving key keeps its complete fan-out on both
  * sides, so any per-key aggregate is exact for sampled keys, and
  * SUM/COUNT over the join scale by 1/p (a single-stage cluster-sampling
  * design clustered on join key).
  *
  * The reference has no join operator at all (SURVEY §2.5 — single-table
  * engine); this is its sampling philosophy (deterministic key-arithmetic
  * designs, executor.cpp:36-41's `rowid % step` rewrite) lifted to the
  * multi-table surface Spark gives us.
  *
  * 100 TB posture: the band predicate is a pure scan-stage filter on each
  * side — pushed inside both scans, no shuffle added — and everything
  * downstream shrinks by 1/p: BOTH shuffle legs of the join move p of
  * their rows (independent-Bernoulli would need p on one side and 1 on
  * the other for unbiased per-key semantics), and at typical p a
  * shuffle-join build side drops under the AQE broadcast threshold, so
  * the sampled plan often loses its shuffle entirely. The hash is affine
  * over a pre-modded key (overflow-free for any 64-bit key) and
  * deterministic, so a foreign engine reproduces the exact sample — the
  * driver hash-gates the ESTIMATE, not a tolerance band.
  *
  * Statistical contract: unbiased for SUM/COUNT over the join under the
  * usual universe-sampling assumption (key-level clusters are the
  * sampling unit; variance is driven by per-key totals, so a heavy-hitter
  * key inflates variance — pair with [[graft.operators.Skew]] profiling
  * when keys are skewed). AVG/ratios are self-normalizing: no scaling.
  */
object JoinSampling {

  /** Hash-band modulus: bands are thousandths of the key universe. */
  val M = 1000L
  private val PreMod = 1000003L

  /** Deterministic universe band of a join key — uniform over [0, M) for
    * keys uniform mod [[PreMod]]; `(key % 1000003) * 8191 + 131` stays
    * under 2^34, overflow-free in any engine. Non-negative keys only
    * (engines disagree on negative mod). */
  def band(key: Column): Column =
    pmod(pmod(key, lit(PreMod)) * lit(8191L) + lit(131L), lit(M))

  /** SQL text of [[band]] for oracle twins. */
  def bandSql(keyExpr: String): String =
    s"(($keyExpr % $PreMod) * 8191 + 131) % $M"

  /** Filter BOTH join sides to the key universe whose band lies in
    * `[from, until)`; estimates over the joined result scale by
    * `M / (until - from)`. `until - from = 100` keeps 10% of the key
    * universe. The bands for distinct `[from, until)` windows partition
    * the key space, so the union of all bands replays the exact join —
    * the identity JoinSamplingSpec pins. */
  def universeSample(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      from: Long = 0L, until: Long = 100L): UniverseSampled = {
    require(0 <= from && from < until && until <= M,
      s"band window [$from, $until) must lie within [0, $M)")
    UniverseSampled(
      left.filter(band(leftKey) >= lit(from) && band(leftKey) < lit(until)),
      right.filter(band(rightKey) >= lit(from) && band(rightKey) < lit(until)),
      M.toDouble / (until - from).toDouble)
  }
}
