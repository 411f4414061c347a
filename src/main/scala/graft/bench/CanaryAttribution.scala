package graft.bench

/** Pure decision kernel for Bench's self-defense v3 (round-12 verdict
  * item 1): per-lane canary attribution. Bench brackets every heavy lane
  * group with cheap fixed probes; THIS object owns the verdict — which
  * lanes ran on a degraded host — so the policy is unit-testable instead
  * of logic buried in a measurement main.
  *
  * Policy: a lane is flagged when the SLOWER of its two bracketing
  * canaries reads below `band` × the MEDIAN of all probes in the run.
  * The reference is the median, not the max: healthy mid-run canaries on
  * the bench host spread ~2× (GC/page-cache dips next to pristine-moment
  * spikes — r13 run 1 measured 42–92 M rows/s under loadavg 0.3), so a
  * max-relative bar flags healthy lanes, while a genuine collapse (r12:
  * lanes 4–35× over band) drags brackets to 0.3–0.45× of healthy — well
  * under 0.4 × median as long as the collapse does not span most of the
  * run (and when it does, the quiesce gate / polluted stamp own the
  * verdict instead). */
object CanaryAttribution {

  /** Default out-of-band threshold as a fraction of the median canary. */
  val DefaultBand = 0.4

  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of nothing")
    val v = xs.sorted
    v(v.size / 2)
  }

  /** Lane names whose bracketing canaries are out-of-band. `canaries` is
    * EVERY probe value measured in the run (brackets included). */
  def flagged(brackets: Iterable[(String, (Double, Double))],
      canaries: Seq[Double],
      band: Double = DefaultBand): Set[String] = {
    if (canaries.isEmpty) return Set.empty
    val bar = band * median(canaries)
    brackets.collect {
      case (name, (pre, post)) if math.min(pre, post) < bar => name
    }.toSet
  }

  /** The bar a redemption re-probe must clear: same band, same median —
    * a redeemed number is one measured at host speed. */
  def redemptionBar(canaries: Seq[Double],
      band: Double = DefaultBand): Double =
    if (canaries.isEmpty) 0.0 else band * median(canaries)

  /** Plausibility gate on the redeemed VALUE itself (round-13 verdict
    * item 1): an in-band canary proves the HOST was healthy during the
    * re-measure, but not that the re-measure ran the lane's plan — the
    * r13 driver stamp redeemed the 60 M-row no-broadcast shuffle join to
    * 0.49 s (healthy band 3.4–4.5 s) because the redemption thunk
    * observed a different plan. Too-FAST is as invalid as too-slow.
    *
    * Accepted window, derived from the flagged measurement itself:
    *  - upper bound `slowMargin × flaggedSec`: redemption exists to
    *    replace a dip-inflated number, so a redeemed value meaningfully
    *    SLOWER than the flagged one is measuring a worse host, not a
    *    better lane;
    *  - lower bound `fastMargin × flaggedSec × hostScale` where
    *    `hostScale = min(1, bracketMin / redeemCanary)` is the full
    *    correction if the ENTIRE flagged value were dip-inflation
    *    (canary M rows/s ∝ host speed, lane seconds ∝ 1/host speed).
    *    A lane cannot credibly run faster than its flagged time fully
    *    corrected for the observed dip, margin aside.
    *
    * A rejected redemption keeps the lane FLAGGED — the honest record is
    * "this number is dirty", never a plausible-but-wrong replacement.
    *
    * @param flaggedSec      the lane's in-run (flagged) measurement
    * @param bracketMinMrows slower side of the lane's canary bracket
    *                        (pass the run median when unbracketed —
    *                        hostScale then ≈ 1 and the window is simply
    *                        [fastMargin, slowMargin] × flagged)
    * @param redeemCanaryMrows the canary measured at redemption time */
  def plausibleRedemption(flaggedSec: Double, bracketMinMrows: Double,
      redeemCanaryMrows: Double, redeemedSec: Double,
      fastMargin: Double = 0.6, slowMargin: Double = 1.5): Boolean = {
    if (flaggedSec <= 0 || redeemedSec <= 0) return false
    val hostScale =
      if (redeemCanaryMrows > 0 && bracketMinMrows > 0)
        math.min(1.0, bracketMinMrows / redeemCanaryMrows)
      else 1.0
    redeemedSec >= fastMargin * flaggedSec * hostScale &&
      redeemedSec <= slowMargin * flaggedSec
  }
}
