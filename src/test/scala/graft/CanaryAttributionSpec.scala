package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.bench.CanaryAttribution

/** Pins the bench self-defense v3 flagging policy on the two real
  * machine profiles that calibrated it (round-13 PLANS.md). */
class CanaryAttributionSpec extends AnyFunSuite {

  // r13 run 1's actual profile: healthy mid-run canaries 42-92 under
  // loadavg 0.3 — one pristine-moment spike must NOT flag anyone
  private val healthy = Seq(92.0, 60.2, 52.1, 51.5, 50.4, 48.4, 48.1,
    47.6, 46.5, 45.9, 45.3, 43.3, 42.9)

  test("healthy within-run spread (incl. a pristine spike) flags nothing") {
    val brackets = Seq(
      "x_argmax_window_sec" -> (45.9, 42.9),
      "x_skew_plain_sec" -> (46.5, 48.1),
      "x_q20_60m_sec" -> (43.3, 50.4))
    assert(CanaryAttribution.flagged(brackets, healthy) === Set.empty)
  }

  test("an r12-style mid-run collapse flags exactly the collapsed lanes") {
    // r12's cluster stamped lanes 4-35x over band — the host was at a
    // small fraction of healthy speed (~12-18 M rows/s vs ~55-60) while
    // those lanes ran. Mild ~2x dips (e.g. 25 vs median 55) stay UNDER
    // the flagging radar by design: they produce ~2x lane drift that
    // canary-scaled reading absorbs, and flagging them would mark half
    // of every normal run (healthy spread is ~2x, see the test above).
    val canaries = Seq(60.0, 58.0, 57.0, 55.0, 54.0, 15.0, 14.0, 13.0,
      12.0, 56.0, 59.0)
    val brackets = Seq(
      "x_priority60_topk_sec" -> (15.0, 14.0), // collapsed
      "x_unijoin60_exact_sec" -> (13.0, 12.0), // collapsed
      "x_skew_plain_sec" -> (57.0, 55.0), // healthy
      "x_q35_10x_sec" -> (56.0, 59.0)) // healthy
    assert(CanaryAttribution.flagged(brackets, canaries) ===
      Set("x_priority60_topk_sec", "x_unijoin60_exact_sec"))
  }

  test("one bad bracket side is enough — the lane PARTLY ran degraded") {
    val canaries = Seq(60.0, 60.0, 60.0, 60.0, 60.0, 20.0, 60.0)
    assert(CanaryAttribution.flagged(
      Seq("lane" -> (60.0, 20.0)), canaries) === Set("lane"))
  }

  test("median is the reference, max is not") {
    // if max (1000) were the reference, the 0.4 bar (400) would flag
    // every healthy lane; the median (50) bar (20) flags none
    val canaries = Seq(1000.0, 50.0, 49.0, 51.0, 50.0, 48.0, 52.0)
    assert(CanaryAttribution.flagged(
      Seq("lane" -> (48.0, 49.0)), canaries) === Set.empty)
  }

  test("redemption bar equals the flagging bar; empty runs flag nothing") {
    val canaries = Seq(50.0, 60.0, 40.0)
    assert(CanaryAttribution.redemptionBar(canaries) === 0.4 * 50.0)
    assert(CanaryAttribution.flagged(Seq("l" -> (1.0, 1.0)), Nil) === Set.empty)
    assert(CanaryAttribution.redemptionBar(Nil) === 0.0)
  }

  // --- redemption plausibility (round-14: verdict item 1) -------------

  test("the r13 stamp's 0.49 s unijoin60 redemption is REJECTED as too fast") {
    // the actual r13 numbers: lane flagged with bracket worst 14.48
    // M rows/s against a run median ~58.9; redemption canary in-band
    // (≥ 0.4 × 58.9 ≈ 23.6, take a healthy 58.0). Whatever the flagged
    // in-place value was (the builder's healthy band is 3.4–4.5 s; a
    // mid-dip measurement reads HIGHER), a redeemed 0.49 s sits far
    // below the full dip correction and must not stand.
    for (flagged <- Seq(3.4, 4.5, 13.0, 20.0)) {
      assert(!CanaryAttribution.plausibleRedemption(
        flaggedSec = flagged, bracketMinMrows = 14.48,
        redeemCanaryMrows = 58.0, redeemedSec = 0.49),
        s"0.49 must be rejected against flagged=$flagged")
    }
  }

  test("a redemption consistent with full dip correction is accepted") {
    // host at ~0.25x while the lane ran: flagged 16 s, true ~4 s —
    // the redeemed value near flagged x hostScale passes
    assert(CanaryAttribution.plausibleRedemption(
      flaggedSec = 16.0, bracketMinMrows = 14.5,
      redeemCanaryMrows = 58.0, redeemedSec = 4.2))
  }

  test("a clean-lane/dipped-bracket redemption near the flagged value is accepted") {
    // the dip happened OUTSIDE the lane's own batch (bracket caught it,
    // the value itself was healthy): redeemed ≈ flagged must pass even
    // though the full-correction prediction is far below
    assert(CanaryAttribution.plausibleRedemption(
      flaggedSec = 3.4, bracketMinMrows = 14.5,
      redeemCanaryMrows = 58.0, redeemedSec = 3.5))
  }

  test("a redemption slower than slowMargin x flagged is rejected") {
    assert(!CanaryAttribution.plausibleRedemption(
      flaggedSec = 3.0, bracketMinMrows = 50.0,
      redeemCanaryMrows = 55.0, redeemedSec = 5.0),
      "redemption exists to replace a dip-inflated number — meaningfully " +
        "slower means a worse host, not a better lane")
  }

  test("unbracketed spread-dirty lane: window is [fastMargin, slowMargin] x flagged") {
    // bracketMin = run median → hostScale ≈ 1
    assert(CanaryAttribution.plausibleRedemption(
      flaggedSec = 2.0, bracketMinMrows = 55.0,
      redeemCanaryMrows = 55.0, redeemedSec = 1.3))
    assert(!CanaryAttribution.plausibleRedemption(
      flaggedSec = 2.0, bracketMinMrows = 55.0,
      redeemCanaryMrows = 55.0, redeemedSec = 1.0))
  }

  test("degenerate inputs never validate a redemption") {
    assert(!CanaryAttribution.plausibleRedemption(-1.0, 50.0, 55.0, 1.0))
    assert(!CanaryAttribution.plausibleRedemption(1.0, 50.0, 55.0, -1.0))
  }
}
