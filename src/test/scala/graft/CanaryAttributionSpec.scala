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
}
