package graft

import org.apache.spark.sql.functions._

import graft.exec.{Estimators, Sampling}
import graft.model.AggKind

/** Property-style tests for the estimator algebra (SURVEY §5 test plan):
  * scale-invariance, degeneracy at full sampling, partition property, CI
  * shape — over seeded random tables (no scalatest↔scalacheck bridge in the
  * offline cache, so cases are generated with a fixed-seed RNG). */
class PropertySpec extends SparkSpec {

  private def table(values: Seq[Double]) = {
    import spark.implicits._
    values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
  }

  private val rng = new scala.util.Random(20260812L)
  private def randomValues(): List[Double] =
    List.fill(50 + rng.nextInt(250))(rng.nextDouble() * 2000.0 - 1000.0)

  test("systematic step=1 is exact for any data (property)") {
    (1 to 5).foreach { _ =>
      val vs = randomValues()
      val sf = Sampling.systematic(table(vs), col("id"), 1L)
      val got = Estimators.scaledAgg(sf, AggKind.Sum, col("x"), "s").head.getDouble(0)
      val want = vs.sum
      assert(math.abs(got - want) <= 1e-6 * math.max(1.0, math.abs(want)))
    }
  }

  test("systematic samples over all offsets partition the table (property)") {
    (1 to 5).foreach { _ =>
      val vs = randomValues()
      val step = 2L + rng.nextInt(6)
      val df = table(vs)
      val total = (0L until step).map(off =>
        Sampling.systematic(df, col("id"), step, off).df.count()).sum
      assert(total === vs.size.toLong, s"offsets at step $step must partition")
    }
  }

  test("scaled COUNT under systematic sampling on dense keys is near-exact") {
    (1 to 5).foreach { _ =>
      val vs = randomValues()
      val step = 2L + rng.nextInt(9)
      val sf = Sampling.systematic(table(vs), col("id"), step)
      val est = sf.df.count() * step
      // dense ids: residue-class count differs from n/step by < 1
      assert(math.abs(est - vs.size.toLong) < step * step)
    }
  }

  test("CI is centered on the estimate with non-negative width (property)") {
    (1 to 5).foreach { _ =>
      val vs = randomValues()
      val sf = Sampling.systematic(table(vs), col("id"), 2L)
      val r = Estimators.ciAgg(sf, AggKind.Avg, col("x"), "a").head
      val (v, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(lo <= v && v <= hi)
      assert(math.abs((v - lo) - (hi - v)) < 1e-9)
    }
  }

  test("uniform estimator is unbiased across seeds (mean of estimates ≈ truth)") {
    val vs = randomValues().map(math.abs) // positive for stable relative error
    val df = table(vs)
    val want = vs.sum
    val ests = (1 to 20).map { s =>
      Estimators.scaledAgg(Sampling.uniform(df, 0.3, seed = s.toLong),
        AggKind.Sum, col("x"), "s").head.getDouble(0)
    }
    val meanEst = ests.sum / ests.size
    assert(math.abs(meanEst - want) / want < 0.15,
      s"mean of 20 seeded estimates $meanEst vs $want")
  }

  test("CountMin never underestimates, any key distribution (property)") {
    import spark.implicits._
    (1 to 3).foreach { _ =>
      // skewed: ~half the rows land on one hot key
      val keys = List.fill(100 + rng.nextInt(300))(
        if (rng.nextBoolean()) 7L else rng.nextInt(1000).toLong)
      val df = keys.toDF("k")
      val est = graft.functions.CountMin.estimate(
          graft.functions.CountMin.build(df, col("k"), width = 32),
          df, col("k"), width = 32)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
      truth.foreach { case (k, n) =>
        assert(est(k) >= n, s"CMS under-counts key $k: ${est(k)} < $n")
      }
    }
  }

  test("histogram quantile brackets every p for any data and bin width (property)") {
    import spark.implicits._
    (1 to 3).foreach { _ =>
      val vs = randomValues()
      val df = vs.toDF("x")
      val (lo, width, nBins) = (-1000.0, 125.0, 16)
      val hist = graft.exec.HistQuantile.histogram(df, col("x"), lo, width, nBins)
      val ps = Seq(0.1, 0.5, 0.9, 1.0)
      val est = graft.exec.HistQuantile.quantiles(hist, lo, width, ps)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val sorted = vs.sorted
      ps.foreach { p =>
        // the true p-quantile's bin and the estimate's bin are one apart
        // at most (estimate is exact within-bin interpolation)
        val exact = sorted(math.ceil(p * vs.size).toInt - 1)
        assert(math.abs(est(p) - exact) <= 2 * width,
          s"p=$p est=${est(p)} exact=$exact")
      }
      // p=1.0 lands at the top of the last non-empty bin, never beyond
      assert(est(1.0) <= lo + width * nBins)
    }
  }

  test("threshold-fused Jaccard kernel == plain kernel + filter (property)") {
    // SortedLongJaccardGE licenses early exits for sub-threshold pairs;
    // this locks its contract: NaN exactly when the plain J < t (or the
    // 0/0 edge), the EXACT plain value otherwise — over random sorted
    // distinct arrays including adversarial shapes (disjoint, identical,
    // subset, skewed sizes, empty).
    import org.apache.spark.sql.catalyst.util.ArrayData
    import graft.functions.SortedLongJaccard
    def arr(xs: Seq[Long]): ArrayData =
      ArrayData.toArrayData(xs.distinct.sorted.toArray)
    val kRng = new scala.util.Random(20260815L)
    def randomSet(): Seq[Long] =
      Seq.fill(kRng.nextInt(60))(kRng.nextInt(40).toLong)
    val shapes = Seq[(Seq[Long], Seq[Long])](
      (Nil, Nil), (Nil, Seq(1L, 2L)), (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L), Seq(3L, 4L)), (Seq(1L), (1L to 50L)),
      ((1L to 50L), Seq(50L))) ++
      Seq.fill(200)((randomSet(), randomSet()))
    val thresholds = Seq(0.0, 0.1, 0.3333333333333333, 0.5, 0.8, 0.99, 1.0)
    shapes.foreach { case (xs, ys) =>
      val a = arr(xs); val b = arr(ys)
      val plain = SortedLongJaccard.compute(a, b)
      thresholds.foreach { t =>
        val ge = SortedLongJaccard.computeGE(a, b, t)
        if (java.lang.Double.isNaN(plain) || plain < t)
          assert(java.lang.Double.isNaN(ge),
            s"expected NaN for xs=$xs ys=$ys t=$t plain=$plain got $ge")
        else assert(ge === plain,
          s"value drift for xs=$xs ys=$ys t=$t: $ge != $plain")
      }
    }
    // codegen path: the fused filter keeps exactly the rows the plain
    // filter keeps, with identical values, on the real fixture kernels
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf0001).limit(400)
      .select(col("doc_id"), Dedup.shingleHashes64(col("text"), 3).as("sh"))
    // sampled cross pairs (mostly sub-threshold) + planted exact copies
    // (J = 1), so both the early-exit and the exact-value paths fire
    val left = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val right = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val pairs = left.join(right,
        (col("id_a") < col("id_b") &&
          pmod(col("id_a") + col("id_b"), lit(37L)) === 0) ||
        col("id_b") === col("id_a"))
    def rows(c: org.apache.spark.sql.Column, keep: org.apache.spark.sql.Column) =
      pairs.select(col("id_a"), col("id_b"), c.as("j")).filter(keep)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plainRows = rows(Dedup.jaccardHashed(col("sh_a"), col("sh_b")),
      col("j") >= 0.3)
    assert(plainRows.nonEmpty, "fixture must yield passing pairs")
    val fusedRows = rows(Dedup.jaccardHashedGE(col("sh_a"), col("sh_b"), 0.3),
      col("j").isNotNull)
    assert(plainRows === fusedRows && fusedRows.nonEmpty)
  }

  test("fused Jaccard kernel refuses non-finite and out-of-range thresholds") {
    // round-8 ADVICE: the threshold is interpolated into generated Java
    // source — NaN/Infinity would fail janino at runtime (and NaN would
    // split interpreted vs codegen semantics). Construction must throw.
    import graft.operators.Dedup
    Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        -0.1, 1.5).foreach { t =>
      val e = intercept[IllegalArgumentException] {
        Dedup.jaccardHashedGE(col("a"), col("b"), t)
      }
      assert(e.getMessage.contains("threshold"), s"t=$t: ${e.getMessage}")
    }
    // the boundary values stay legal
    Dedup.jaccardHashedGE(col("a"), col("b"), 0.0): Unit
    Dedup.jaccardHashedGE(col("a"), col("b"), 1.0): Unit
  }
}
