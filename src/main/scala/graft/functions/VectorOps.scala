package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as higher-order
  * expressions — codegen-evaluated per row inside the scan stage, no UDFs,
  * no shuffles (north-star similarity ops; no counterpart in the reference).
  *
  * Fold order is fixed (left fold over element index) so results are
  * bit-reproducible across engines: the DuckDB oracle mirrors
  * `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, +)` as
  * `list_reduce(list_prepend(0.0, [a[i]*b[i] for i ...]), (acc,v) -> acc+v)`.
  */
object VectorOps {

  /** Left-fold sum of an array<double> with explicit 0.0 init. */
  private def foldSum(products: Column): Column =
    aggregate(products, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float vectors, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(normSq(a)) * sqrt(normSq(b))
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }))

  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Sign-bit signature against `planes` fixed hyperplanes (random-projection
    * LSH for cosine distance): bit i = [dot(v, plane_i) >= 0]. Returns a
    * BIGINT bucket id (planes.length <= 63). Deterministic given the planes,
    * which the caller generates from a seed. */
  def hyperplaneSignature(v: Column, planes: Seq[Array[Double]]): Column = {
    require(planes.nonEmpty && planes.length <= 63, "1..63 planes")
    planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.toIndexedSeq.map(lit): _*)
      when(dot(v, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Deterministic pseudo-random unit-free hyperplanes (xorshift-seeded). */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }
}
