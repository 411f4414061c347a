package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature of a document in ONE scan-stage pass — the
  * round-14 optimization of [[graft.operators.Dedup.lshBands]]'s sketch
  * stage. The previous shape exploded every distinct shingle into its own
  * row (corpus × shingles rows), hashed each, and rebuilt per-doc signatures
  * with a 64-way `min` aggregate whose groupBy(id) EXCHANGE carried the
  * whole exploded stream; this expression computes the same 64 minima in a
  * precompiled loop over the document's shingles inside the scan, so the
  * sketch needs no explode, no aggregate, and no exchange at all — the
  * first shuffle of the LSH flow becomes the (band, band_sig) bucket
  * groupBy, whose input is numHashes longs per DOCUMENT.
  *
  * Bit-identical to the aggregate form (DedupSpec locks it): per n-gram
  * h = pmod(xxhash64(gram), p), signature element i = min over grams of
  * pmod(h·a_i + b_i, p), p = 2³¹−1, with (a_i, b_i) drawn interleaved from
  * scala.util.Random(seed) exactly as lshBands drew them. The min over the
  * n-gram MULTISET equals the min over the distinct-shingle SET, so the
  * kernel skips dedup outright; h < 2³¹ and a_i < 2³¹ keep h·a_i + b_i
  * below 2⁶² (no overflow). Docs with fewer than n tokens produced NO rows
  * under explode and therefore no signature — here they return NULL and
  * [[graft.operators.Dedup.lshBands]] filters them, preserving candidate
  * sets exactly. */
case class MinHashSig(child: Expression, n: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {

  require(n >= 1 && numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], n, numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.MinHashSig.compute($v, $n, $numHashes, ${seed}L);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  private val P = 2147483647L // 2^31 - 1, the universal-hash modulus

  /** (a_i, b_i) pairs for (numHashes, seed), memoized — drawn INTERLEAVED
    * (a then b per i) from one Random(seed), the exact order
    * Dedup.lshBands used, so signatures are bit-identical. */
  private val abCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  private def ab(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    abCache.computeIfAbsent((numHashes, seed), { case (k, s) =>
      val rng = new scala.util.Random(s)
      val as = new Array[Long](k)
      val bs = new Array[Long](k)
      var i = 0
      while (i < k) {
        as(i) = rng.nextInt(Int.MaxValue - 1).toLong + 1
        bs(i) = rng.nextInt(Int.MaxValue).toLong
        i += 1
      }
      (as, bs)
    })

  /** Static kernel shared by eval and generated code. Returns null when the
    * doc has fewer than n tokens (no shingles — the explode form emitted no
    * signature row). */
  def compute(s: UTF8String, n: Int, numHashes: Int, seed: Long): ArrayData = {
    val toks = s.toString.split(" +", -1)
    if (toks.length < n) return null
    val (as, bs) = ab(numHashes, seed)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, P)
    val sb = new java.lang.StringBuilder
    var i = 0
    val m = toks.length - n + 1
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      val h64 = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes, 42L)
      // Spark pmod semantics for a possibly-negative dividend
      var h = h64 % P
      if (h < 0) h += P
      var k = 0
      while (k < numHashes) {
        val g = (h * as(k) + bs(k)) % P // h, a < 2^31 => product < 2^62
        if (g < mins(k)) mins(k) = g
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
