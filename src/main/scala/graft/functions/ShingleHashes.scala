package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct 64-bit shingle hashes of a string — the VERIFY-side twin
  * of [[WordNgrams]]. Emits `sort_array(array_distinct(transform(
  * word_ngrams(text, n), s -> xxhash64(s))))` (bit-identical, spec-locked:
  * the hash is Spark's own `xxhash64` — XXH64 over the UTF8 bytes, seed 42 —
  * so `pmod(h, 2^31-1)` of an element equals [[graft.operators.Dedup
  * .shingleHash]] of the corresponding shingle string and the MinHash path
  * stays bit-for-bit unchanged when derived from this kernel's output).
  *
  * Why it exists: the exact-Jaccard verify stage of the LSH near-dup flow
  * dominated the heaviest bench probe (x_dedup10x_pairs 11.9 s of the
  * 15.9 s full path) because every candidate pair intersected ARRAYS OF
  * STRINGS — two hash-set builds (array_intersect + array_union) over
  * UTF8String keys per pair, and the string arrays rode both verify-join
  * shuffles. Hashing in the scan stage makes the join payload 8 bytes per
  * shingle and turns the per-pair verify into one branch-free merge over
  * sorted longs ([[SortedLongJaccard]]).
  *
  * Exactness: hashed-set Jaccard equals string-set Jaccard unless two
  * DISTINCT shingles of the same doc pair collide in 64 bits — probability
  * ≈ S²·2⁻⁶⁴ per pair (< 10⁻¹² at S = 10⁴ shingles), and the tri-scale
  * DuckDB oracle gate (exact string Jaccard on the full pair set) verifies
  * zero collisions on the fixtures. Consumers that promise BIT-exactness
  * ([[graft.operators.Dedup.ngramJaccardPairs]]) keep the string verify. */
case class WordNgramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n-gram order must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hashes expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgramHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WordNgramHashes.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)

  override def prettyName: String = "word_ngram_hashes"
}

object WordNgramHashes {
  /** Static kernel shared by eval and generated code: same tokenization and
    * n-gram join as [[WordNgrams.compute]], then Spark's xxhash64 (seed 42)
    * per n-gram, sort, in-place dedup. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" +", -1)
    if (toks.length < n)
      return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val m = toks.length - n + 1
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      hs(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < m) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) hs else java.util.Arrays.copyOf(hs, w))
  }
}

/** Exact Jaccard |∩|/|∪| of two SORTED DISTINCT long arrays in one merge
  * pass — the verify kernel over [[WordNgramHashes]] output. Bit-identical
  * to `size(array_intersect(a, b)) / size(array_union(a, b))` on the same
  * arrays (spec-locked), including the 0/0 → NaN edge for two empty sets
  * (short docs below the shingle order), without the two per-pair hash-set
  * builds. Inputs MUST be sorted distinct; both producers in this package
  * guarantee it. */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted_hashes expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedLongJaccard.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedLongJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sorted_hashes"
}

object SortedLongJaccard {
  /** Static merge kernel shared by eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val la = a.numElements()
    val lb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < la && j < lb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = la + lb - inter
    if (union == 0) Double.NaN else inter.toDouble / union
  }
}
