package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a string, in first-occurrence order — the
  * shingling kernel under dedup/decontamination. The declarative form
  * (`array_distinct(transform(sequence(...), i => array_join(slice(toks,
  * i+1, n), " ")))`) allocates a sliced array plus a joined string per
  * token through interpreted lambda trees (the repo's ~100× penalty class;
  * PLANS.md MinHash history). This expression runs one precompiled loop
  * over the token array instead, called from whole-stage codegen, keeping
  * corpus shingling in the scan stage with NO shuffle (the explode+window
  * alternative is CPU-cheap but shuffles every token of the corpus — wrong
  * trade at 100 TB).
  *
  * Bit-identical to the declarative form (CurationSpec asserts): same
  * `split(" +", -1)` tokenization (leading/trailing empty tokens included,
  * exactly Spark's `split(text, " +")`), same space join, same
  * first-occurrence dedup order as `array_distinct`. Short docs
  * (< n tokens) yield an empty array. */
case class WordNgrams(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(n >= 1, s"n-gram order must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WordNgrams.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNgrams {
  /** Static kernel shared by eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" +", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
