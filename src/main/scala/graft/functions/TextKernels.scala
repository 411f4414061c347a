package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of whitespace tokens of the input that belong to a fixed lexicon —
  * the kernel under stopword ratios and lexicon-based language ID, which
  * are per-document passes over the ENTIRE corpus in a curation pipeline.
  *
  * The declarative form — `size(filter(split(s, " +"), _.isin(words)))` —
  * builds a token array and walks an interpreted lambda tree per token
  * (the repo's ~100× penalty class; langId with 5 such filters measured
  * 4.2 s vs 0.27 s baseline at sf0.1). This expression scans the string
  * once: maximal runs of non-space characters are matched against a
  * prebuilt hash set. No token array, no regex, no lambdas.
  *
  * Bit-identical to the declarative form when every lexicon word is
  * non-empty and space-free (CurationSpec asserts): `split(" +")` only
  * ever splits on ASCII-space runs, and the empty edge tokens it produces
  * can never match a non-empty word. Case handling stays with the CALLER
  * (pass `lower(text)` to mirror `tokens(lower(text))`) so the kernel
  * never re-implements Unicode lowercasing. */
case class LexiconHits(child: Expression, words: Array[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(words.nonEmpty && words.forall(w => w.nonEmpty && !w.contains(' ')),
    "lexicon words must be non-empty and space-free")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lexicon_hits expects string, got $other")
  }

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.length * 2)
    words.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    LexiconHits.count(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("lexicon", set, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LexiconHits.count($v, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconHits =
    copy(child = newChild)

  override def prettyName: String = "lexicon_hits"
}

object LexiconHits {
  /** Static kernel shared by eval and generated code. */
  def count(s: UTF8String, set: java.util.HashSet[String]): Int = {
    val str = s.toString
    var hits = 0
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && str.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && str.charAt(i) != ' ') i += 1
      if (i > start && set.contains(str.substring(start, i))) hits += 1
    }
    hits
  }
}

/** Count of Unicode code points in script HAN — the script-based CJK signal
  * in language ID. Declarative twin:
  * `length(regexp_replace(s, "[^\p{IsHan}]", ""))`, which allocates the
  * stripped string per row through a regex engine; this walks code points
  * once. Bit-identical (CurationSpec asserts on mixed ASCII/CJK): Java's
  * `\p{IsHan}` matches exactly `UnicodeScript.HAN`, and Spark's `length`
  * counts code points. */
case class HanCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"han_count expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    HanCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HanCount.count($v);")

  override protected def withNewChildInternal(newChild: Expression): HanCount =
    copy(child = newChild)

  override def prettyName: String = "han_count"
}

object HanCount {
  /** Static kernel shared by eval and generated code. */
  def count(s: UTF8String): Int = {
    val str = s.toString
    var c = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN) c += 1
      i += Character.charCount(cp)
    }
    c
  }
}

/** Hashed-linear quality-model margin in integer cents — the native
  * kernel under [[graft.operators.QualityModel]]: for each whitespace
  * token, weight = `((len·31 + firstCp) % 64 · 127 + 17) % 101 − 50`,
  * summed over the document. The declarative form
  * (`aggregate(filter(split(s, " ")...))`) is an `ArrayAggregate`, which
  * is `CodegenFallback`: it breaks whole-stage codegen and allocates a
  * token array plus an interpreted lambda walk per row — the repo's
  * ~100× penalty class on a pass that touches EVERY document. This
  * expression scans the string once: no array, no lambdas, codegen'd.
  *
  * Bit-identical to [[graft.operators.QualityModel.marginCentsFold]] on
  * ASCII corpora (FrontierSpec asserts): `split(s, " ")` splits on
  * single ASCII spaces and empty tokens are filtered, which is exactly
  * the non-space-run walk below; `length`/`ascii` agree with
  * codePointCount/codePointAt on ASCII (the caller contract, as with
  * [[LexiconHits]] — the DuckDB oracle twin needs ASCII anyway). */
case class QualityMarginCents(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quality_margin_cents expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    QualityMarginCents.margin(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.QualityMarginCents.margin($v);")

  override protected def withNewChildInternal(newChild: Expression): QualityMarginCents =
    copy(child = newChild)

  override def prettyName: String = "quality_margin_cents"
}

object QualityMarginCents {
  /** Static kernel shared by eval and generated code. */
  def margin(s: UTF8String): Long = {
    val str = s.toString
    var sum = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && str.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && str.charAt(i) != ' ') i += 1
      if (i > start) {
        val len = str.codePointCount(start, i)
        val cp = str.codePointAt(start)
        val bucket = (len * 31 + cp) % 64
        sum += ((bucket * 127 + 17) % 101) - 50
      }
    }
    sum
  }
}
