package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token statistics for a fixed term list: string →
  * array<long> of [token_count, tf(terms(0)), tf(terms(1)), …] over the
  * non-empty space-separated tokens.
  *
  * Semantically identical to `size(filter(split(text,' '), w -> w <> ''))`
  * plus one `size(filter(..., w -> w = term))` per term, but ONE Java
  * loop per row instead of |terms|+1 interpreted array traversals —
  * term-frequency extraction sits on the corpus scan of every lexical
  * ranking query (BM25), so the scan must stay codegen-tight. */
case class TokenTermStats(child: Expression, terms: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  require(terms.nonEmpty, "need at least one term")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_term_stats"

  @transient private lazy val termArr: Array[String] = terms.toArray

  /** Row kernel; also called from generated code. */
  def stats(text: UTF8String): ArrayData = {
    val out = new Array[Long](termArr.length + 1)
    val s = text.toString
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && s.charAt(i) != ' ') i += 1
        out(0) += 1
        val len = i - start
        var t = 0
        while (t < termArr.length) {
          val term = termArr(t)
          if (term.length == len && s.regionMatches(start, term, 0, len))
            out(t + 1) += 1
          t += 1
        }
      }
    }
    new GenericArrayData(out) // primitive long[] ctor — no per-row boxing
  }

  override def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenTermStats", this, classOf[TokenTermStats].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.stats($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
