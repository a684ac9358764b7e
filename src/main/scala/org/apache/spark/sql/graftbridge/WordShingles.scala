package org.apache.spark.sql.graftbridge

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-k-gram shingling: string → array<string> of the k-grams
  * (space-joined) over the non-empty space-separated words — distinct
  * set by default, every positional occurrence in order with
  * `distinct = false`; empty array when the text has fewer than k words.
  *
  * Semantically identical to the HOF pipeline
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ', ws[i..])))`
  * over `filter(split(text,' '), w -> w != '')` (minus the
  * array_distinct when `distinct = false`), but runs as one Java
  * loop per row instead of thousands of interpreted expression
  * evaluations — shingling is the inner loop of every text-dedup
  * operator, so this is the difference between the scan being free and
  * being the bottleneck. */
case class WordShingles(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  /** Row kernel; also called from generated code. */
  def shingle(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1).filter(_.nonEmpty)
    if (words.length < k) new GenericArrayData(Array.empty[Any])
    else {
      // LinkedHashSet dedups preserving first-occurrence order; the
      // non-distinct path keeps every positional occurrence
      val seen: mutable.Growable[String] with Iterable[String] =
        if (distinct) new mutable.LinkedHashSet[String]
        else new mutable.ArrayBuffer[String](words.length - k + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= words.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        seen += sb.toString
        i += 1
      }
      new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
    }
  }

  override def nullSafeEval(input: Any): Any =
    shingle(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.shingle($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
