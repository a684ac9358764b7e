package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native SimHash (Charikar STOC'02): array<long> word hashes → `bits`-bit
  * signature. Bit j is set when Σ over words of (2·((h>>j)&1) − 1) > 0 —
  * i.e. the majority of word hashes have bit j set.
  *
  * The HOF formulation (`aggregate(sequence(0,59), … aggregate(hw, …))`)
  * is a nested interpreted fold: O(bits × words) expression evaluations
  * per row, CodegenFallback all the way down. This generates one tight
  * two-loop kernel inside WholeStageCodegen. Same integer arithmetic,
  * bit-identical signatures (ApproxDedupSpec cross-checks). */
case class SimHash64(child: Expression, bits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](bits)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < bits) {
        counts(i) += (2 * ((h >> i) & 1L) - 1L).toInt
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < bits) {
      if (counts(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $hs.numElements();
         |int[] $counts = new int[$bits];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $hs.getLong($j);
         |  for (int $i = 0; $i < $bits; $i++) {
         |    $counts[$i] += (int) (2L * (($h >> $i) & 1L) - 1L);
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  if ($counts[$i] > 0) $sig |= 1L << $i;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
