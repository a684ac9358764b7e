package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native polynomial rolling hash: array<long> element hashes → left fold
  * acc = (acc·mult + x) mod m, acc₀ = 0. Elements are expected already
  * reduced mod m so the multiply never overflows a long
  * (m ≈ 1e9+7, mult = 31 ⇒ acc·mult + x < 2^35).
  *
  * Replaces the interpreted `aggregate(…, (acc, x) -> (acc*31+x) % m)`
  * fold (CodegenFallback, one expression eval per element per row) with a
  * single codegen'd loop. Bit-identical results (spec cross-checked). */
case class PolyFingerprint(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(mod > 0 && mult > 0, "mult/mod must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    var acc = 0L
    var j = 0
    while (j < n) {
      acc = (acc * mult + hs.getLong(j)) % mod
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      s"""
         |int $n = $hs.numElements();
         |long $acc = 0L;
         |for (int $j = 0; $j < $n; $j++) {
         |  $acc = ($acc * ${mult}L + $hs.getLong($j)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
