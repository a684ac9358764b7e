package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Single-pass symmetric int8 quantization statistics over an
  * array<double> embedding: returns array<double>
  * [scale, q_sum, q_min, q_max, q_hash, err] where
  *  - scale = 127 / max(|x|) (0 for the zero/empty vector),
  *  - q_i = clamp(round_half_away(x_i · scale), ±127) is the int8 code,
  *  - q_sum/q_min/q_max summarize the codes (min init 127, max init
  *    −127, so an empty vector yields 127/−127 like the oracle's folds),
  *  - q_hash = fold h → (31h + q_i + 127) mod 140737488355213 (< 2^47,
  *    so every intermediate stays exact in int64 AND in a double),
  *  - err = Σ (x_i − q_i/scale)² in strict left-to-right order.
  *
  * One Java loop per row instead of ~7 interpreted HOF traversals — the
  * compression pass runs over every embedding in the corpus, so it must
  * stay codegen-tight (the established graftbridge rule). All outputs
  * are integral-or-deterministic doubles, reproducible bit-for-bit by a
  * DuckDB list_reduce replay: round-half-away matches DuckDB round(),
  * and the hash/sum folds are exact integer arithmetic. */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_quant_stats needs array<double>, got $other")
    }
  override def prettyName: String = "int8_quant_stats"

  /** Row kernel; also called from generated code. */
  def stats(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getDouble(i))
      if (a > amax) amax = a
      i += 1
    }
    val scale = if (amax > 0.0) 127.0 / amax else 0.0
    var qsum = 0L
    var qmin = 127L
    var qmax = -127L
    var h = 0L
    var err = 0.0
    i = 0
    while (i < n) {
      val x = arr.getDouble(i)
      val q =
        if (scale == 0.0) 0L
        else {
          val y = x * scale
          // round half AWAY from zero (Spark round() / DuckDB round()).
          // floor(y+0.5) alone is wrong at edge doubles (the JDK-6430675
          // class: y = 0.49999999999999994 has y+0.5 == 1.0). The
          // correction compares f−0.5 (EXACT for |f| ≤ 128) against the
          // true y — computing f−y instead would itself round to 0.5 and
          // miss the overshoot. floor can never undershoot: y+0.5 only
          // rounds past an integer n when the true value is on n's other
          // side, and the two cases land on the same floor.
          val r =
            if (y >= 0.0) {
              val f = math.floor(y + 0.5)
              if (f - 0.5 > y) f - 1.0 else f
            } else {
              val c = math.ceil(y - 0.5)
              if (c + 0.5 < y) c + 1.0 else c
            }
          val c = if (r > 127.0) 127.0 else if (r < -127.0) -127.0 else r
          c.toLong
        }
      qsum += q
      if (q < qmin) qmin = q
      if (q > qmax) qmax = q
      h = (h * 31L + q + 127L) % Int8QuantStats.HashM
      if (scale != 0.0) {
        val d = x - q.toDouble / scale
        err += d * d
      }
      i += 1
    }
    new GenericArrayData(Array(scale, qsum.toDouble, qmin.toDouble,
      qmax.toDouble, h.toDouble, err))
  }

  override def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("int8QuantStats", this, classOf[Int8QuantStats].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.stats($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8QuantStats {
  /** Prime modulus < 2^47: 31·h + 254 stays < 2^53, so the fold is exact
    * in int64 and in DuckDB's double arithmetic alike. */
  val HashM = 140737488355213L
}
