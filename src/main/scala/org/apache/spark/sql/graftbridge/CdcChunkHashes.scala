package org.apache.spark.sql.graftbridge

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native content-defined chunking: array<long> word hashes (already mod
  * `mod`) → array<long> of per-chunk rolling hashes. A chunk boundary
  * falls AFTER any word whose hash ≡ 0 (mod `mask`); each chunk's id is
  * the polynomial rolling hash (acc·mult + h) mod `mod` of its words, and
  * a trailing partial chunk is emitted when its accumulator is nonzero.
  *
  * Exact port of the interpreted named_struct fold in
  * `TextAnalysis.cdcChunkFingerprints` (kept as the spec cross-check) —
  * that HOF allocates a struct + array copy per word per row;
  * this is one codegen'd loop appending to a growable buffer. */
case class CdcChunkHashes(child: Expression, mask: Long, mult: Long, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(mask > 0 && mod > 0 && mult > 0, "mask/mult/mod must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val chunks = new ArrayBuffer[Long]()
    var acc = 0L
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      if (h % mask == 0L) {
        chunks += (acc * mult + h) % mod
        acc = 0L
      } else {
        acc = (acc * mult + h) % mod
      }
      j += 1
    }
    if (acc != 0L) chunks += acc
    new GenericArrayData(chunks.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val buf = ctx.freshName("buf")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      s"""
         |int $n = $hs.numElements();
         |long[] $buf = new long[$n + 1];
         |int $m = 0;
         |long $acc = 0L;
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $hs.getLong($j);
         |  if ($h % ${mask}L == 0L) {
         |    $buf[$m++] = ($acc * ${mult}L + $h) % ${mod}L;
         |    $acc = 0L;
         |  } else {
         |    $acc = ($acc * ${mult}L + $h) % ${mod}L;
         |  }
         |}
         |if ($acc != 0L) $buf[$m++] = $acc;
         |long[] $out = java.util.Arrays.copyOf($buf, $m);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
