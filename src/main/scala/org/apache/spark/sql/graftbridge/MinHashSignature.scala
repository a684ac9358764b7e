package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native MinHash signature: array<long> shingle hashes → array<long> of
  * `permA.length` signature values, sig[i] = min over shingles of
  * (permA[i]*h + permB[i]) mod p.
  *
  * The HOF formulation (aggregate + inner transform) runs
  * O(shingles × perms) interpreted expression evaluations per row and
  * allocates an array per fold step; this generates two tight loops
  * inside WholeStageCodegen with the permutation constants held as
  * reference objects. Same arithmetic, bit-identical signatures. */
case class MinHashSignature(child: Expression, permA: Seq[Long], permB: Seq[Long], p: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(permA.length == permB.length, "permA/permB length mismatch")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val aArr: Array[Long] = permA.toArray
  @transient private lazy val bArr: Array[Long] = permB.toArray

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val k = aArr.length
    val sig = Array.fill(k)(p)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = (aArr(i) * h + bArr(i)) % p
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $hs.numElements();
         |int $k = $aRef.length;
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, ${p}L);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $hs.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = ($aRef[$i] * $h + $bRef[$i]) % ${p}L;
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
