package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Native multi-table sign-LSH bucketizer: array<double> vector → the
  * `tables`-slot array of per-table bucket ids, table t reading `bits`
  * planes from its `stride`-aligned slice of one fixed plane stream.
  *
  * The Column-expression formulation (tables × bits CASE WHEN
  * dot(e, literal-plane) sums wrapped in CreateArray) grows to a
  * ~100-dot expression tree at L=8 × 12 planes; that tree falls out of
  * whole-stage codegen and evaluates interpreted — measured 70 s of a
  * 72 s q40 at sf10, vs 2 s for the join+cosine it feeds. Same cure as
  * [[SimHash64]]/[[DotProductDouble]]: one tight generated loop with
  * the plane matrix as a referenced flat double[].
  *
  * Semantics are bit-identical to the expression form: plane sign test
  * is `dot > 0.0`, bit i carries weight 2^i, and a vector whose length
  * differs from the plane dim yields bucket 0 in every table (the
  * `null > 0 → false` branch of the old CASE, per plane — so ALL bits
  * fall to 0). */
case class SignLshBuckets(child: Expression, planes: Seq[Seq[Double]],
    bits: Int, stride: Int, tables: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= stride && tables >= 1 &&
    planes.size >= (tables - 1) * stride + bits)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "sign_lsh_buckets"

  private lazy val dim: Int = planes.head.size
  // flat [plane][coord] matrix: plane p coord d at p*dim + d
  private lazy val flat: Array[Double] = {
    val a = new Array[Double](planes.size * dim)
    var p = 0
    while (p < planes.size) {
      var d = 0
      val row = planes(p)
      while (d < dim) { a(p * dim + d) = row(d); d += 1 }
      p += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    val out = new Array[Long](tables)
    if (n == dim) {
      var t = 0
      while (t < tables) {
        var b = 0L
        var i = 0
        while (i < bits) {
          val off = (t * stride + i) * dim
          var s = 0.0
          var d = 0
          while (d < dim) { s += e.getDouble(d) * flat(off + d); d += 1 }
          if (s > 0.0) b |= (1L << i)
          i += 1
        }
        out(t) = b
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val pl = ctx.addReferenceObj("planes", flat, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      val off = ctx.freshName("off")
      s"""
         |int $n = $e.numElements();
         |long[] $out = new long[$tables];
         |if ($n == $dim) {
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $b = 0L;
         |    for (int $i = 0; $i < $bits; $i++) {
         |      int $off = ($t * $stride + $i) * $dim;
         |      double $s = 0.0;
         |      for (int $d = 0; $d < $dim; $d++) {
         |        $s += $e.getDouble($d) * $pl[$off + $d];
         |      }
         |      if ($s > 0.0) $b |= (1L << $i);
         |    }
         |    $out[$t] = $b;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
