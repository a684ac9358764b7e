package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** [[SignLshBuckets]] plus one weakest-margin probe per table: vector →
  * a `2·tables`-slot array where slot t is table t's bucket (identical
  * bits to [[SignLshBuckets]]) and slot `tables + t` is that bucket
  * with the table's LOWEST-|dot| sign bit flipped — the single
  * most-likely-to-disagree bit, the same margin-ranked flip order as
  * the q54 query-side multiprobe (`Similarity.multiprobeTopK`).
  *
  * Probing the BATCH side of an incremental batch-vs-corpus dedup
  * (q42) doubles its exploded bucket rows — and so roughly doubles
  * candidate volume — while the corpus side stays at L rows per
  * vector; retention rises because a τ-match whose single disagreeing
  * plane in some table is the batch vector's weakest-margin bit now
  * collides there. Ties in the margin argmin resolve to the LOWEST
  * plane index (strict `<` scan), matching the DuckDB oracle's
  * lexicographic `list_sort({'m','i'})[1]`.
  *
  * A vector whose length differs from the plane dim yields 0 in every
  * slot (both halves), mirroring [[SignLshBuckets]]' all-bits-fall-to-0
  * semantics. */
case class SignLshProbeBuckets(child: Expression, planes: Seq[Seq[Double]],
    bits: Int, stride: Int, tables: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= stride && tables >= 1 &&
    planes.size >= (tables - 1) * stride + bits)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "sign_lsh_probe_buckets"

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
    val out = new Array[Long](2 * tables)
    if (n == dim) {
      var t = 0
      while (t < tables) {
        var b = 0L
        var minAbs = Double.PositiveInfinity
        var minI = 0
        var i = 0
        while (i < bits) {
          val off = (t * stride + i) * dim
          var s = 0.0
          var d = 0
          while (d < dim) { s += e.getDouble(d) * flat(off + d); d += 1 }
          if (s > 0.0) b |= (1L << i)
          val a = math.abs(s)
          if (a < minAbs) { minAbs = a; minI = i }
          i += 1
        }
        out(t) = b
        out(tables + t) = b ^ (1L << minI)
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
      val a = ctx.freshName("a")
      val minAbs = ctx.freshName("minAbs")
      val minI = ctx.freshName("minI")
      s"""
         |int $n = $e.numElements();
         |long[] $out = new long[${2 * tables}];
         |if ($n == $dim) {
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $b = 0L;
         |    double $minAbs = Double.POSITIVE_INFINITY;
         |    int $minI = 0;
         |    for (int $i = 0; $i < $bits; $i++) {
         |      int $off = ($t * $stride + $i) * $dim;
         |      double $s = 0.0;
         |      for (int $d = 0; $d < $dim; $d++) {
         |        $s += $e.getDouble($d) * $pl[$off + $d];
         |      }
         |      if ($s > 0.0) $b |= (1L << $i);
         |      double $a = Math.abs($s);
         |      if ($a < $minAbs) { $minAbs = $a; $minI = $i; }
         |    }
         |    $out[$t] = $b;
         |    $out[$tables + $t] = $b ^ (1L << $minI);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
