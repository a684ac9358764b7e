package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Nearest-centroid assignment against a COLUMN of centroids: returns the
  * cell id minimizing ‖q − c‖² over `cells`, an
  * `array<struct<cell: bigint, c: array<double>, cc: double>>` (cc = the
  * centroid's left-fold self-dot, precomputed once per centroid).
  *
  * This is the large-K twin of the literal-matrix assignment
  * (graft.operators.KMeansOp.assign): baking K centroids into the plan as
  * `array(lit…)` is ideal for K ≈ 8 but a real IVF coarse quantizer wants
  * K ≈ 2¹⁶, where a K×64 literal matrix per expression blows up the plan
  * tree and generated code. Here the centroids arrive as ONE row through
  * a broadcast (`crossJoin(broadcast(packedCells))`), so the plan carries
  * a single column reference regardless of K and assignment needs no
  * shuffle at all — unlike an argmin-by-groupBy formulation, which would
  * re-shuffle the whole corpus by vec_id.
  *
  * Bit-compatibility with the literal path (spec-checked): the distance
  * is the identical expression tree ((qq − 2.0·dot) + cc) with qq, dot,
  * cc all strict left folds, and ties break to the FIRST minimal entry —
  * callers pass `cells` sorted by cell id, matching the literal path's
  * array_position-of-array_min rule and the oracle's ORDER BY dist, cell.
  * A centroid whose dimension disagrees with q yields NULL (corrupt
  * input must not silently win an argmin), as does an empty cells array. */
case class NearestCellDist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell_dist2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val cells = b.asInstanceOf[ArrayData]
    val n = q.numElements()
    val k = cells.numElements()
    if (k == 0) return null
    var qq = 0.0
    var i = 0
    while (i < n) { val x = q.getDouble(i); qq += x * x; i += 1 }
    var best = 0L
    var bestD = Double.PositiveInfinity
    var found = false
    var ci = 0
    while (ci < k) {
      val row = cells.getStruct(ci, 3)
      val c = row.getArray(1)
      if (c.numElements() != n) return null
      var dot = 0.0
      i = 0
      while (i < n) { dot += q.getDouble(i) * c.getDouble(i); i += 1 }
      val d = (qq - 2.0 * dot) + row.getDouble(2)
      if (!found || d < bestD) { found = true; bestD = d; best = row.getLong(0) }
      ci += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val ci = ctx.freshName("ci")
      val qq = ctx.freshName("qq")
      val x = ctx.freshName("x")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val found = ctx.freshName("found")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |int $k = $b.numElements();
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $qq = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $a.getDouble($i);
         |    $qq += $x * $x;
         |  }
         |  long $best = 0L;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  boolean $found = false;
         |  boolean $bad = false;
         |  for (int $ci = 0; $ci < $k && !$bad; $ci++) {
         |    InternalRow $row = $b.getStruct($ci, 3);
         |    ArrayData $c = $row.getArray(1);
         |    if ($c.numElements() != $n) {
         |      $bad = true;
         |    } else {
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $dot += $a.getDouble($i) * $c.getDouble($i);
         |      }
         |      double $d = ($qq - 2.0 * $dot) + $row.getDouble(2);
         |      if (!$found || $d < $bestD) {
         |        $found = true;
         |        $bestD = $d;
         |        $best = $row.getLong(0);
         |      }
         |    }
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $best;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
