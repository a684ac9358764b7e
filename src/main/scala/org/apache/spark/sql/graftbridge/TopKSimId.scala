package org.apache.spark.sql.graftbridge

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score double, id long) pairs, ordered
  * score DESC then id ASC, returning array<struct<sim,id>> of the k best.
  *
  * Replaces the window-rank idiom
  * `row_number().over(partitionBy(g).orderBy(sim.desc)) <= k`, which
  * shuffles and sorts EVERY scored pair. As a TypedImperativeAggregate it
  * partial-aggregates map-side, so each (partition, group) ships at most
  * k pairs into the shuffle — at n×n pair volume this is the difference
  * between shuffling 25M rows and 5000×k.
  *
  * Total order (ties by id) makes the result independent of merge order,
  * so output matches the window formulation bit-for-bit — over non-null
  * scores. NULL-score rows are skipped (standard SQL aggregate
  * semantics, i.e. an implicit `WHERE sim IS NOT NULL`); a raw window
  * rank would instead emit them last. None of graft's scoring paths
  * produce null sims (null/ragged embeddings are filtered or nulled
  * out before pairing), so the two formulations agree on every gated
  * query.
  *
  * `distinctIds = true` makes the heap id-UNIQUE: an incoming id
  * already retained is skipped (an O(k) scan, and only on the
  * would-insert path — the fast-path reject never pays it). This is
  * value-identical to dropDuplicates-then-top-k whenever duplicate ids
  * always carry the SAME score (true for every pair-pure similarity:
  * the same (group, id) pair scores identically however many LSH
  * tables it collides in), and it deletes the dedup EXCHANGE that a
  * dropDuplicates before the aggregate would shuffle — at q41's sf10
  * volume, 57M scored rows that instead partial-aggregate map-side to
  * ≤ k rows per (partition, group). */
case class TopKSimId(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    distinctIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, "k must be >= 1")

  // max-heap on "badness": reversed-double puts the LOWEST sim (then the
  // largest id) at the root, so dequeue() evicts the worst kept element
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("sim", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "topk_sim_id"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    new mutable.PriorityQueue[(Double, Long)]()(worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val sd = s.asInstanceOf[Double]
      val id = i.asInstanceOf[Long]
      // fast path: with a full buffer, a candidate no better than the
      // current worst (buf.head under worstFirst) can never be kept —
      // skipping the enqueue/dequeue churn turns the per-row cost from
      // O(log k) + tuple allocation into one primitive compare for the
      // vast majority of an n² pair stream. The inlined compare is
      // exactly worstFirst: Double.TotalOrdering (= j.l.Double.compare)
      // reversed on score, then id ascending.
      if (buf.size < k) {
        if (!(distinctIds && buf.exists(_._2 == id))) buf.enqueue((sd, id))
      } else {
        val (hs, hi) = buf.head
        val c0 = java.lang.Double.compare(hs, sd) // reversed score order
        val c = if (c0 != 0) c0 else java.lang.Long.compare(id, hi)
        if (c < 0 && !(distinctIds && buf.exists(_._2 == id))) {
          buf.enqueue((sd, id))
          buf.dequeue()
        }
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { p =>
      if (buf.size < k) {
        if (!(distinctIds && buf.exists(_._2 == p._2))) buf.enqueue(p)
      } else if (worstFirst.compare(p, buf.head) < 0 &&
          !(distinctIds && buf.exists(_._2 == p._2))) {
        buf.enqueue(p)
        buf.dequeue()
      }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending under worstFirst = score DESC under the SAME total order
    // the heap retains with, ties id ASC. Using one total order end-to-end
    // keeps retention and output ranking consistent for NaN scores (e.g.
    // cosine of a zero-norm vector): NaN ranks first, exactly as a
    // window/oracle ORDER BY sim DESC ranks it in DuckDB. The previous
    // sortBy(-s, i) sorted NaN last while the heap retained it best.
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSimId =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSimId =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}
