package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 one-off: heap cost of the single-task union-find at the
  * LARGEST graph the small-graph bound admits (2^22 directed rows =
  * 2^21 undirected chain edges) — verdict item 2's missing measurement. */
object UfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val peak = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        peak.getAndAccumulate(s.stageInfo.taskMetrics.peakExecutionMemory, math.max(_, _))
    })
    val e = 1 << 21
    val edges = spark.range(e).select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val nodes = spark.range(e + 1).toDF("id")
    def heap = { System.gc(); Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory }
    val h0 = heap
    val t0 = System.nanoTime
    val cnt = graft.operators.Cluster.connectedComponents(nodes, edges)
      .filter(col("label") === 0L).count()
    println(f"[ufprobe] chain nodes=${e + 1} undirectedRows=${2 * e} labeledTo0=$cnt " +
      f"wall=${(System.nanoTime - t0) / 1e9}%.1f s heapAfter-heapBefore=${(heap - h0) / 1048576}%d MB " +
      f"peakExecMem=${peak.get / 1048576}%d MB heapBefore=${h0 / 1048576}%d MB")
    spark.stop()
  }
}
