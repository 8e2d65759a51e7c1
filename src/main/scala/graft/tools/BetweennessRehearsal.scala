package graft.tools

import graft.Tables
import graft.graph.{Algorithms, GraphBuilder, Traversals}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** VERDICT r7 #5 rehearsal (build tool, not a driver surface): force the
  * DISTRIBUTED betweenness tier on a multi-million-edge graph and record
  * its wall-clock and per-level shuffle profile for SCALE.md.
  *
  * The graded g10 subject (the strong user graph) never crosses the 1M-edge
  * local gate even at sf1.6, so the distributed tier's large-graph behavior
  * was unmeasured beyond result-parity on small graphs. This runs it on the
  * biggest graph the engine builds — g07_cc_full's order-contracted
  * customer—part graph (5.2M directed edges at sf0.4, 10.5M at sf0.8),
  * symmetrized like g10 — with the per-superstep row counts the loop
  * already takes (onLevel hook) plus a stage-level shuffle-byte listener.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf0.8 runMain graft.tools.BetweennessRehearsal [nSources]
  */
object BetweennessRehearsal {
  def main(args: Array[String]): Unit = {
    val nSources = args.headOption.map(_.toInt).getOrElse(16)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf0.8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    // g07_cc_full's contracted graph: direct customer—part edges through
    // each order, plus every non-PLACED/CONTAINS relationship
    val custPart = t.orders.select(
        (lit(GraphBuilder.CustomerBase) + col("o_custkey")).as("cust"),
        (lit(GraphBuilder.OrderBase) + col("o_orderkey")).as("order"))
      .join(t.lineitem.select(
          (lit(GraphBuilder.OrderBase) + col("l_orderkey")).as("order"),
          (lit(GraphBuilder.PartBase) + col("l_partkey")).as("part")),
        "order")
      .select(col("cust").as("src"), col("part").as("dst"))
    val rest = GraphBuilder.edges(t)
      .filter(!col("rel_type").isin("PLACED", "CONTAINS"))
      .select(col("src"), col("dst"))
    val edges = Traversals.symmetrize(custPart.unionByName(rest))

    // stage-level shuffle profile: total bytes/records through the shuffle
    // (the cluster-bottleneck number the rehearsal is after)
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufRecs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shufWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(sc.stageInfo.taskMetrics.shuffleReadMetrics.remoteBytesRead
          + sc.stageInfo.taskMetrics.shuffleReadMetrics.localBytesRead)
        shufRecs.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
    })

    val nEdges = edges.select("src", "dst").distinct().count()
    println(s"rehearsal graph: $nEdges distinct symmetrized edges ($sfDir)")
    shufWrite.set(0); shufRead.set(0); shufRecs.set(0)

    val t0 = System.nanoTime()
    val result = Algorithms.betweennessDistributed(
      edges, nSources,
      onLevel = (phase, level, rows) =>
        println(f"  $phase level $level%2d: $rows%,12d state rows"))
    val n = result.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"betweennessDistributed($nSources sources): $n%,d scored nodes in $wall%.1f s")
    println(f"shuffle profile: ${shufWrite.get / 1e9}%.2f GB written, " +
      f"${shufRead.get / 1e9}%.2f GB read, ${shufRecs.get / 1e6}%.1f M records")
    spark.stop()
  }
}
