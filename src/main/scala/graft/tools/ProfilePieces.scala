package graft.tools

import graft.Tables
import graft.graph.{GraphBuilder, Ubo}
import org.apache.spark.sql.DataFrame

/** Warm-session timing of shared derivation stages (build tool, not a
  * driver surface): how much of each graph query's cost is the common
  * edge/transition derivation vs the operator itself.
  */
object ProfilePieces {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)
    def time(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warmup
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("cc_graphx")(graft.graph.Algorithms.connectedComponents(GraphBuilder.edges(t)))
    time("cc_graphx_nopart") {
      import org.apache.spark.graphx.{Edge, Graph}
      import org.apache.spark.sql.functions.{col => c}
      val spark2 = spark
      import spark2.implicits._
      val erdd = GraphBuilder.edges(t).select(c("src"), c("dst")).distinct()
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1.0))
      Graph.fromEdges(erdd, 0).connectedComponents().vertices
        .map { case (id, comp) => (id, comp) }.toDF("id", "component")
    }
    time("cc_star")(graft.graph.Algorithms.connectedComponentsStar(GraphBuilder.edges(t)))
    time("userTransitions")(GraphBuilder.userTransitions(t))
    time("interactedPairs")(Ubo.interactedPairs(t))
    time("edges_full")(GraphBuilder.edges(t))
    time("placedEdges")(Ubo.placedEdges(t))
    time("containsEdges")(Ubo.containsEdges(t))
    time("suppliedByEdges")(Ubo.suppliedByEdges(t))
    spark.stop()
  }
}
