package graft.tools

import org.apache.spark.sql.functions._

/** CC-tier ceiling probe (build tool): runs a chosen connected-components
  * tier over g07_cc_full's EXACT contracted graph at a rehearsal sf and
  * prints component-count + row-count invariants plus wall time. Motivated
  * by the round-10 finding that the GraphX Pregel tier OOMs a 32g (and
  * heartbeat-starves a 64g) single JVM at sf12.8's ~166M contracted edges
  * even with MEMORY_AND_DISK caching — the candidate tier above it is the
  * Kiveris alternating-star algorithm (pure Catalyst shuffles, disk-backed,
  * O(log² n) rounds).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/scale/sf12.8 runMain graft.tools.CcTierProbe <star|graphx|unionfind>
  */
object CcTierProbe {
  def main(args: Array[String]): Unit = {
    val tier = args.headOption.getOrElse("star")
    if (!Set("star", "graphx", "unionfind").contains(tier)) {
      // a typo ('grafx') must not silently measure the star tier under a
      // mislabeled output line
      System.err.println(s"unknown tier '$tier' — usage: CcTierProbe <star|graphx|unionfind>")
      sys.exit(2)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.graph.GraphQueries.ccFullContractedEdges(spark, sfDir)
      .transform(graft.graph.Materialize.apply)
    println(f"edges (raw): ${edges.count()}%,d")
    val t0 = System.nanoTime()
    val comp = tier match {
      case "graphx"    => graft.graph.Algorithms.connectedComponents(edges)
      case "unionfind" => graft.graph.Algorithms.ccUnionFind(edges)
      case "star"      => graft.graph.Algorithms.connectedComponentsStar(edges)
    }
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_components"), sum(col("n")).as("n_nodes"))
      .first()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"$tier%-10s ${secs}%8.1f s  components=${sizes.getLong(0)}%,d nodes=${sizes.getLong(1)}%,d")
    spark.stop()
  }
}
