package graft.tools

import graft.SparkEntry

/** Prints the EXECUTED (AQE-final) plan of named graded queries — the
  * ground truth for exchange-reuse questions the static `explain` can't
  * answer (AQE dedups identical exchange subtrees into ReusedQueryStage /
  * ReusedExchange at runtime; the static plan shows them twice). Probe
  * tool, not a graded surface.
  * Usage: runMain graft.tools.R16FinalPlan <query> [query ...]
  */
object R16FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"\n===== $n (executed) =====")
      println(p)
      val reused = p.linesIterator.count(l => l.contains("ReusedExchange") || l.contains("ReusedQueryStage"))
      val exch = p.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))
      println(s"[$n] exchanges=$exch reused=$reused")
    }
    spark.stop()
  }
}
