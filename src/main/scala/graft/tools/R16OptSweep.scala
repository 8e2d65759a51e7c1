package graft.tools

import graft.SparkEntry

/** Round-16 optimization-round cost ranking: times EVERY declared query
  * (noop sink, single warm-session pass) and prints a descending-cost
  * table. This is the "measure first" inventory pass (optimization guide
  * §1) that decides which operators get MicroBench/plan attention — not a
  * grading surface (single-shot walls; use MicroBench medians for A/Bs).
  *
  * Usage: runMain graft.tools.R16OptSweep [nameFilterSubstring]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01 — whole-surface sweeps at sf0.1
  * take ~30 min; rank there only the head of this ranking), SPARK_GRAFT_CPUS.
  */
object R16OptSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val filter = args.headOption
    val spark = graft.GraftSession.local(cpus)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.forall(n.contains))
    // warm the session/reader paths so the first timed query doesn't carry
    // session startup
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val timed = names.flatMap { n =>
      spark.sparkContext.setJobDescription(s"sweep: $n")
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        Some(n -> (System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        println(f"FAILED $n: ${e.getClass.getSimpleName}"); None
      }
    }
    println(f"== per-query wall (sec), $sfDir, local[$cpus], descending ==")
    timed.sortBy(-_._2).foreach { case (n, s) => println(f"$s%8.2f  $n") }
    println(f"TOTAL ${timed.map(_._2).sum}%.1f s over ${timed.size} queries")
    spark.stop()
  }
}
