package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.FormattedMode

/** Round-16 optimization-round plan dumps: writes the formatted physical
  * plan of each named graded query to plans/r16/<query>_<tag>.txt — the
  * before/after evidence files the optimization deliverable requires.
  * Probe tool, not part of the graded surface.
  *
  * Usage: runMain graft.tools.R16OptPlans <tag> [query ...]
  *   tag   "before" | "after" (file suffix)
  *   query defaults to the Bench headline set when omitted
  * SPARK_GRAFT_SF_DIR selects the data dir (default sf0.1 — the bench sf,
  * so the dumped plans are the ones the bench timings execute).
  */
object R16OptPlans {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = if (args.length > 1) args.tail.toSeq else graft.Bench.headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val outDir = java.nio.file.Paths.get("plans/r16")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      try {
        val p = SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"${n}_$tag.txt"), p)
        println(s"wrote plans/r16/${n}_$tag.txt (${p.linesIterator.size} lines)")
      } catch { case e: Throwable =>
        println(s"FAILED $n: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
