package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.FormattedMode

/** Round-16 plan dump: formatted explains for the new graded queries,
  * written to /tmp for PLANS.md curation. Probe tool, not part of the
  * graded surface. */
object R16Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = Seq("l54b_ivfpq_residual", "l55_curation_tick",
      "g71_er_replay", "l49c_bpe_batched", "l56_bm25_indexed")
    names.foreach { n =>
      val p = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/plan_$n.txt"), p)
      println(s"wrote /tmp/plan_$n.txt (${p.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
