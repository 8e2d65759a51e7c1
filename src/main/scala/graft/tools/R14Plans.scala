package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.FormattedMode

/** Round-14 plan dump: formatted explains for the new graded queries (+ the
  * t17 entry VERDICT r13 #6 asked for), written to /tmp for PLANS.md
  * curation. Probe tool, not part of the graded surface. */
object R14Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = Seq("t17_dossier_increment", "t17b_dossier_retract",
      "g68_cc_decrement", "l48_bm25_batch", "l49_bpe_tokenize",
      "g69_er_decrement", "l50_rrf_batch", "l51_pack_sequences")
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
