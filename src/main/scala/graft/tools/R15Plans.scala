package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.FormattedMode

/** Round-15 plan dump: formatted explains for the new graded queries plus
  * the refactored l48 (query-table-native semi-join — the pin VERDICT r14
  * #2's done-clause asks for), written to /tmp for PLANS.md curation.
  * Probe tool, not part of the graded surface. */
object R15Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = Seq("l48_bm25_batch", "l47c_decontaminate_erased",
      "l49b_bpe_learned", "g04b_sssp_weighted", "g70_cc_replay", "l52_dedup_incremental", "l53_pq_adc", "l54_ivfpq_ann", "t17c_retract_replayed")
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
