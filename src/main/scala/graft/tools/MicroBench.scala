package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Warm-session A/B timing of graded queries (median of N reps after a
  * warmup rep). Build tool for plan-choice decisions; not a driver surface.
  * Usage: runMain graft.tools.MicroBench <reps> <query> [query ...]
  *
  * At rehearsal sfs (sf0.4+) each heavy query leaves a multi-GB dirty
  * writeback backlog that time-shares the single disk with the NEXT
  * query's reps — the self-generated storm that made round-9's sf6.4
  * sweep numbers non-comparable across queries. Before every query,
  * MicroBench drains with the full HostProbes.awaitQuiet gate (PSI-io
  * < 5%, dirty < 2 GB, external cpu < 2 cores; budget 3 min); between
  * reps it runs the cheap io/dirty point check and drains only when
  * that reads stormy (a rep's own writeback backlog) — so every timed
  * rep starts against a settled device and `min` approximates the
  * uncontended cost.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val reps = args.head.toInt
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    def drain(): Unit = {
      val ok = graft.HostProbes.awaitQuiet(System.nanoTime() + 180L * 1000000000L)
      if (!ok) System.err.println("[microbench] drain budget expired — next timing may carry writeback contention")
    }
    names.foreach { n =>
      drain()
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val times = (1 to reps).map { _ =>
        if (!graft.HostProbes.ioQuiet()) drain()
        once()
      }.sorted
      println(f"$n%-28s median ${times(reps / 2)}%.3f s  (min ${times.head}%.3f, max ${times.last}%.3f)")
    }
    spark.stop()
  }
}
