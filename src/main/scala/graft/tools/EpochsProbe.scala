package graft.tools

import org.apache.spark.sql.functions._

/** Measures ScaleUp's two temporal growth models against each other
  * (build tool, not a driver surface; see ScaleUp's scaladoc): runs the
  * Δ-windowed motif query g35 on each given fixture dir and prints total
  * relay count (the candidate volume a 1-hour window admits) and wall
  * clock. Default ScaleUp copies interleave on one clock, so per-window
  * density is k× the source and within-window pairs grow ~k² — a fixture
  * artifact; `--epochs` shifts each copy to a disjoint time epoch, so
  * density matches the source and relays scale ~k (+ one seam per copy
  * boundary). The printed relay totals are the evidence for SCALE.md's
  * round-9 entry.
  *
  * Usage: runMain graft.tools.EpochsProbe <sfDir> [<sfDir> ...]
  */
object EpochsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { d =>
      val t0 = System.nanoTime()
      val r = graft.SparkEntry.queries("g35_temporal_motif")(spark, d)
        .agg(coalesce(sum(col("n_relays")), lit(0L)).as("relays"),
             count(lit(1)).as("relay_nodes")).collect()(0)
      println(f"${d}%-28s relays=${r.getLong(0)}%,d relay_nodes=${r.getLong(1)}%,d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
