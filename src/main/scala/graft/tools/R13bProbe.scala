package graft.tools

import graft.Tables
import graft.graph.{Algorithms, GraphBuilder, Materialize}
import org.apache.spark.sql.functions._

/** Round-13b scale rehearsal probe (SCALE.md evidence, not a driver
  * surface): the increment-∝-delta measurement for g66's incremental CC.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/scale/sf6.4 sbt "runMain graft.tools.R13bProbe"
  *
  * Reports, on the as-of strong user graph:
  *   - wall of the T1 full CC (the "nightly" build whose output is the
  *     standing state — in a deployment this ran yesterday),
  *   - wall of ONE ccIncrement refresh over a MATERIALIZED base labeling
  *     (the recurring cost the operator actually pays),
  *   - wall of the T2 full CC rebuild (what the refresh replaces),
  *   - the row counts that explain the ratio (base edges, delta edges,
  *     component-graph edges, labels touched by the remap).
  */
object R13bProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** The headline measurement: on the FULL property graph (where the
    * nightly rebuild is a real GraphX/star-tier run, not a 2-job
    * union-find), one month of edge arrivals folded in by ccIncrement vs
    * the full T2 rebuild. The strong user graph (default mode) is too
    * small at any rehearsal sf to separate the paths — ~95k edges puts
    * BOTH in the local tier — so the default mode's value is the row
    * counts, and this mode's is the wall-clock ratio.
    */
  private def fullGraph(spark: org.apache.spark.sql.SparkSession, t: Tables): Unit = {
    val g = GraphBuilder(t)
    val edges = g.edges.select(col("src"), col("dst"), col("valid_from"))
      .transform(Materialize.apply)
    def snap(at: String) = edges
      .filter(col("valid_from").isNull ||
              col("valid_from") <= lit(at).cast("timestamp_ntz"))
      .select(col("src"), col("dst"))
    val t1 = "1996-12-01 00:00:00"; val t2 = "1997-01-01 00:00:00"
    val e1 = snap(t1).transform(Materialize.apply)
    val delta = edges
      .filter(col("valid_from") > lit(t1).cast("timestamp_ntz") &&
              col("valid_from") <= lit(t2).cast("timestamp_ntz"))
      .select(col("src"), col("dst")).transform(Materialize.apply)
    println(f"[r13b-full] e1=${e1.count()}%d edge rows, delta(1 month)=${delta.count()}%d")
    val (base, wBase) = time(Algorithms.cc(e1).transform(Materialize.apply))
    println(f"[r13b-full] T1 full cc (nightly): $wBase%.1f s over ${base.count()}%d labels")
    val (_, wInc) = time(
      Algorithms.ccIncrement(base, delta)
        .write.mode("overwrite").format("noop").save())
    println(f"[r13b-full] ccIncrement refresh (1-month delta): $wInc%.1f s")
    val (_, wRebuild) = time(
      Algorithms.cc(snap(t2)).write.mode("overwrite").format("noop").save())
    println(f"[r13b-full] T2 full cc (rebuild): $wRebuild%.1f s")
  }

  /** The ER increment-vs-rebuild split (g67's evidence): the graded g67
    * composes nightly-base + refresh in one query (driver contract), so
    * its single-shot wall reads ABOVE g48's — the deployment comparison
    * is refresh-vs-rebuild, measured here against a MATERIALIZED base.
    */
  private def erSplit(spark: org.apache.spark.sql.SparkSession, t: Tables): Unit = {
    import graft.rel.FuzzyJoin
    val cust = t.customer.select(col("c_custkey").as("id"),
      col("c_name").as("name"), col("c_nationkey").as("nk"))
    val ents = cust.select(col("id"), col("name"))
    val existing = cust.filter(col("id") % 10 =!= 0)
    val arrivals = cust.filter(col("id") % 10 === 0)
    def sameNation(p: org.apache.spark.sql.DataFrame, ca: String, cb: String) = p
      .join(broadcast(cust.select(col("id").as(ca), col("nk").as("nk_a"))), Seq(ca))
      .join(broadcast(cust.select(col("id").as(cb), col("nk").as("nk_b"))), Seq(cb))
      .filter(col("nk_a") === col("nk_b"))
    val (base, wBase) = time(
      Algorithms.cc(sameNation(
          FuzzyJoin.selfJoinLev1(existing.select("id", "name")), "id_a", "id_b")
        .select(col("id_a").as("src"), col("id_b").as("dst")))
        .transform(Materialize.apply))
    println(f"[r13b-er] nightly base resolution (90%% of records): $wBase%.1f s, ${base.count()}%d labels")
    val (_, wRefresh) = time {
      val deltaPairs = sameNation(
          FuzzyJoin.joinLev(arrivals.select("id", "name"), ents, 1)
            .filter(col("id_l") =!= col("id_r")), "id_l", "id_r")
        .select(col("id_l").as("src"), col("id_r").as("dst"))
      Algorithms.ccIncrement(base, deltaPairs)
        .write.mode("overwrite").format("noop").save()
    }
    println(f"[r13b-er] refresh (10%% arrival batch blocked vs full index + ccIncrement): $wRefresh%.1f s")
    val (_, wRebuild) = time(
      Algorithms.cc(sameNation(
          FuzzyJoin.selfJoinLev1(ents), "id_a", "id_b")
        .select(col("id_a").as("src"), col("id_b").as("dst")))
        .write.mode("overwrite").format("noop").save())
    println(f"[r13b-er] full re-resolution (the rebuild): $wRebuild%.1f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/sf6.4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)
    if (args.headOption.contains("full")) { fullGraph(spark, t); spark.stop(); return }
    if (args.headOption.contains("er")) { erSplit(spark, t); spark.stop(); return }
    val trans = GraphBuilder.userTransitions(t)
      .select(col("src"), col("dst"), col("ts").cast("timestamp_ntz").as("ts"))
      .transform(Materialize.apply)
    def strong(at: String) = trans
      .filter(col("ts") <= lit(at).cast("timestamp_ntz"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("src", "dst")
    val e1 = strong("2024-01-10 00:00:00").transform(Materialize.apply)
    val e2 = strong("2024-01-20 00:00:00").transform(Materialize.apply)
    val (delta, wDelta) = time(e2.except(e1).transform(Materialize.apply))
    val (base, wBase) = time(Algorithms.cc(e1).transform(Materialize.apply))
    val (inc, wInc) = time {
      val r = Algorithms.ccIncrement(base, delta)
      r.write.mode("overwrite").format("noop").save(); r
    }
    val (_, wRebuild) = time(
      Algorithms.cc(e2).write.mode("overwrite").format("noop").save())
    println(f"[r13b] e1=${e1.count()}%d edges, e2=${e2.count()}%d, delta=${delta.count()}%d (delta derivation $wDelta%.1f s)")
    println(f"[r13b] T1 full cc (nightly build): $wBase%.1f s over ${base.count()}%d labels")
    println(f"[r13b] ccIncrement refresh:        $wInc%.1f s")
    println(f"[r13b] T2 full cc (rebuild):       $wRebuild%.1f s")
    val merged = inc.join(base.withColumnRenamed("component", "old"), Seq("id"), "left")
      .filter(col("old").isNull || col("component") =!= col("old")).count()
    println(f"[r13b] labels changed or added by the refresh: $merged%d")
    spark.stop()
  }
}
