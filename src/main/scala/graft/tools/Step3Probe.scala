package graft.tools

import graft.Tables
import graft.graph.{Materialize, Ubo}
import org.apache.spark.sql.functions._

/** One-off dissection of g03's step-3 join (build tool; VERDICT r7 #8
  * follow-up): UboProfile showed step3 (part→supplier) 20× slower than the
  * identically-shaped step2 at the same row counts. This times the join
  * alone, the join+agg, and prints the executed plan to locate the cost.
  */
object Step3Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf0.8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    val placed = Materialize(Ubo.placedEdges(t))
    val contains = Materialize(Ubo.containsEdges(t))
    val supplied = Materialize(Ubo.suppliedByEdges(t))
    val init = placed.select(col("src").as("owner")).distinct()
      .select(col("owner"), col("owner").as("entity"), lit(1.0).as("share"))
    def step(own: org.apache.spark.sql.DataFrame, layer: org.apache.spark.sql.DataFrame) =
      own.join(layer, col("entity") === col("src"))
        .groupBy(col("owner"), col("dst"))
        .agg(sum(col("share") * col("weight")).as("share"))
        .filter(col("share") >= 0.005)
        .select(col("owner"), col("dst").as("entity"), col("share"))
    val own2 = Materialize(step(Materialize(step(init, placed)), contains))
    println(s"own2 rows: ${own2.count()}, supplied rows: ${supplied.count()}")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s  ($n%,d rows)")
    }
    val joined = own2.join(supplied, col("entity") === col("src"))
    time("join only (count)")(joined.count())
    time("join+project (noop)") {
      joined.select(col("owner"), col("dst"), (col("share") * col("weight")).as("c"))
        .write.mode("overwrite").format("noop").save(); -1L
    }
    val agg = joined.groupBy(col("owner"), col("dst"))
      .agg(sum(col("share") * col("weight")).as("share"))
      .filter(col("share") >= 0.005)
    time("join+agg (count)")(agg.count())
    // v2: exchange join output on the group keys FIRST — partial agg then
    // actually collapses (all of a pair's ~52 part-contributions colocate)
    val v2 = joined.repartition(col("owner"), col("dst"))
      .groupBy(col("owner"), col("dst"))
      .agg(sum(col("share") * col("weight")).as("share"))
      .filter(col("share") >= 0.005)
    time("v2 repartition+agg")(v2.count())
    // v3: wider agg parallelism so per-task partial maps fit in memory
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    val joined3 = own2.join(supplied, col("entity") === col("src"))
    val v3 = joined3.groupBy(col("owner"), col("dst"))
      .agg(sum(col("share") * col("weight")).as("share"))
      .filter(col("share") >= 0.005)
    time("v3 256-part agg")(v3.count())
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    // fused reference: the real g03 plan (no staging materialization)
    val t0f = System.nanoTime()
    val placedL = Ubo.placedEdges(t)
    val initL = placedL.select(col("src").as("owner")).distinct()
      .select(col("owner"), col("owner").as("entity"), lit(1.0).as("share"))
    val fused = Ubo.propagateLayers(
      Seq(placedL, Ubo.containsEdges(t), Ubo.suppliedByEdges(t)),
      initL, epsilon = Some(0.005), materializeLayers = false)
    val nf = fused.count()
    println(f"fused g03 propagation        ${(System.nanoTime() - t0f) / 1e9}%7.1f s  ($nf%,d rows)")
    spark.stop()
  }
}
