package graft.tools

import graft.Tables
import graft.graph.{Materialize, Ubo}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-stage profile of g03_ubo_exposure's layered propagation (build tool,
  * not a driver surface; VERDICT r7 #8): times each layer derivation and
  * each propagation step IN ISOLATION (forced by Materialize between
  * stages), so a superlinear total can be attributed to a specific join
  * rather than guessed at. Prints state-row counts per step — the quantity
  * whose growth decides the 100 TB posture.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf3.2 runMain graft.tools.UboProfile
  */
object UboProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    def stage(name: String)(df: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = Materialize(df)
      val n = out.count()
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.1f s  $n%,12d rows")
      out
    }

    val total0 = System.nanoTime()
    val placed = stage("layer placedEdges")(Ubo.placedEdges(t))
    val contains = stage("layer containsEdges")(Ubo.containsEdges(t))
    val supplied = stage("layer suppliedByEdges")(Ubo.suppliedByEdges(t))
    var own = stage("init owners")(
      placed.select(col("src").as("owner")).distinct()
        .select(col("owner"), col("owner").as("entity"), lit(1.0).as("share")))
    Seq("step1 cust->order" -> placed, "step2 order->part" -> contains,
        "step3 part->supplier" -> supplied).foreach { case (name, layer) =>
      own = stage(name)(Ubo.step(own, layer, epsilon = Some(0.005)))
    }
    println(f"TOTAL (staged)          ${(System.nanoTime() - total0) / 1e9}%7.1f s")
    spark.stop()
  }
}
