package graft.tools

import graft.Tables
import graft.graph.Materialize
import org.apache.spark.sql.functions._

/** A/B probe (build tool): does the g03 repartition-before-aggregate fix
  * transfer to g11's shared-part pair counts? Same key-mismatch shape —
  * group keys (cust_a, cust_b) vs join key (partkey) — the question is
  * the collapse factor (shared parts per customer pair).
  */
object G11Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf0.8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    val cp = Materialize(t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
      .distinct())
    println(s"cp rows: ${cp.count()}")
    val joined = cp.select(col("custkey").as("cust_a"), col("partkey"))
      .join(cp.select(col("custkey").as("cust_b"), col("partkey")), Seq("partkey"))
      .filter(col("cust_a") < col("cust_b"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s  ($n%,d rows)")
    }
    time("join only (count)")(joined.count())
    time("baseline groupBy+agg")(
      joined.groupBy("cust_a", "cust_b").agg(count(lit(1)).as("shared_parts"))
        .filter(col("shared_parts") >= 2).count())
    time("repartition first")(
      joined.repartition(col("cust_a"), col("cust_b"))
        .groupBy("cust_a", "cust_b").agg(count(lit(1)).as("shared_parts"))
        .filter(col("shared_parts") >= 2).count())
    time("baseline again")(
      joined.groupBy("cust_a", "cust_b").agg(count(lit(1)).as("shared_parts"))
        .filter(col("shared_parts") >= 2).count())
    spark.stop()
  }
}
