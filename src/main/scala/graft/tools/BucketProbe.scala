package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured A/B for the bucketed layout (sources/Bucketing): the
  * orders ⋈ lineitem equi-join + order-key aggregation, plain parquet vs
  * both sides bucketed+sorted by the order key. Prints per-layout
  * min-of-N wall plus the Exchange/Sort operator counts from the
  * executed plans — the structural claim (0 exchanges) next to the
  * wall-clock it buys. Broadcast disabled, matching the layout's target
  * regime (both sides past any broadcast threshold).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.BucketProbe [reps] [buckets]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val t = graft.Tables(spark, sfDir)

    def query(o: DataFrame, l: DataFrame): DataFrame =
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))

    def time(df: => DataFrame): (Double, String) = {
      var plan = ""
      val times = (0 to reps).map { _ =>
        val d = df
        val t0 = System.nanoTime()
        d.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // plan capture AFTER the second nanoTime: stringification cost must
        // not ride inside a window whose purpose is small wall deltas
        plan = d.queryExecution.executedPlan.toString
        dt
      }
      (times.tail.min, plan) // drop warmup
    }
    def ops(plan: String, op: String): Int = s"$op".r.findAllIn(plan).size

    val (plainSec, plainPlan) = time(query(t.orders, t.lineitem))
    println(f"plain     min $plainSec%6.2f s  exchanges=${ops(plainPlan, "Exchange")} sorts=${ops(plainPlan, "Sort \\(")}")

    val dir = s"${sys.props("java.io.tmpdir")}/graft_bucket_probe"
    val tW0 = System.nanoTime()
    graft.sources.Bucketing.writeBucketed(spark, t.orders, "bp_orders", s"$dir/orders", "o_orderkey", buckets)
    graft.sources.Bucketing.writeBucketed(spark, t.lineitem, "bp_lineitem", s"$dir/lineitem", "l_orderkey", buckets)
    val writeSec = (System.nanoTime() - tW0) / 1e9
    val (bSec, bPlan) = time(query(spark.table("bp_orders"), spark.table("bp_lineitem")))
    println(f"bucketed  min $bSec%6.2f s  exchanges=${ops(bPlan, "Exchange")} sorts=${ops(bPlan, "Sort \\(")}  " +
      f"(one-time bucketed write $writeSec%.2f s, $buckets buckets)")
    println(f"speedup x${plainSec / bSec}%.2f per query after the one-time layout cost")
    spark.sql("DROP TABLE IF EXISTS bp_orders")
    spark.sql("DROP TABLE IF EXISTS bp_lineitem")
    spark.stop()
  }
}
