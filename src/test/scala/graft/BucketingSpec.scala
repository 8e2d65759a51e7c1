package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** The bucketed layout's contract: a join of two same-key, same-count
  * bucketed tables (and an aggregation on the bucket key above it) must
  * plan with ZERO Exchange operators — the shuffle was paid at write
  * time — and produce exactly the plain-parquet results. Broadcast is
  * disabled for the assertion (at spec scale AQE would broadcast the
  * orders side and hide the exchange question entirely; at the layout's
  * target scale both sides are far past any broadcast threshold).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join + bucket-key agg plan with zero exchanges, exact results") {
    val t = Tables(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    Bucketing.writeBucketed(spark, t.orders, "b_orders", s"$dir/orders", "o_orderkey", 8)
    Bucketing.writeBucketed(spark, t.lineitem, "b_lineitem", s"$dir/lineitem", "l_orderkey", 8)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def query(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      val bucketed = query(spark.table("b_orders"), spark.table("b_lineitem"))
      val got = bucketed.collect()
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg must not shuffle — plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), "co-located join should sort-merge")
      assert(plan.contains("Bucketed: true"), "scans must report the bucketed layout")
      val expected = query(t.orders, t.lineitem).collect()
      assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ===
        expected.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet,
        "bucketed layout changed results")
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
