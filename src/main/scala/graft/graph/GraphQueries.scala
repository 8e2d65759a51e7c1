package graft.graph

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G-series graph operators (SURVEY.md §2.2) as graded queries.
  * Flagship first (M1); the rest land with M3/M4/M5.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame
  private final case class E(name: String, fn: Q, sql: Option[String])

  private val entries: Seq[E] = Seq(

    // G11 — shared-attribute conflict join (reference: "shared directors,
    // common registered addresses", README.md:15). Here: customer pairs
    // linked by ordering the same part — scan → join → self-join → agg → sort.
    // Scale note: the self-join fans out per-part; part fan-out is bounded
    // (~30 distinct customers per part at every sf), unlike supplier fan-out
    // which would explode — at 100 TB, pick the bounded attribute or cap
    // per-attribute fan-out before the pair join.
    E("g11_conflict_shared_part", (s, d) => {
      val t = Tables(s, d)
      val cp = t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
        .distinct()
      val a = cp.select(col("custkey").as("cust_a"), col("partkey"))
      val b = cp.select(col("custkey").as("cust_b"), col("partkey"))
      a.join(b, Seq("partkey"))
        .filter(col("cust_a") < col("cust_b"))
        .groupBy(col("cust_a"), col("cust_b"))
        .agg(count(lit(1)).as("shared_parts"))
        .filter(col("shared_parts") >= 2)
        .orderBy(col("shared_parts").desc, col("cust_a"), col("cust_b"))
    }, Some("""
      WITH cp AS (
        SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
      SELECT a.custkey AS cust_a, b.custkey AS cust_b, COUNT(*) AS shared_parts
      FROM cp a JOIN cp b ON a.partkey = b.partkey AND a.custkey < b.custkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
      ORDER BY shared_parts DESC, cust_a, cust_b"""))
  )

  val queries: Map[String, Q] = entries.map(e => e.name -> e.fn).toMap
  val oracleSql: Map[String, String] = entries.flatMap(e => e.sql.map(sql => e.name -> sql.trim)).toMap
}
