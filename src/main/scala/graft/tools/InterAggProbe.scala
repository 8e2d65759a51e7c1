package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** A/B probe (build tool): does g03's repartition-before-aggregate fix
  * also pay on the dedup intersection counts? l03's pair counts group by
  * (da, db) over a join keyed on the trigram g — the same key-mismatch
  * shape as the UBO step join (SCALE.md round 8) — but the collapse
  * factor differs: a pair repeats once per SHARED trigram, and shared
  * trigrams hash across partitions.
  */
object InterAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf0.8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    val ws = t.documents
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val tg = graft.graph.Materialize(ws.select(col("doc_id"),
        explode(expr("transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("g"))
      .distinct())
    println(s"tg rows: ${tg.count()}")
    val joined = tg.select(col("doc_id").as("da"), col("g"))
      .join(tg.select(col("doc_id").as("db"), col("g")), Seq("g"))
      .filter(col("da") < col("db"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s  ($n%,d rows)")
    }
    time("join only (count)")(joined.count())
    time("baseline groupBy(da,db)")(
      joined.groupBy("da", "db").agg(count(lit(1)).as("i")).count())
    time("repartition first")(
      joined.repartition(col("da"), col("db"))
        .groupBy("da", "db").agg(count(lit(1)).as("i")).count())
    time("baseline again")(
      joined.groupBy("da", "db").agg(count(lit(1)).as("i")).count())
    spark.stop()
  }
}
