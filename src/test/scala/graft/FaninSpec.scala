package graft

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** g63 (sliding fan-in velocity) and t15 (tumbling fan-in alert): the
  * oracles hash outcomes; these tests pin the WINDOW SEMANTICS against a
  * brute-force O(n²) definition on a hand fixture, the peak tie rule
  * (earliest time at the maximum), and the dedup-then-count ≡
  * countDistinct identity the t15 batch twin stands on.
  */
class FaninSpec extends SparkSpec {
  import spark.implicits._

  private val HorizonUs = 6L * 3600L * 1000000L
  private def ts(h: Int, m: Int = 0) = new Timestamp(3600000L * h + 60000L * m)

  test("g63 velocity: trailing 6h distinct-source count equals brute force") {
    val rows = Seq(
      (1L, 100L, ts(0)), (2L, 100L, ts(1)), (1L, 100L, ts(2)),
      (3L, 100L, ts(5, 59)),           // still inside [−6h, 0] of everything above
      (4L, 100L, ts(12, 30)),          // alone: the early cluster has aged out
      (5L, 200L, ts(3)), (5L, 200L, ts(4)))
    val df = rows.toDF("src", "dst", "ts")
    val w = Window.partitionBy("dst").orderBy(col("ts_us"))
      .rangeBetween(-HorizonUs, 0)
    val got = df.select(col("src"), col("dst"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("v", size(array_distinct(collect_list(col("src")).over(w))).cast("long"))
      .collect().map(r => (r.getAs[Long]("dst"), r.getAs[Long]("ts_us"), r.getAs[Long]("v")))
      .toSet
    val raw = rows.map { case (s0, d0, t0) => (s0, d0, t0.getTime * 1000L) }
    val expect = raw.map { case (_, d0, t0) =>
      (d0, t0, raw.filter { case (_, d1, t1) => d1 == d0 && t1 <= t0 && t1 >= t0 - HorizonUs }
        .map(_._1).distinct.size.toLong)
    }.toSet
    assert(got === expect, s"window velocity diverged from brute force:\n$got\nvs\n$expect")
  }

  test("g63 peak tie rule: the reported peak time is the EARLIEST at max velocity") {
    // dst 100 reaches v=2 at ts(1), drops back to isolated v=1 events far
    // later, reaches v=2 again at ts(20,30): peak_ts must be the first.
    val rows = Seq(
      (1L, 100L, ts(0)), (2L, 100L, ts(1)),
      (3L, 100L, ts(20)), (4L, 100L, ts(20, 30)))
    val df = rows.toDF("src", "dst", "ts")
    val w = Window.partitionBy("dst").orderBy(col("ts_us")).rangeBetween(-HorizonUs, 0)
    val out = df.select(col("src"), col("dst"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("v", size(array_distinct(collect_list(col("src")).over(w))).cast("long"))
      .groupBy(col("dst"))
      .agg(max(struct(col("v"), (-col("ts_us")).as("nts"))).as("pk"))
      .select(col("dst"), col("pk.v").as("peak_v"), (-col("pk.nts")).as("peak_ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((100L, 2L, ts(1).getTime * 1000L)))
  }

  test("t15 batch: dedup-then-count equals countDistinct on the graded transitions") {
    val tr = graph.GraphBuilder.userTransitions(Tables(spark, sfDir))
    val a = stream.EventOps.faninAlerts(tr, minDistinct = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = tr.withColumn("win", window(col("ts"), "6 hours"))
      .groupBy(col("win"), col("dst"))
      .agg(countDistinct(col("src")).as("n"))
      .filter(col("n") >= 3)
      .select(unix_timestamp(col("win.start")).as("w"), col("dst"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a.nonEmpty, "fixture must fire at least one alert")
    assert(a === b)
  }

  test("g63 and t15 agree on WHO is flagged when horizons align") {
    // every tumbling-window alert implies a sliding-window peak at least as
    // high (the sliding trailing interval covers any aligned bucket's
    // content by its last event) — the converse need not hold
    val g63 = SparkEntry.queries("g63_fanin_velocity")(spark, sfDir)
      .select("user").as[Long].collect().toSet
    val t15 = SparkEntry.queries("t15_fanin_alert")(spark, sfDir)
      .select("user").as[Long].collect().toSet
    assert(t15.subsetOf(g63),
      s"tumbling alerts must be a subset of sliding-peak flags: ${t15 -- g63}")
  }
}
