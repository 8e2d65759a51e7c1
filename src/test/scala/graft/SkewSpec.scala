package graft

import graft.rel.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // hot key: one key carries 10k rows, others 10
    val fact = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 10).flatMap(i => Seq((2L, i.toLong), (3L, i.toLong))))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "cool")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).groupBy("k", "name").agg(sum("v").as("s"))
      .as[(Long, String, Long)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 8, saltBy = Seq("k", "v"))
      .groupBy("k", "name").agg(sum("v").as("s"))
      .as[(Long, String, Long)].collect().toSet
    assert(salted === plain)
  }

  test("salting spreads the hot key across buckets") {
    val fact = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "v")
    val buckets = fact.withColumn("__salt", pmod(hash(col("k"), col("v")), lit(8)))
      .groupBy("__salt").count().as[(Int, Long)].collect().toMap
    assert(buckets.size === 8, "all salt buckets should be populated")
    assert(buckets.values.max < 1000, "no bucket should hold the whole hot key")
  }
}
