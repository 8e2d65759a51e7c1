package graft

import graft.model._

class TypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed tables round every table through case-class encoders") {
    val tt = TypedTables(spark, sfDir)
    assert(tt.region.collect().map(_.r_name).sorted.nonEmpty)
    assert(tt.customer.head().c_custkey >= 0)
    assert(tt.orders.head().o_orderdate_us > 0L)
    assert(tt.lineitem.head().l_shipdate_us > 0L)
    assert(tt.embeddings.head().embedding.length === 64)
    assert(tt.documents.count() === 500)
  }

  test("typed pipeline: filter + map + groupByKey composes") {
    val tt = TypedTables(spark, sfDir)
    val bySegment = tt.customer
      .filter(_.c_acctbal > 0)
      .groupByKey(_.c_mktsegment)
      .mapGroups((seg, cs) => (seg, cs.map(_.c_acctbal).sum))
      .collect().toMap
    assert(bySegment.keySet.contains("BUILDING"))
    assert(bySegment.values.forall(_ > 0))
  }
}
