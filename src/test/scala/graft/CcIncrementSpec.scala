package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.Algorithms

/** [[Algorithms.ccIncrement]] contract: maintaining a CC labeling under
  * edge ARRIVALS equals a full re-run of cc() on the grown graph,
  * row-for-row (min-id labels) — on hand fixtures covering every merge
  * topology (two-way merge, three-way bridge, new nodes, new-node chain
  * into an existing component, intra-component no-op, self-loop
  * singleton) and on the real graded slice (g66's strong user graph),
  * where it must also match the unsplit rebuild the DuckDB oracle runs.
  */
class CcIncrementSpec extends SparkSpec {
  import spark.implicits._

  private def edges(e: Seq[(Long, Long)]): DataFrame = e.toDF("src", "dst")

  private def labels(df: DataFrame): Map[Long, Long] =
    df.select("id", "component").as[(Long, Long)].collect().toMap

  /** increment ≡ rebuild on (base, delta). */
  private def checkEquiv(base: Seq[(Long, Long)], delta: Seq[(Long, Long)]): Map[Long, Long] = {
    val inc = labels(Algorithms.ccIncrement(Algorithms.cc(edges(base)), edges(delta)))
    val reb = labels(Algorithms.cc(edges(base ++ delta)))
    assert(inc === reb)
    inc
  }

  private val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))

  test("delta merging two components relabels both to the joint min") {
    val got = checkEquiv(base, Seq((3L, 10L)))
    assert(got(11L) === 1L && got(10L) === 1L && got(1L) === 1L)
    assert(got(20L) === 20L && got(21L) === 20L) // untouched component keeps its label
  }

  test("delta bridging three components into one") {
    val got = checkEquiv(base, Seq((3L, 10L), (11L, 20L)))
    assert(Set(1L, 2L, 3L, 10L, 11L, 20L, 21L).forall(got(_) == 1L))
  }

  test("delta introducing brand-new nodes forms a new component") {
    val got = checkEquiv(base, Seq((30L, 31L)))
    assert(got(30L) === 30L && got(31L) === 30L)
    assert(got(1L) === 1L)
  }

  test("new-node chain attaching to an existing component adopts its label") {
    val got = checkEquiv(base, Seq((21L, 30L), (30L, 31L)))
    assert(got(30L) === 20L && got(31L) === 20L && got(21L) === 20L)
  }

  test("intra-component delta is a no-op") {
    val got = checkEquiv(base, Seq((1L, 3L)))
    assert(labels(Algorithms.cc(edges(base))) === got)
  }

  test("self-loop delta on a new node yields a singleton component") {
    val got = checkEquiv(base, Seq((40L, 40L)))
    assert(got(40L) === 40L)
  }

  test("a new node with a SMALLER id than the component min becomes the new label") {
    val got = checkEquiv(base, Seq((0L, 21L)))
    assert(got(0L) === 0L && got(20L) === 0L && got(21L) === 0L)
  }

  test("empty delta returns the base labeling unchanged") {
    val got = checkEquiv(base, Seq.empty)
    assert(got === labels(Algorithms.cc(edges(base))))
  }

  test("re-applying the same delta is a no-op (at-least-once replay safety)") {
    // after a delta is folded in, its endpoints share components, so every
    // replayed edge maps to ca == cb and the merge map is empty — the
    // property that makes a foreachBatch maintenance loop safe under
    // at-least-once batch replay
    val delta = Seq((3L, 10L), (21L, 30L))
    val once = Algorithms.ccIncrement(Algorithms.cc(edges(base)), edges(delta))
    val twice = Algorithms.ccIncrement(once, edges(delta))
    assert(labels(twice) === labels(once))
  }

  test("incremental ER merge map (g67) equals the from-scratch resolution (g48) row-for-row") {
    // the two graded queries share ONE oracle by design; assert the same
    // equality engine-internally so a future drift between the blockers
    // (self-join vs two-table delta join) fails here, not at the driver
    val inc = SparkEntry.queries("g67_er_increment")(spark, sfDir).collect().toSeq
    val reb = SparkEntry.queries("g48_er_merge_map")(spark, sfDir).collect().toSeq
    assert(inc.nonEmpty && inc === reb)
  }

  test("real slice: g66's increment equals the full rebuild of the T2 strong graph") {
    val t = Tables(spark, sfDir)
    val trans = graft.graph.GraphBuilder.userTransitions(t)
      .select(col("src"), col("dst"), col("ts").cast("timestamp_ntz").as("ts"))
    def strong(at: String) = trans
      .filter(col("ts") <= lit(at).cast("timestamp_ntz"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("src", "dst")
    val e1 = strong("2024-01-10 00:00:00")
    val e2 = strong("2024-01-20 00:00:00")
    val delta = e2.except(e1)
    assert(!delta.isEmpty, "fixture must exercise a non-empty delta")
    val inc = labels(Algorithms.ccIncrement(Algorithms.cc(e1), delta))
    val reb = labels(Algorithms.cc(e2))
    assert(inc === reb)
  }
}
