package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression tests: the properties PLANS.md documents, enforced.
  * A future change that silently drops a pushdown, un-broadcasts a dim, or
  * degrades top-k to a global sort fails here, not in the bench.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(FormattedMode)

  test("r02: every scan-eligible predicate reaches PushedFilters") {
    val p = plan("r02_filter")
    assert(p.contains("PushedFilters"))
    Seq("GreaterThanOrEqual(l_quantity,10.0)", "EqualTo(l_returnflag,R)",
        "In(l_suppkey", "StringStartsWith(l_returnflag,R)")
      .foreach(f => assert(p.contains(f), s"missing pushed filter $f"))
  }

  test("r01: scan reads only the projected columns") {
    val p = plan("r01_projection")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_linenumber")
      && read.contains("l_extendedprice") && read.contains("l_discount"))
    assert(!read.contains("l_shipdate") && !read.contains("l_comment"),
      s"scan reads more than the projection needs: $read")
  }

  test("r03: dimension side plans as a broadcast hash join") {
    assert(plan("r03_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("r16: orderBy.limit plans TakeOrderedAndProject, not a global sort") {
    assert(plan("r16_topk").contains("TakeOrderedAndProject"))
  }

  test("r09: aggregation runs partial then final around one exchange") {
    val p = plan("r09_agg")
    assert(p.contains("HashAggregate"))
    assert("partial".r.findFirstIn(p.toLowerCase).isDefined,
      "no partial (map-side) aggregate in plan")
  }

  test("g12: temporal validity predicate pushes into the scans") {
    val p = plan("g12_snapshot")
    // the snapshot timestamp must appear in scan-level pushed filters, not
    // only in post-scan Filter nodes
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThanOrEqual(o_orderdate"),
      "orderdate validity bound not pushed to the orders scan")
  }

  test("l05 native: cosine_sim runs inside a WholeStageCodegen span") {
    // AQE annotates codegen stages only on the FINAL executed plan — run the
    // query, then inspect (`*(n)` markers in the plan string)
    val df = SparkEntry.queries("l05_cosine_topk_native")(spark, sfDir)
    df.collect() // finalizes THIS QueryExecution's adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), "plan did not finalize")
    val projLine = p.linesIterator.find(_.contains("cosine_sim")).get
    assert("""\*\(\d+\)""".r.findFirstIn(projLine).isDefined,
      s"cosine_sim projection not codegen'd: $projLine")
  }

  test("r07b: custom as-of exec gets exchanges and sorts from EnsureRequirements") {
    val p = plan("r07b_asof_join_custom")
    assert(p.contains("AsOfJoin"))
    assert("""Exchange \(\d+\)""".r.findAllIn(p).size >= 2,
      "both children must exchange")
    assert(p.contains("hashpartitioning"), "exchanges must be hash-partitioned")
    assert("""Sort \(\d+\)""".r.findAllIn(p).size >= 2,
      "both children must sort on (key, ts)")
  }
}
