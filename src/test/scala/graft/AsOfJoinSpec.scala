package graft

import graft.plans.AsOf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Custom as-of join operator (plans/AsOfJoin.scala): semantics against a
  * window-rewrite reference implementation, plus the edge cases the merge
  * must handle (exact-tie timestamps, keys with no match, multi-partition
  * shuffles, self-as-of).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // reference implementation: per left row, max-ts right row with rts <= lts
  private def reference(l: DataFrame, r: DataFrame): Set[(Long, Long, Option[Long])] =
    l.as[(Long, Long)].collect().map { case (k, lts) =>
      val best = r.as[(Long, Long, Long)].collect()
        .filter(x => x._1 == k && x._2 <= lts)
        .sortBy(x => (x._2, x._3)).lastOption.map(_._3)
      (k, lts, best)
    }.toSet

  test("as-of join: basic semantics, ties inclusive, no-match null-extends") {
    val left = Seq((1L, 100L), (1L, 205L), (2L, 50L), (3L, 10L))
      .toDF("k", "lts").select(col("k"), col("lts"))
    val right = Seq((1L, 100L, 11L), (1L, 200L, 12L), (1L, 300L, 13L),
      (2L, 60L, 21L)).toDF("rk", "rts", "payload")
    val got = AsOf.join(left, right, "k", "rk", "lts", "rts")
      .select(col("k"), col("lts"), col("payload"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got === Set(
      (1L, 100L, Some(11L)), // tie: rts == lts matches (inclusive)
      (1L, 205L, Some(12L)),
      (2L, 50L, None),       // right exists but only later
      (3L, 10L, None)))      // key absent on the right
  }

  test("as-of join matches the reference on multi-partition random data") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 500).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "lts").repartition(7)
    val right = (1 to 800).map(i => (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("rk", "rts", "payload")
      // unique (key, ts): keep max payload, mirroring the dedup contract
      .groupBy("rk", "rts").agg(max("payload").as("payload")).repartition(5)
    val got = AsOf.join(left, right, "k", "rk", "lts", "rts")
      .select(col("k"), col("lts"), col("payload"))
      .as[(Long, Long, Option[Long])].collect()
    val want = reference(left, right.select(col("rk"), col("rts"), col("payload")))
    // left rows may repeat (k, lts): compare as multisets via grouped counts
    val gotM = got.groupBy(identity).view.mapValues(_.size).toMap
    val wantRows = left.as[(Long, Long)].collect().map { case (k, lts) =>
      (k, lts, want.find(w => w._1 == k && w._2 == lts).get._3)
    }
    val wantM = wantRows.groupBy(identity).view.mapValues(_.size).toMap
    assert(gotM === wantM)
  }

  test("self-as-of: each event sees the latest strictly-earlier-or-equal event (dedup'd ts)") {
    val e = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L), (2L, 5L, 200L))
      .toDF("u", "ts", "eid")
    val got = AsOf.join(e, e.withColumnRenamed("u", "ru").withColumnRenamed("ts", "rts")
        .withColumnRenamed("eid", "reid"),
        "u", "ru", "ts", "rts")
      .select(col("eid"), col("reid")).as[(Long, Long)].collect().toMap
    // inclusive tie: every event matches itself (its own ts <= ts)
    assert(got === Map(100L -> 100L, 101L -> 101L, 102L -> 102L, 200L -> 200L))
  }

  test("strict mode excludes the exact-tie row") {
    val left = Seq((1L, 100L), (1L, 150L)).toDF("k", "lts")
    val right = Seq((1L, 100L, 11L), (1L, 150L, 12L)).toDF("rk", "rts", "payload")
    val got = AsOf.join(left, right, "k", "rk", "lts", "rts", strict = true)
      .select(col("lts"), col("payload")).as[(Long, Option[Long])].collect().toSet
    assert(got === Set((100L, None), (150L, Some(11L))))
  }

  test("declared output properties elide a redundant re-sort on (key, ts)") {
    val left = Seq((1L, 100L), (2L, 50L)).toDF("k", "lts")
    val right = Seq((1L, 90L, 11L)).toDF("rk", "rts", "pay")
    val joined = AsOf.join(left, right, "k", "rk", "lts", "rts")
      .sortWithinPartitions(col("k"), col("lts"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    // the declared outputOrdering satisfies the requested sort, so nothing
    // may sit between the plan root and the join except the sort-free spine
    // (the EnsureRequirements sorts live BELOW the join, on its children)
    val aboveJoin = p.linesIterator.takeWhile(!_.contains("AsOfJoin")).toSeq
    assert(aboveJoin.nonEmpty && !aboveJoin.exists(_.contains("Sort")),
      s"redundant post-join sort was not elided:\n$p")
  }

  test("as-of join compiles into a WholeStageCodegen stage and agrees with the interpreted path") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(_ => (rnd.nextInt(10).toLong, rnd.nextInt(500).toLong))
      .toDF("k", "lts").repartition(5)
    val right = (1 to 400).map(i => (rnd.nextInt(12).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("rk", "rts", "payload")
      .groupBy("rk", "rts").agg(max("payload").as("payload")).repartition(3)
    // A Dataset caches its QueryExecution, so conf changes after the first
    // collect would be ignored — build a FRESH query per measurement.
    def joined() = AsOf.join(left, right, "k", "rk", "lts", "rts")
      .select(col("k"), col("lts"), col("payload"))
    // fallback=false: a Janino error in the generated merge would fail the
    // test instead of silently degrading to doExecute. Collect the DataFrame
    // ITSELF (not an .as[] derivative — that is a different QueryExecution)
    // so the inspected adaptive plan is the executed, codegen-collapsed one.
    def rows(a: Array[org.apache.spark.sql.Row]) =
      a.map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .groupBy(identity).view.mapValues(_.size).toMap
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val compiled = joined()
      val withCodegen = rows(compiled.collect())
      val plan = compiled.queryExecution.executedPlan.toString
      val asofLine = plan.linesIterator.find(_.contains("AsOfJoin")).get
      assert(asofLine.trim.stripPrefix("+- ").stripPrefix(":- ").startsWith("*"),
        s"AsOfJoinExec is not inside a WholeStageCodegen stage:\n$plan")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val fresh = joined()
      val interpreted = rows(fresh.collect())
      val interpretedPlan = fresh.queryExecution.executedPlan.toString
      assert("""\*\(\d+\)""".r.findFirstIn(interpretedPlan).isEmpty,
        s"interpreted run must not contain codegen stages:\n$interpretedPlan")
      assert(withCodegen === interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("forward as-of: each left row sees the earliest right row at-or-after it") {
    val left = Seq((1L, 100L), (1L, 205L), (2L, 50L), (3L, 10L)).toDF("k", "lts")
    val right = Seq((1L, 100L, 11L), (1L, 200L, 12L), (1L, 300L, 13L), (2L, 40L, 21L))
      .toDF("rk", "rts", "payload")
    val got = AsOf.joinForward(left, right, "k", "rk", "lts", "rts")
      .select(col("k"), col("lts"), col("payload"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got === Set(
      (1L, 100L, Some(11L)), // inclusive tie matches
      (1L, 205L, Some(13L)), // next-later row
      (2L, 50L, None),       // right exists but only earlier
      (3L, 10L, None)))
    val strict = AsOf.joinForward(left, right, "k", "rk", "lts", "rts", strict = true)
      .select(col("k"), col("lts"), col("payload"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(strict.contains((1L, 100L, Some(12L))), "strict skips the exact tie")
  }

  test("forward as-of matches the min-by rewrite on random multi-partition data") {
    val rnd = new scala.util.Random(53)
    val left = (1 to 400).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(800).toLong))
      .toDF("k", "lts").distinct().repartition(6)
    val right = (1 to 600).map(i => (rnd.nextInt(18).toLong, rnd.nextInt(800).toLong, i.toLong))
      .toDF("rk", "rts", "payload")
      .groupBy("rk", "rts").agg(max("payload").as("payload")).repartition(4)
    def keyed(a: Array[(Long, Long, Option[Long])]) =
      a.map { case (k, lts, p) => (k, lts) -> p }.toMap
    val got = keyed(AsOf.joinForward(left, right, "k", "rk", "lts", "rts")
      .select(col("k"), col("lts"), col("payload"))
      .as[(Long, Long, Option[Long])].collect())
    val rewrite = keyed(left.join(right,
        col("k") === col("rk") && col("rts") >= col("lts"), "left_outer")
      .groupBy("k", "lts")
      .agg(min_by(col("payload"), struct(col("rts"), col("payload"))).as("payload"))
      .as[(Long, Long, Option[Long])].collect())
    assert(got === rewrite)
  }

  test("as-of join on real tables matches the window rewrite") {
    val t = Tables(spark, sfDir)
    val orders = t.orders.select(col("o_orderkey"),
      col("o_custkey").cast("long").as("o_custkey"), col("o_orderdate"))
    val events = t.events.groupBy(col("user_id").cast("long").as("user_id"), col("ts"))
      .agg(max("event_id").as("event_id"))
    val got = AsOf.join(orders, events, "o_custkey", "user_id", "o_orderdate", "ts")
      .select(col("o_orderkey"), col("event_id"))
      .as[(Long, Option[Long])].collect().toMap
    // window rewrite: join + filter + max-by
    val rewrite = orders.join(events,
        col("o_custkey") === col("user_id") && col("ts") <= col("o_orderdate"), "left_outer")
      .groupBy("o_orderkey")
      .agg(max_by(col("event_id"), struct(col("ts"), col("event_id"))).as("event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === rewrite)
  }
}
