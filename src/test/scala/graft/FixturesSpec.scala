package graft

import graft.graph.{Algorithms, Ubo}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-drawn fixtures from FIXTURES.md §4 (checked in under
  * src/test/resources) with answers computed by hand — the human-auditable
  * layer under the generated-data tests.
  */
class FixturesSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  private def csv(name: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(res(name))

  test("tiny_ownership: diamond sums parallel paths, cycle is depth-capped") {
    val e = csv("tiny_ownership.csv")
      .select(col("src").cast("long"), col("dst").cast("long"), col("weight").cast("double"))
    val init = Seq((1L, 1L, 1.0)).toDF("owner", "entity", "share")
    // 2 steps: 1 -(0.6)-> 2 -> 4 plus 1 -(0.4)-> 3 -> 4 = 1.0 at node 4
    val two = Ubo.propagate(e, init, 2).as[(Long, Long, Double)].collect()
      .map { case (o, ent, s) => ((o, ent), s) }.toMap
    assert(two === Map((1L, 4L) -> 1.0))
    // 4 steps: mass splits 4 -> {5, 6} then reconverges on 7 via 5->7 and 6->7
    val four = Ubo.propagate(e, init, 4).as[(Long, Long, Double)].collect()
      .map { case (o, ent, s) => (ent, s) }.toMap
    assert(math.abs(four(7L) - 1.0) < 1e-12, s"got $four")
    // cycle 5->7->8->5 never diverges: 6 steps from owner 5 terminates with
    // bounded mass
    val cyc = Ubo.propagate(e, Seq((5L, 5L, 1.0)).toDF("owner", "entity", "share"), 6)
      .as[(Long, Long, Double)].collect()
    assert(cyc.forall(_._3 <= 1.0 + 1e-12))
  }

  test("tiny_components: component sizes are exactly 1 / 2 / 4") {
    val e = csv("tiny_components.csv")
      .select(col("src").cast("long"), col("dst").cast("long"))
    val sizes = Algorithms.connectedComponents(e)
      .groupBy("component").count().as[(Long, Long)].collect().map(_._2).sorted.toSeq
    assert(sizes === Seq(1L, 2L, 4L))
  }

  test("tiny_sessions: >30min gap splits the user into two sessions (3 + 2 events)") {
    val ev = csv("tiny_sessions.csv")
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"))
    val sessions = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("n")).as[Long].collect().sorted.toSeq
    assert(sessions === Seq(2L, 3L))
  }
}
