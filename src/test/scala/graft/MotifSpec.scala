package graft

import graft.graph.{GraphBuilder, GraphQueries, Hop, Motif}
import org.apache.spark.sql.functions._

/** The general pattern API must reproduce the hand-built join chains it
  * generalizes — VERBATIM, row for row — plus honor its label and
  * temporal-predicate contracts on both positive and negative cases.
  */
class MotifSpec extends SparkSpec {
  private def g = GraphBuilder(Tables(spark, sfDir))

  test("Motif.find reproduces g35_temporal_motif verbatim") {
    val viaApi = Motif.find(g, Motif("u", None, Seq(
        Hop("v", relType = Some("INTERACTED")),
        Hop("w", relType = Some("INTERACTED"),
          timeOrdered = true, maxDelay = Some("1 HOUR"))),
        notEqual = Seq(("u", "w"))))
      .groupBy(col("v").as("id"))
      .agg(count(lit(1)).as("n_relays"),
           countDistinct(col("u"), col("w")).as("n_pairs"))
      .orderBy("id")
      .collect()
    val handBuilt = GraphQueries.queries("g35_temporal_motif")(spark, sfDir).collect()
    assert(viaApi.nonEmpty && viaApi.sameElements(handBuilt))
  }

  test("Motif.find reproduces g11_conflict_shared_part verbatim (reverse hops)") {
    // (a)-PLACED->(o1)-CONTAINS->(p)<-CONTAINS-(o2)<-PLACED-(b): the walk
    // back down the shared part uses reversed hops; g11's DISTINCT (cust,
    // part) projection becomes a distinct over (a, p, b) before the pair
    // count, and node ids map back to raw custkeys by subtracting the base.
    val viaApi = Motif.find(g, Motif("a", Some("customer"), Seq(
        Hop("o1", relType = Some("PLACED")),
        Hop("p", relType = Some("CONTAINS")),
        Hop("o2", relType = Some("CONTAINS"), reversed = true),
        Hop("b", relType = Some("PLACED"), reversed = true))))
      .filter(col("a") < col("b"))
      .select((col("a") - GraphBuilder.CustomerBase).as("cust_a"),
              col("p"),
              (col("b") - GraphBuilder.CustomerBase).as("cust_b"))
      .distinct()
      .groupBy("cust_a", "cust_b")
      .agg(count(lit(1)).as("shared_parts"))
      .filter(col("shared_parts") >= 2)
      .orderBy(col("shared_parts").desc, col("cust_a"), col("cust_b"))
      .collect()
    val handBuilt = GraphQueries.queries("g11_conflict_shared_part")(spark, sfDir).collect()
    assert(viaApi.nonEmpty && viaApi.sameElements(handBuilt))
  }

  test("label constraints: redundant label is a no-op, wrong label empties the match") {
    val unconstrained = Motif.find(g,
      Motif("c", None, Seq(Hop("o", relType = Some("PLACED"))))).count()
    val redundant = Motif.find(g,
      Motif("c", Some("customer"), Seq(Hop("o", relType = Some("PLACED"))))).count()
    val wrong = Motif.find(g,
      Motif("c", Some("supplier"), Seq(Hop("o", relType = Some("PLACED"))))).count()
    assert(unconstrained > 0 && redundant == unconstrained && wrong == 0)
  }

  test("variable-length hop equals the union of its fixed-length unrollings") {
    // *1..2 must produce EXACTLY the 1-hop rows plus the 2-hop rows with
    // the intermediate projected away (t = last edge's date) — same
    // temporal chaining, same multiplicity.
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("u", "w").agg(count(lit(1)).as("n"), max("t1").as("mx"))
      .orderBy("u", "w").collect()
    val varHop = Motif.find(g, Motif("u", None, Seq(
      Hop("w", relType = Some("INTERACTED"), timeOrdered = true,
          maxDelay = Some("1 HOUR"), repeat = Some((1, 2))))))
    val one = Motif.find(g, Motif("u", None, Seq(
      Hop("w", relType = Some("INTERACTED")))))
    val two = Motif.find(g, Motif("u", None, Seq(
        Hop("mid", relType = Some("INTERACTED")),
        Hop("w", relType = Some("INTERACTED"),
            timeOrdered = true, maxDelay = Some("1 HOUR")))))
      .select(col("u"), col("w"), col("t2").as("t1"))
    val unrolled = one.select("u", "w", "t1").unionByName(two)
    assert(agg(varHop).nonEmpty && agg(varHop).sameElements(agg(unrolled)))
  }

  test("variable-length hop respects direction: reversed *1..2 equals reversed unrolling") {
    // every edge inside the repetition must walk the hop's direction —
    // a reversed var-hop is the union of the reversed 1- and 2-chains
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("u", "w").agg(count(lit(1)).as("n"))
      .orderBy("u", "w").collect()
    val varRev = Motif.find(g, Motif("u", None, Seq(
      Hop("w", relType = Some("INTERACTED"), reversed = true, repeat = Some((1, 2))))))
    val one = Motif.find(g, Motif("u", None, Seq(
      Hop("w", relType = Some("INTERACTED"), reversed = true))))
    val two = Motif.find(g, Motif("u", None, Seq(
        Hop("mid", relType = Some("INTERACTED"), reversed = true),
        Hop("w", relType = Some("INTERACTED"), reversed = true))))
      .select(col("u"), col("w"))
    val unrolled = one.select("u", "w").unionByName(two)
    assert(agg(varRev).nonEmpty && agg(varRev).sameElements(agg(unrolled)))
  }

  test("variable-length lower bound: *2..2 drops the single-edge matches") {
    val exact2 = Motif.find(g, Motif("u", None, Seq(
      Hop("w", relType = Some("INTERACTED"), repeat = Some((2, 2))))))
    val upTo2 = Motif.find(g, Motif("u", None, Seq(
      Hop("w", relType = Some("INTERACTED"), repeat = Some((1, 2))))))
    val one = Motif.find(g, Motif("u", None, Seq(
      Hop("w", relType = Some("INTERACTED")))))
    assert(exact2.count() > 0 && exact2.count() === upTo2.count() - one.count())
  }

  test("temporal predicates drop undated edges (null valid_from never satisfies)") {
    // LOCATED_IN → PART_OF is a real undated 2-chain (customer→nation→region)…
    val undatedChain = Motif("c", None, Seq(
      Hop("n", relType = Some("LOCATED_IN")),
      Hop("r", relType = Some("PART_OF"))))
    assert(Motif.find(g, undatedChain).count() > 0)
    // …that must vanish entirely once the hop demands a time order.
    val timeOrderedChain = undatedChain.copy(hops =
      undatedChain.hops.init :+ undatedChain.hops.last.copy(timeOrdered = true))
    assert(Motif.find(g, timeOrderedChain).count() == 0)
  }
}
