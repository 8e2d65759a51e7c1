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

  test("trail semantics: walk and trail counts differ on a cyclic fixture, trail matches hand count") {
    // two-node cycle a<->b (dated so temporal chaining is unconstrained):
    // *1..3 WALKS from the pair are 6 (a→b, b→a, a→b→a, b→a→b, a→b→a→b,
    // b→a→b→a); TRAILS are just the 2 single edges — every deeper level
    // revisits a node. The exact counts are hand-derivable, so this is the
    // one case where the semantics gap is provable by inspection.
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val edges = Seq((1L, 2L, "T", 1.0, ts), (2L, 1L, "T", 1.0, ts))
      .toDF("src", "dst", "rel_type", "weight", "valid_from")
      .withColumn("valid_from", col("valid_from").cast("timestamp_ntz"))
    val nodes = Seq((1L, "n", "a"), (2L, "n", "b")).toDF("id", "label", "name")
    val cyc = graph.PropertyGraph(nodes, edges)
    def m(unique: Boolean) = Motif.find(cyc, Motif("u", None, Seq(
      Hop("w", relType = Some("T"), repeat = Some((1, 3)), unique = unique))))
    assert(m(unique = false).count() == 6 && m(unique = true).count() == 2)
  }

  test("trail *1..3 equals the hand-unrolled pairwise-guard join chain") {
    // on the real cyclic INTERACTED graph: the array-accumulator guard must
    // produce exactly the union of the 1/2/3-hop fixed chains with every
    // pairwise <> constraint spelled out via notEqual — the join a reviewer
    // would write by hand (and the shape the g38 oracle SQL mirrors).
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("u", "w").agg(count(lit(1)).as("n"))
      .orderBy("u", "w").collect()
    def hop(alias: String, chained: Boolean) =
      Hop(alias, relType = Some("INTERACTED"),
          timeOrdered = chained, maxDelay = if (chained) Some("1 HOUR") else None)
    val trail = Motif.find(g, Motif("u", None, Seq(
      Hop("w", relType = Some("INTERACTED"), timeOrdered = true,
          maxDelay = Some("1 HOUR"), repeat = Some((1, 3)), unique = true))))
    val one = Motif.find(g, Motif("u", None,
        Seq(hop("w", chained = false)), notEqual = Seq(("u", "w"))))
      .select("u", "w")
    val two = Motif.find(g, Motif("u", None,
        Seq(hop("v1", chained = false), hop("w", chained = true)),
        notEqual = Seq(("u", "v1"), ("u", "w"), ("v1", "w"))))
      .select("u", "w")
    val three = Motif.find(g, Motif("u", None,
        Seq(hop("v1", chained = false), hop("v2", chained = true), hop("w", chained = true)),
        notEqual = Seq(("u", "v1"), ("u", "v2"), ("u", "w"),
                       ("v1", "v2"), ("v1", "w"), ("v2", "w"))))
      .select("u", "w")
    val unrolled = one.unionByName(two).unionByName(three)
    val t = agg(trail.select("u", "w"))
    assert(t.nonEmpty && t.sameElements(agg(unrolled)))
  }

  test("undirected hop equals the union of forward and reversed patterns") {
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("u", "w").agg(count(lit(1)).as("n"))
      .orderBy("u", "w").collect()
    val both = Motif.find(g, Motif("u", None, Seq(
      Hop("w", relType = Some("PLACED"), undirected = true))))
    val fwd = Motif.find(g, Motif("u", None, Seq(Hop("w", relType = Some("PLACED")))))
    val rev = Motif.find(g, Motif("u", None, Seq(
      Hop("w", relType = Some("PLACED"), reversed = true))))
    val b = agg(both.select("u", "w"))
    assert(b.nonEmpty &&
      b.sameElements(agg(fwd.select("u", "w").unionByName(rev.select("u", "w")))))
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

  // weighted DAG fixture with distinct weights, for exact hand-checkable
  // bottleneck arithmetic: a→b .6, b→c .3, a→c .9, c→d .5
  private def weightedFixture = {
    import spark.implicits._
    val edges = Seq((1L, 2L, 0.6), (2L, 3L, 0.3), (1L, 3L, 0.9), (3L, 4L, 0.5))
      .toDF("src", "dst", "weight")
      .select(col("src"), col("dst"), lit("OWNS").as("rel_type"), col("weight"),
              lit(null).cast("timestamp_ntz").as("valid_from"))
    val nodes = Seq((1L, "n", "a"), (2L, "n", "b"), (3L, "n", "c"), (4L, "n", "d"))
      .toDF("id", "label", "name")
    graph.PropertyGraph(nodes, edges)
  }

  test("emitWeights: fixed hop carries the edge weight; repeated hop carries the bottleneck min") {
    val wg = weightedFixture
    val fixed = Motif.find(wg, Motif("u", None,
        Seq(Hop("w", relType = Some("OWNS"))), emitWeights = true))
      .select("u", "w", "w1").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fixed === Set((1L, 2L, 0.6), (2L, 3L, 0.3), (1L, 3L, 0.9), (3L, 4L, 0.5)))
    val rep = Motif.find(wg, Motif("u", None,
        Seq(Hop("w", relType = Some("OWNS"), repeat = Some((2, 2)))), emitWeights = true))
      .select("u", "w", "w1").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 2-chains: a→b→c min(.6,.3)=.3, b→c→d min(.3,.5)=.3, a→c→d min(.9,.5)=.5
    assert(rep === Set((1L, 3L, 0.3), (2L, 4L, 0.3), (1L, 4L, 0.5)))
  }

  test("edgeFilter constrains every edge of a repeated hop and equals a pre-filtered graph") {
    val wg = weightedFixture
    val viaFilter = Motif.find(wg, Motif("u", None, Seq(
        Hop("w", relType = Some("OWNS"), repeat = Some((1, 2)),
            edgeFilter = Some(col("weight") >= 0.5))), emitWeights = true))
      .select("u", "w", "w1").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // surviving edges {a→b .6, a→c .9, c→d .5}: three 1-chains + a→c→d (.5);
    // a→b→c is gone because its SECOND link (.3) fails, even though the first passes
    assert(viaFilter === Set((1L, 2L, 0.6), (1L, 3L, 0.9), (3L, 4L, 0.5), (1L, 4L, 0.5)))
    val preFiltered = Motif.find(
      wg.copy(edges = wg.edges.filter(col("weight") >= 0.5)),
      Motif("u", None, Seq(Hop("w", relType = Some("OWNS"), repeat = Some((1, 2)))),
        emitWeights = true))
      .select("u", "w", "w1").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaFilter === preFiltered)
    // an unsatisfiable predicate empties the match
    assert(Motif.find(wg, Motif("u", None, Seq(
      Hop("w", relType = Some("OWNS"), edgeFilter = Some(col("weight") > 1.0))))).count() == 0)
  }

  test("branch hop (from=) equals the hand-built star join") {
    val wg = weightedFixture
    // (a)-[:OWNS]->(b), (a)-[:OWNS]->(c): both branches hang off a
    val star = Motif.find(wg, Motif("a", None, Seq(
        Hop("b", relType = Some("OWNS")),
        Hop("c", relType = Some("OWNS"), from = Some("a"))),
      notEqual = Seq(("b", "c"))))
      .select("a", "b", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // out-edges: 1→{2,3}, 2→{3}, 3→{4}; only a=1 has two distinct targets
    assert(star === Set((1L, 2L, 3L), (1L, 3L, 2L)))
    // hand-built: self-join of the edge list on src
    import spark.implicits._
    val e = wg.edges.select(col("src"), col("dst"))
    val hand = e.select(col("src").as("a"), col("dst").as("b"))
      .join(e.select(col("src").as("a2"), col("dst").as("c")), col("a") === col("a2"))
      .filter(col("b") =!= col("c")).select("a", "b", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(star === hand)
  }

  test("closing hop matches cycles exactly: all rotations, canonical filter picks one") {
    import spark.implicits._
    // directed triangle 1→2→3→1 plus a chord 1→3 that closes no cycle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
      .select(col("src"), col("dst"), lit("T").as("rel_type"),
              lit(1.0).as("weight"), lit(null).cast("timestamp_ntz").as("valid_from"))
    val nodes = Seq((1L, "n", "a"), (2L, "n", "b"), (3L, "n", "c")).toDF("id", "label", "name")
    val pg = graph.PropertyGraph(nodes, edges)
    val cycles = Motif.find(pg, Motif("a", None, Seq(
        Hop("b", relType = Some("T")),
        Hop("c", relType = Some("T")),
        Hop("a", relType = Some("T"), closes = true))))
      .select("a", "b", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the one triangle appears once per rotation; the chord closes nothing
    assert(cycles === Set((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L)))
    val canonical = cycles.filter { case (a, b, c) => a < b && a < c }
    assert(canonical === Set((1L, 2L, 3L)))
  }

  test("closing hop emits its edge's weight (w_k) like any other hop") {
    val wg = weightedFixture // 1→2 .6, 2→3 .3, 1→3 .9, 3→4 .5 — no cycles
    // add the closing edge 3→1 (.4) to make exactly one triangle
    val withBack = wg.copy(edges = wg.edges.unionByName(
      wg.edges.sparkSession.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(3L, 1L, "OWNS", 0.4, null)),
        wg.edges.schema)))
    val r = Motif.find(withBack, Motif("a", None, Seq(
        Hop("b", relType = Some("OWNS")),
        Hop("c", relType = Some("OWNS")),
        Hop("a", relType = Some("OWNS"), closes = true)),
      emitWeights = true))
      .filter(col("a") === 1)
      .select("a", "b", "c", "w1", "w2", "w3").collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getLong(1), row.getLong(2)) === ((2L, 3L)))
    assert((row.getDouble(3), row.getDouble(4), row.getDouble(5)) === ((0.6, 0.3, 0.4)))
  }

  test("zero-length repetition (*0..hi): alias binds the entry node with null t/w") {
    val wg = weightedFixture // DAG: 1→2 .6, 2→3 .3, 1→3 .9, 3→4 .5
    val r = Motif.find(wg, Motif("u", None, Seq(
        Hop("w", relType = Some("OWNS"), repeat = Some((0, 1)))), emitWeights = true))
      .select("u", "w", "w1").collect()
    val pairs = r.map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs === Set((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L),
                         (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    // zero-length rows carry null weight, traversed rows carry the edge's
    assert(r.filter(x => x.getLong(0) == x.getLong(1)).forall(_.isNullAt(2)))
    assert(r.filter(x => x.getLong(0) != x.getLong(1)).forall(!_.isNullAt(2)))
    // *0..2 equals the zero-length identity plus *1..2, row for row
    val z2 = Motif.find(wg, Motif("u", None, Seq(
        Hop("w", relType = Some("OWNS"), repeat = Some((0, 2))))))
      .select("u", "w").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val manual = Motif.find(wg, Motif("u", None, Seq(
        Hop("w", relType = Some("OWNS"), repeat = Some((1, 2))))))
      .select("u", "w").collect().map(x => (x.getLong(0), x.getLong(1))) ++
      Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
    assert(z2.sameElements(manual.sorted))
  }

  test("edgeUnique removes same-edge rebinds, keeps node revisits (Cypher MATCH default)") {
    import spark.implicits._
    // undirected path a—b—c (stored 1→2, 2→3): 2-hop undirected walks are 6
    // (each of the 4 orientations extends, plus both backtracks per middle);
    // Cypher-default edge uniqueness keeps only the 2 genuine traversals
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
      .select(col("src"), col("dst"), lit("T").as("rel_type"),
              lit(1.0).as("weight"), lit(null).cast("timestamp_ntz").as("valid_from"))
    val nodes = Seq((1L, "n", "a"), (2L, "n", "b"), (3L, "n", "c")).toDF("id", "label", "name")
    val pg = graph.PropertyGraph(nodes, edges)
    def walks(eu: Boolean) = Motif.find(pg, Motif("u", None, Seq(
        Hop("v", relType = Some("T"), undirected = true),
        Hop("w", relType = Some("T"), undirected = true)),
      edgeUnique = eu))
      .select("u", "v", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(walks(eu = false).length == 6)
    assert(walks(eu = true).toSet === Set((1L, 2L, 3L), (3L, 2L, 1L)))
  }

  test("edgeUnique never excludes an unmatched optional hop (null identity)") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("src", "dst")
      .select(col("src"), col("dst"), lit("T").as("rel_type"),
              lit(1.0).as("weight"), lit(null).cast("timestamp_ntz").as("valid_from"))
    val nodes = Seq((1L, "n", "a"), (2L, "n", "b")).toDF("id", "label", "name")
    val pg = graph.PropertyGraph(nodes, edges)
    val r = Motif.find(pg, Motif("u", None, Seq(
        Hop("v", relType = Some("T")),
        Hop("w", relType = Some("T"), optional = true)),
      edgeUnique = true))
      .select("u", "v", "w").collect()
    assert(r.length == 1 && r.head.getLong(0) == 1L && r.head.isNullAt(2))
  }

  test("optional hop preserves unmatched rows with nulls; inner form is its subset") {
    val wg = weightedFixture
    def res(opt: Boolean) = Motif.find(wg, Motif("u", None, Seq(
        Hop("v", relType = Some("OWNS")),
        Hop("w", relType = Some("OWNS"), optional = opt,
            edgeFilter = Some(col("weight") >= 0.5)))))
      .select("u", "v", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // edges surviving the filter: a→b .6, a→c .9, c→d .5. Chains:
    // (a,b) — b's only out-edge (.3) fails the filter → preserved with null;
    // (b,c) and (a,c) extend to d; (c,d) — d has no out-edge → null.
    assert(res(opt = true) ===
      Set((1L, 2L, -1L), (2L, 3L, 4L), (1L, 3L, 4L), (3L, 4L, -1L)))
    assert(res(opt = false) === Set((2L, 3L, 4L), (1L, 3L, 4L)))
  }

  test("optional hop: notEqual against the null alias excludes the preserved rows (3VL)") {
    val wg = weightedFixture
    val r = Motif.find(wg, Motif("u", None, Seq(
        Hop("v", relType = Some("OWNS")),
        Hop("w", relType = Some("OWNS"), optional = true,
            edgeFilter = Some(col("weight") >= 0.5))),
      notEqual = Seq(("u", "w"))))
      .select("u", "v", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(r === Set((2L, 3L, 4L), (1L, 3L, 4L)))
  }

  test("optional hop: label constraint decides matchedness, never drops preserved rows") {
    val wg = weightedFixture
    // a label no node carries: every row survives, all with a null alias —
    // a post-hoc semi-join (the non-optional lowering) would return zero rows
    val r = Motif.find(wg, Motif("u", None, Seq(
        Hop("v", relType = Some("OWNS")),
        Hop("w", relType = Some("OWNS"), optional = true, label = Some("nope")))))
      .select("w").collect()
    assert(r.length == 4 && r.forall(_.isNullAt(0)))
  }

  test("optional hop: temporal predicates fold into the join condition") {
    import spark.implicits._
    // 1→2 fires at 01:00, 2→3 at 00:00 — a timeOrdered extension of (1,2)
    // must find NO match (the only candidate fires earlier), yet the row
    // survives with nulls; a post-join filter would kill it instead.
    val edges = Seq(
        (1L, 2L, "T", 1.0, java.sql.Timestamp.valueOf("2024-01-01 01:00:00")),
        (2L, 3L, "T", 1.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("src", "dst", "rel_type", "weight", "valid_from")
      .withColumn("valid_from", col("valid_from").cast("timestamp_ntz"))
    val nodes = Seq((1L, "n", "a"), (2L, "n", "b"), (3L, "n", "c")).toDF("id", "label", "name")
    val pg = graph.PropertyGraph(nodes, edges)
    def rows(opt: Boolean) = Motif.find(pg, Motif("u", None, Seq(
        Hop("v", relType = Some("T")),
        Hop("w", relType = Some("T"), optional = opt, timeOrdered = true))))
      .select("u", "v", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows(opt = true) === Set((1L, 2L, -1L), (2L, 3L, -1L)))
    assert(rows(opt = false) === Set.empty[(Long, Long, Long)])
  }

  // ——— adviseOrder (VERDICT r10 #8): the round-9 g42 ordering lesson as a
  // measured machine answer — never a silent reorder.

  /** g42's graded EVIDENCE-FIRST ordering (part chain mid, nation close last). */
  private def g42EvidenceFirst = Motif("a", Some("customer"), Seq(
    Hop("n", relType = Some("LOCATED_IN")),
    Hop("o1", relType = Some("PLACED"), from = Some("a")),
    Hop("p", relType = Some("CONTAINS")),
    Hop("o2", relType = Some("CONTAINS"), reversed = true),
    Hop("b", relType = Some("PLACED"), reversed = true),
    Hop("n", relType = Some("LOCATED_IN"), closes = true)))

  /** The SCALE.md alternative: bind both same-nation customers FIRST, then
    * close at b through the part chain. LOCATED_IN also covers suppliers,
    * so the backward hop needs the customer label g42's PLACED leg gets
    * for free. */
  private def g42NationFirst = Motif("a", Some("customer"), Seq(
    Hop("n", relType = Some("LOCATED_IN")),
    Hop("b", relType = Some("LOCATED_IN"), reversed = true, from = Some("n"),
        label = Some("customer")),
    Hop("o1", relType = Some("PLACED"), from = Some("a")),
    Hop("p", relType = Some("CONTAINS")),
    Hop("o2", relType = Some("CONTAINS"), reversed = true),
    Hop("b", relType = Some("PLACED"), reversed = true, closes = true)))

  test("adviseOrder ranks g42's evidence-first order over nation-pair-first") {
    val ranked = Motif.adviseOrder(g, Seq(
      "evidence-first" -> g42EvidenceFirst, "nation-first" -> g42NationFirst))
    assert(ranked.map(_._1) === Seq("evidence-first", "nation-first"),
      s"estimator must rank the evidence-first order cheapest, got $ranked")
    // the gap is structural (nation-first drags the pair multiplicity
    // through the whole part chain), not a rounding artifact
    assert(ranked(1)._2 > 2.0 * ranked(0)._2,
      s"peak-state gap should be decisive: $ranked")
  }

  test("the two g42 orderings are semantically equivalent (advice chooses among equals)") {
    def result(m: Motif) = Motif.find(g, m)
      .filter(col("a") < col("b"))
      .select("n", "a", "b", "p").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val ev = result(g42EvidenceFirst)
    assert(ev.nonEmpty && ev === result(g42NationFirst))
  }

  test("estimateHops: hop-1 estimate is the exact first-join count; closing hop contracts") {
    val est = Motif.estimateHops(g, g42EvidenceFirst)
    val exact = g.edges.filter(col("rel_type") === "LOCATED_IN")
      .join(g.nodes.filter(col("label") === "customer").select(col("id")),
        col("src") === col("id"), "left_semi").count()
    assert(est.head.cumRows === exact.toDouble,
      s"hop-1 cum must equal the measured first-join rows ($exact), got ${est.head.cumRows}")
    val closing = est.last
    assert(closing.factor < 1.0, "a closing equality must contract the state")
    assert(est.map(_.cumRows).max > est.head.cumRows,
      "the part chain must dominate the peak in the evidence-first order")
  }
}
