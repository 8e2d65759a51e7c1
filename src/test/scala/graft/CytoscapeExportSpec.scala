package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** s07's export contract beyond the graded hash: every emitted document
  * must be VALID JSON whose parsed element counts equal the n_nodes /
  * n_edges columns, every edge endpoint must resolve inside the same
  * document's nodes array (a dangling endpoint renders as a broken graph
  * in Cytoscape), and the node array must contain the seed itself.
  */
class CytoscapeExportSpec extends SparkSpec {
  import spark.implicits._

  private val nodeSchema = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("label", StringType),
    StructField("name", StringType))))
  private val edgeSchema = ArrayType(StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("rel_type", StringType), StructField("w_ppm", LongType))))

  test("s07 documents parse back; counts and endpoint closure hold") {
    val docs = SparkEntry.queries("s07_cytoscape_export")(spark, sfDir)
      .withColumn("nodes", from_json(col("nodes_json"), nodeSchema))
      .withColumn("edges", from_json(col("edges_json"), edgeSchema))
      .collect()
    assert(docs.length === 3, "one document per seed")
    docs.foreach { r =>
      val seed = r.getAs[Long]("seed")
      val nodes = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("nodes")
      val edges = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("edges")
      assert(nodes != null && edges != null, s"seed $seed: JSON failed to parse")
      assert(nodes.size.toLong === r.getAs[Long]("n_nodes"), s"seed $seed: node count drift")
      assert(edges.size.toLong === r.getAs[Long]("n_edges"), s"seed $seed: edge count drift")
      val ids = nodes.map(_.getAs[Long]("id")).toSet
      assert(ids.size === nodes.size, s"seed $seed: duplicate node ids")
      assert(ids.contains(seed), s"seed $seed missing from its own ego document")
      edges.foreach { e =>
        assert(ids.contains(e.getAs[Long]("src")) && ids.contains(e.getAs[Long]("dst")),
          s"seed $seed: edge ${e} has an endpoint outside the nodes array")
      }
      // induced-subgraph sanity: an ego net has at least the seed's own edges
      assert(edges.nonEmpty, s"seed $seed: empty edge array")
    }
  }

  test("capEgoMembers: depth dominates, strength breaks ties, seed survives, n_total is pre-cap") {
    // star + shell fixture: seed 100 -> 1..6 (weight i/10), and 1 -> 201,
    // 2 -> 202 (weight 9.0) at depth 2. Induced strengths: node 2 = 9.2,
    // node 1 = 9.1 (their heavy depth-2 edges count — prominence in the
    // DOCUMENT, not distance-to-seed), node 6 = 0.6, … so cap=4 keeps
    // seed + depth-1 nodes {2, 1, 6} — never a depth-2 node while a
    // depth-1 node is cut.
    val edges = ((1 to 6).map(i => (100L, i.toLong, "E", i / 10.0)) ++
      Seq((1L, 201L, "E", 9.0), (2L, 202L, "E", 9.0)))
      .toDF("src", "dst", "rel_type", "weight")
    val seeds = Seq(100L).toDF("seed")
    val members = graph.Traversals.egoMembers(edges, seeds, 2)
    val capped = graph.Traversals.capEgoMembers(edges, members, cap = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("depth"), r.getAs[Long]("n_total")))
    assert(capped.map(_._3).toSet === Set(9L), "n_total must be the PRE-cap member count")
    assert(capped.map(_._1).toSet === Set(100L, 2L, 1L, 6L),
      s"expected seed + strongest-in-document depth-1 nodes, got ${capped.mkString(",")}")
    // capacity past the full depth-1 shell spills into depth 2 by strength:
    // node 1 and 2 both touch a 9.0 edge, id breaks the tie
    val capped8 = graph.Traversals.capEgoMembers(edges, members, cap = 8)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(capped8 === Set(100L, 1L, 2L, 3L, 4L, 5L, 6L, 201L),
      s"cap=8 must keep the whole depth-1 shell then the strongest depth-2 node, got $capped8")
  }

  test("capped export: documents bounded by the cap, truncation visible, closure still holds") {
    val seeds = spark.range(1, 4)
      .select((lit(graph.GraphBuilder.CustomerBase) + col("id")).as("seed"))
    val cap = 8
    val docs = sources.SourceQueries.cytoscapeDocs(spark, sfDir, seeds, radius = 2,
        maxNodesPerSeed = Some(cap))
      .withColumn("nodes", from_json(col("nodes_json"), nodeSchema))
      .withColumn("edges", from_json(col("edges_json"), edgeSchema))
      .collect()
    assert(docs.length === 3)
    docs.foreach { r =>
      val seed = r.getAs[Long]("seed")
      val nodes = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("nodes")
      val edges = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("edges")
      assert(nodes.size <= cap, s"seed $seed: document exceeds the node cap")
      assert(nodes.size.toLong === r.getAs[Long]("n_nodes"))
      assert(r.getAs[Long]("node_cap") === cap.toLong, "cap must be surfaced as a column")
      assert(r.getAs[Long]("n_nodes_total") >= r.getAs[Long]("n_nodes"),
        s"seed $seed: pre-cap total below emitted count")
      // sf0.001 radius-2 customer egos exceed 8 nodes, so truncation is real
      assert(r.getAs[Long]("n_nodes_total") > cap.toLong,
        s"seed $seed: fixture no longer exercises truncation")
      val ids = nodes.map(_.getAs[Long]("id")).toSet
      assert(ids.contains(seed), s"seed $seed evicted by its own cap")
      edges.foreach { e =>
        assert(ids.contains(e.getAs[Long]("src")) && ids.contains(e.getAs[Long]("dst")),
          s"seed $seed: capped document has a dangling endpoint")
      }
    }
  }
}
