package graft

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element

/** s08's export contract beyond the graded byte hash: every emitted
  * document must be WELL-FORMED XML (the JDK parser is the judge — a
  * missed escape or broken nesting fails here even if both engines
  * produce the same broken bytes), its parsed node/edge element counts
  * must equal the n_nodes/n_edges columns, every edge endpoint must
  * resolve to a declared node id, and the GraphML skeleton (namespace,
  * key declarations, directed graph) must be present.
  */
class GraphmlExportSpec extends SparkSpec {

  private def elems(root: Element, tag: String): Seq[Element] = {
    val nl = root.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  test("s08 documents are well-formed GraphML; counts and endpoint closure hold") {
    val docs = SparkEntry.queries("s08_graphml_export")(spark, sfDir).collect()
    assert(docs.length === 3, "one document per seed")
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    docs.foreach { r =>
      val seed = r.getAs[Long]("seed")
      val xml = r.getAs[String]("graphml")
      val dom = dbf.newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
      val root = dom.getDocumentElement
      assert(root.getLocalName === "graphml", s"seed $seed: wrong root element")
      assert(root.getNamespaceURI === "http://graphml.graphdrawing.org/xmlns")
      assert(elems(root, "key").map(_.getAttribute("id")).toSet
        === Set("label", "name", "rel", "w"), s"seed $seed: key declarations drifted")
      val graph = elems(root, "graph")
      assert(graph.size === 1 && graph.head.getAttribute("edgedefault") === "directed")
      assert(graph.head.getAttribute("id") === s"ego_$seed")
      val nodes = elems(root, "node")
      val edges = elems(root, "edge")
      assert(nodes.size.toLong === r.getAs[Long]("n_nodes"), s"seed $seed: node count drift")
      assert(edges.size.toLong === r.getAs[Long]("n_edges"), s"seed $seed: edge count drift")
      val ids = nodes.map(_.getAttribute("id")).toSet
      assert(ids.size === nodes.size, s"seed $seed: duplicate node ids")
      assert(ids.contains(s"n$seed"), s"seed $seed missing from its own ego document")
      edges.foreach { e =>
        assert(ids.contains(e.getAttribute("source")) && ids.contains(e.getAttribute("target")),
          s"seed $seed: edge ${e.getAttribute("source")}->${e.getAttribute("target")} dangles")
      }
      // every node carries both data keys; spot the seed's own element
      val seedNode = nodes.find(_.getAttribute("id") == s"n$seed").get
      assert(elems(seedNode, "data").map(_.getAttribute("key")).toSet === Set("label", "name"))
    }
  }

  test("XML escaping round-trips the three special characters in element text") {
    // the escape chain is shared semantics, not shared code, between the
    // Spark query and the DuckDB oracle — pin the Spark side against the
    // JDK parser on a hostile name
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val hostile = "A&B <x> & more >>"
    val xml = Seq(hostile).toDF("name")
      .select(concat(lit("<r>"),
        regexp_replace(regexp_replace(regexp_replace(
          col("name"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;"),
        lit("</r>")).as("x"))
      .head().getString(0)
    val dom = DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    assert(dom.getDocumentElement.getTextContent === hostile,
      "escape chain must round-trip through an XML parser")
  }
}
