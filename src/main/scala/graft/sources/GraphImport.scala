package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-document IMPORT source — reads GraphML interchange documents back
  * into (nodes, edges) DataFrames, closing the Neo4j-ecosystem round-trip
  * (reference README.md:25: APOC/Gephi/yEd both write AND read GraphML;
  * s07/s08 covered export only — the VERDICT r11 #7 gap).
  *
  * Declarative by design (SURVEY.md §2.5 ladder, rung (a)): Spark's
  * `xpath` builtin — Hive's non-namespace-aware XPath over the document
  * string — extracts attribute and data arrays per document, which
  * `posexplode` + `element_at` realign into rows. No custom parser, no
  * UDF; the XML parser handles entity unescaping (&amp; → &), and the
  * default GraphML xmlns is transparent because the parse is
  * namespace-unaware (probed: element names match by local name).
  *
  * Alignment contract: each `<node>`/`<edge>` carries EVERY declared
  * `<data>` key exactly once (true of every document [[SourceQueries]]
  * exports, and of APOC's export), because the per-document xpath arrays
  * are positional — a document with optional keys needs a streaming
  * parser over `mapPartitions` instead, the rung-(d) fallback this
  * operator deliberately avoids. Node ids follow the exporter's `n<id>`
  * convention.
  *
  * Scale posture: one xpath evaluation parses the document once per
  * referenced array (a handful per doc); documents are ego-sized by the
  * export cap contract, rows explode partition-locally, and everything
  * downstream is ordinary columnar work — no shuffle is introduced by
  * the import itself.
  */
object GraphImport {

  /** (…keyCols, id LONG, label, name) — the nodes of each GraphML doc in
    * `docCol`, one row per `<node>`. */
  def graphmlNodes(docs: DataFrame, docCol: String = "graphml",
                   keyCols: Seq[String] = Seq("seed")): DataFrame = {
    val d = col(docCol)
    docs
      .withColumn("_ids", xpath(d, lit("graphml/graph/node/@id")))
      .withColumn("_labels", xpath(d, lit("graphml/graph/node/data[@key='label']/text()")))
      .withColumn("_names", xpath(d, lit("graphml/graph/node/data[@key='name']/text()")))
      .select(keyCols.map(col) ++ Seq(
        posexplode(col("_ids")).as(Seq("pos", "nid")),
        col("_labels"), col("_names")): _*)
      .select(keyCols.map(col) ++ Seq(
        expr("substring(nid, 2)").cast("long").as("id"),
        element_at(col("_labels"), col("pos") + 1).as("label"),
        element_at(col("_names"), col("pos") + 1).as("name")): _*)
  }

  private val nodeLinkNodeSchema = org.apache.spark.sql.types.DataType.fromDDL(
    "array<struct<id:bigint,label:string,name:string>>")
  private val nodeLinkEdgeSchema = org.apache.spark.sql.types.DataType.fromDDL(
    "array<struct<src:bigint,dst:bigint,rel_type:string,w_ppm:bigint>>")

  /** (…keyCols, id, label, name) — the nodes of each Cytoscape NODE-LINK
    * document (s07's format: a `nodes_json` array column), one row per
    * node. `from_json` with an explicit schema + `explode` — the JSON
    * sibling of [[graphmlNodes]]; the JSON parser owns escape handling
    * the way the XML parser does for GraphML. Documents with an empty
    * array contribute zero rows (explode semantics — the edgeless-doc
    * contract shared with the GraphML path). */
  def nodeLinkNodes(docs: DataFrame, keyCols: Seq[String] = Seq("seed")): DataFrame =
    docs.select(keyCols.map(col) :+
        explode(from_json(col("nodes_json"), nodeLinkNodeSchema)).as("n"): _*)
      .select(keyCols.map(col) ++ Seq(col("n.id").as("id"),
        col("n.label").as("label"), col("n.name").as("name")): _*)

  /** (…keyCols, src, dst, rel_type, w_ppm) — the edges of each Cytoscape
    * node-link document (`edges_json`), one row per edge instance. */
  def nodeLinkEdges(docs: DataFrame, keyCols: Seq[String] = Seq("seed")): DataFrame =
    docs.select(keyCols.map(col) :+
        explode(from_json(col("edges_json"), nodeLinkEdgeSchema)).as("e"): _*)
      .select(keyCols.map(col) ++ Seq(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.rel_type").as("rel_type"), col("e.w_ppm").as("w_ppm")): _*)

  /** (…keyCols, src LONG, dst LONG, rel_type, w_ppm LONG) — the edges of
    * each GraphML doc in `docCol`, one row per `<edge>`. */
  def graphmlEdges(docs: DataFrame, docCol: String = "graphml",
                   keyCols: Seq[String] = Seq("seed")): DataFrame = {
    val d = col(docCol)
    docs
      .withColumn("_srcs", xpath(d, lit("graphml/graph/edge/@source")))
      .withColumn("_dsts", xpath(d, lit("graphml/graph/edge/@target")))
      .withColumn("_rels", xpath(d, lit("graphml/graph/edge/data[@key='rel']/text()")))
      .withColumn("_ws", xpath(d, lit("graphml/graph/edge/data[@key='w']/text()")))
      .select(keyCols.map(col) ++ Seq(
        posexplode(col("_srcs")).as(Seq("pos", "esrc")),
        col("_dsts"), col("_rels"), col("_ws")): _*)
      .select(keyCols.map(col) ++ Seq(
        expr("substring(esrc, 2)").cast("long").as("src"),
        expr("substring(element_at(_dsts, pos + 1), 2)").cast("long").as("dst"),
        element_at(col("_rels"), col("pos") + 1).as("rel_type"),
        element_at(col("_ws"), col("pos") + 1).cast("long").as("w_ppm")): _*)
  }
}
