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
}
