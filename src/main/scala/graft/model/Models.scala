package graft.model

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed Dataset API (SURVEY.md §1.2: `Dataset[T]` where type safety helps).
  *
  * Case-class encoders give compile-time column checking for library users
  * composing custom logic; the operator packs stay on DataFrame (dynamic
  * schemas compose better for the registry). Timestamps surface as epoch
  * micros (Long) — the same discipline the graded outputs use.
  */
case class Region(r_regionkey: Int, r_name: String)
case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                    c_acctbal: Double, c_mktsegment: String)
case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int, s_acctbal: Double)
case class Part(p_partkey: Long, p_name: String, p_brand: String, p_type: String,
                p_size: Int, p_retailprice: Double)
case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                 o_totalprice: Double, o_orderdate_us: Long, o_orderpriority: String)
case class LineItem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                    l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
                    l_discount: Double, l_tax: Double, l_returnflag: String,
                    l_linestatus: String, l_shipdate_us: Long)
case class Document(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
case class EmbeddingRow(vec_id: Long, embedding: Array[Float], label: Int)
case class GraphNode(id: Long, label: String, name: String)
case class GraphEdge(src: Long, dst: Long, rel_type: String, weight: Double,
                     valid_from_us: Option[Long])

final case class TypedTables(spark: SparkSession, dir: String) {
  private val t = Tables(spark, dir)
  import spark.implicits._

  def region: Dataset[Region] = t.region.as[Region]
  def nation: Dataset[Nation] = t.nation.as[Nation]
  def customer: Dataset[Customer] = t.customer.as[Customer]
  def supplier: Dataset[Supplier] = t.supplier.as[Supplier]
  def part: Dataset[Part] = t.part.as[Part]
  def orders: Dataset[Order] = t.orders
    .withColumn("o_orderdate_us", unix_micros(col("o_orderdate").cast("timestamp_ltz"))).drop("o_orderdate")
    .as[Order]
  def lineitem: Dataset[LineItem] = t.lineitem
    .withColumn("l_shipdate_us", unix_micros(col("l_shipdate").cast("timestamp_ltz"))).drop("l_shipdate")
    .as[LineItem]
  def documents: Dataset[Document] = t.documents.as[Document]
  def embeddings: Dataset[EmbeddingRow] = t.embeddings.as[EmbeddingRow]
}
