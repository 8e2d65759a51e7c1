package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S5 — relational/report export sinks (reference: "Export … underlying
  * relational data", /root/reference/README.md:19) and their read twins.
  *
  * Parquet is the system-of-record format (typed, splittable, column-pruned);
  * CSV/JSON are the audit-report formats. CSV is schema-less on read, so the
  * reader takes the schema explicitly — never infer on a 100 TB path (a full
  * inference pass doubles the read).
  */
object Export {
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Partitioned export — the at-scale layout: one directory per partition
    * key value, enabling partition pruning on read.
    */
  def parquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
