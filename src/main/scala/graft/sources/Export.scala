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

  /** Small-file compaction — the table-maintenance pass every long-running
    * pipeline needs: streaming/incremental writers leave many small files,
    * and scan task count (and NameNode/object-store metadata pressure)
    * scales with file count, not bytes. Rewrites `path` into
    * ceil(bytes / targetBytes) files via a round-robin repartition (even
    * output sizes; no assumption about data distribution). Staged rewrite:
    * the compacted copy lands beside the original and is swapped in with
    * two renames, so a reader never sees a half-written table.
    *
    * FLAT tables only: a hive-partitioned directory tree would be rewritten
    * flat (partition columns folded into the data files) — compact each
    * partition directory individually to preserve pruning.
    */
  def compactParquet(spark: SparkSession, path: String,
                     targetBytes: Long = 128L * 1024 * 1024): Long = {
    val dir = new java.io.File(path)
    val bytes = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length()).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    val staged = path + "._compact_staged"
    spark.read.parquet(path)
      .repartition(nFiles.toInt)
      .write.mode("overwrite").parquet(staged)
    val old = new java.io.File(path + "._compact_old")
    def delete(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete); f.delete()
    }
    require(dir.renameTo(old), s"could not stage out $path")
    require(new java.io.File(staged).renameTo(dir), s"could not swap in $staged")
    delete(old)
    nFiles
  }
}
