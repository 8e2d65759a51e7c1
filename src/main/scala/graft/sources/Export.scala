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
    * output sizes; no assumption about data distribution). Staged rewrite
    * through the Hadoop FileSystem API (so the same code runs on local FS,
    * HDFS, or any Hadoop-compatible store): the compacted copy lands beside
    * the original and is swapped in with two renames. A reader never sees a
    * PARTIALLY COMPACTED file set — but the swap is not transactional:
    * between the two renames there is a brief window where the table path is
    * absent (a concurrent read fails fast rather than returning partial
    * data). A fully atomic swap needs a metadata-pointer table format
    * (Iceberg/Delta-style), out of scope for a directory-of-parquet sink.
    *
    * FLAT tables only: a hive-partitioned directory tree would be rewritten
    * flat (partition columns folded into the data files) — compact each
    * partition directory individually to preserve pruning.
    */
  def compactParquet(spark: SparkSession, path: String,
                     targetBytes: Long = 128L * 1024 * 1024): Long = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    val staged = new org.apache.hadoop.fs.Path(path + "._compact_staged")
    spark.read.parquet(path)
      .repartition(nFiles.toInt)
      .write.mode("overwrite").parquet(staged.toString)
    val old = new org.apache.hadoop.fs.Path(path + "._compact_old")
    require(fs.rename(dir, old), s"could not stage out $path")
    require(fs.rename(staged, dir), s"could not swap in $staged")
    fs.delete(old, true)
    nFiles
  }
}
