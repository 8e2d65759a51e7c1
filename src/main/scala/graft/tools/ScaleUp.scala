package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data builder: writes K id-shifted copies of a source sf
  * directory as one larger sf (e.g. 4 × sf0.1 → "sf0.4"), preserving every
  * FK relationship within each copy (all big keys shift by the same
  * per-copy offset; small dimensions — region, nation — and nationkey FKs
  * are shared across copies, as TPC-H scaling does). Distribution SHAPE is
  * preserved, so tier gates and partition sizing see a faithful 4× load.
  * Output goes OUTSIDE /root/testdata (that tree is read-only).
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> <copies>
  */
object ScaleUp {
  private val Shift = 10000000L // > every key range at sf0.1, ≪ 1e9 node-id base gap

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesS) = args.take(3)
    val copies = copiesS.toInt
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    def shifted(table: String, keyCols: Seq[String]): DataFrame = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until copies).map { k =>
        keyCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(k * Shift)) }
      }.reduce(_ unionByName _)
    }
    val plan: Seq[(String, Seq[String])] = Seq(
      "region" -> Seq.empty, "nation" -> Seq.empty, // shared dims: one copy
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    plan.foreach { case (t, keys) =>
      val df0 = if (keys.isEmpty) spark.read.parquet(s"$src/$t.parquet")
                else shifted(t, keys)
      // events.ts arrives as epoch-nanos LONG (nanosAsLong session flag, see
      // Tables.events). Write it back as a µs TIMESTAMP — lossless (the data
      // is µs-precision) and type-faithful for BOTH engines: a raw-long copy
      // breaks every DuckDB oracle that unions ts into a TIMESTAMP column
      // (edgesCte valid_from), while Tables.events adapts to either type.
      val df = if (t == "events" &&
                   df0.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df0
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"scaleup: $t -> ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
