package graft

import org.apache.spark.sql.functions._

/** 100 TB robustness, part 2 (EmptyInputSpec is part 1): real corpora carry
  * NULL payloads — a crawler that timed out (text), a failed encoder run
  * (embedding), optional telemetry (event_type/props/value). Every graded
  * operator must tolerate a nulled payload ROW — skip it, null-propagate
  * it, or filter it — never throw. Keys and timestamps stay non-null (a
  * null join key is a data-contract violation upstream ingestion rejects;
  * this sweep is about OPTIONAL columns). Every query that throws here
  * would kill a nightly DAG on its first ragged slice.
  */
class NullInputSpec extends SparkSpec {

  /** sf0.001 with every 10th payload value nulled (deterministic by key). */
  lazy val nulledDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nulled").toString
    val passthrough = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem")
    passthrough.foreach { n =>
      spark.read.parquet(s"$sfDir/$n.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    def nullify(df: org.apache.spark.sql.DataFrame, key: String, cols: Seq[String]) =
      cols.foldLeft(df) { (d, c) =>
        d.withColumn(c, when(col(key) % 10 === 3, lit(null)).otherwise(col(c)))
      }
    nullify(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id",
        Seq("text", "lang"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    nullify(spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id",
        Seq("embedding"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    nullify(spark.read.parquet(s"$sfDir/events.parquet"), "event_id",
        Seq("event_type", "props", "value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every graded query tolerates nulled payload columns") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, nulledDir).collect(); None }
        catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse("").linesIterator
              .take(1).mkString.take(160)
            Some(s"$name -> ${e.getClass.getSimpleName}: $msg")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on nulled payloads:\n  " +
        failures.mkString("\n  "))
  }
}
