package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._

/** S6 — file-based streaming source: readStream over a parquet directory
  * (the production shape for the events feed; MemoryStream covers the
  * operator semantics, this covers the source itself).
  */
class FileStreamSpec extends SparkSpec {

  test("parquet file source streams the events table incrementally") {
    val dir = Files.createTempDirectory("graft-stream-src")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("batch0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    // ts is TIMESTAMP(NANOS) → LongType under nanosAsLong; convert like Tables.events
    val schema = Tables(spark, sfDir).t("events").schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    val q = stream.writeStream.format("memory").queryName("filesrc")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val total = spark.table("filesrc").agg(sum("cnt")).head().getLong(0)
    assert(total === 1000L, s"all sf0.001 events should stream through, got $total")
  }
}
