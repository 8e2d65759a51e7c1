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
    // ts encoding varies by fixture round (ns-as-LONG vs µs NTZ) — normalize
    // through the same adapter the batch path uses
    val schema = Tables(spark, sfDir).t("events").schema
    val stream = Tables.normalizeEventsTs(
        spark.readStream.schema(schema).parquet(dir.toString))
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    val q = stream.writeStream.format("memory").queryName("filesrc")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val total = spark.table("filesrc").agg(sum("cnt")).head().getLong(0)
    assert(total === 1000L, s"all sf0.001 events should stream through, got $total")
  }

  test("checkpointed dedup stream resumes after a kill without re-emitting or losing rows") {
    // The operational property behind every long-running ingest job: the
    // process dies (deploy, OOM, preemption), a NEW query object restarts
    // from the same checkpoint, and the sink still holds each key exactly
    // once — source offsets AND dedup state both come back from the
    // checkpoint, not from a fresh scan. A resent key from before the kill
    // is the sharp probe: only RESTORED state can drop it.
    val src = Files.createTempDirectory("graft-ckpt-src")
    val sink = Files.createTempDirectory("graft-ckpt-sink")
    val ckpt = Files.createTempDirectory("graft-ckpt-state")
    val raw = Tables(spark, sfDir).t("events")
    val schema = raw.schema
    def writeBatch(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-ckpt-b").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, src.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    }
    def startQ() = spark.readStream.schema(schema).parquet(src.toString)
      .dropDuplicates("event_id")
      .writeStream.format("parquet")
      .option("path", sink.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()

    writeBatch(raw.filter(col("event_id") < 300), "b0.parquet")
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop()

    // batch 2: resend half of batch 1 (same event_ids) + genuinely new rows
    writeBatch(raw.filter(col("event_id") < 150 ||
        (col("event_id") >= 300 && col("event_id") < 500)), "b1.parquet")
    val q2 = startQ() // NEW query instance — state must come from the checkpoint
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(sink.toString)
    val n = out.count()
    val nDistinct = out.select("event_id").distinct().count()
    val expected = raw.filter(col("event_id") < 500).count()
    assert(n === nDistinct, s"restart re-emitted ${n - nDistinct} duplicate rows")
    assert(n === expected, s"exactly-once across restart: got $n rows, want $expected")
  }
}
