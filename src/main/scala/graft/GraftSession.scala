package graft

import org.apache.spark.sql.SparkSession

/** Single session factory for every entry point (Verify, Bench, tools,
  * tests) — the config set here IS the engine's required runtime contract
  * (UTC for oracle parity, nanosAsLong for the events table), so it must
  * not drift between surfaces.
  */
object GraftSession {
  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR: WARN-level noise (e.g. WindowExec on the small-feed window
    // tier, which userTransitions only selects under its size threshold)
    // would otherwise drown the bench JSON line
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
