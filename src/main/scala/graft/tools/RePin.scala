package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.functions.col

/** Mechanized quiet-median re-pin (VERDICT r12 #8): pins have drifted
  * broadly twice (rounds 9 and 12) and each adjudication was a
  * hand-transcribed comment in Bench.scala. This tool IS the protocol:
  *
  *   runMain graft.tools.RePin sweep [dir]   — ONE fresh-JVM sweep of the
  *     pinned headline set (warmup rep + 3 timed reps per query, the full
  *     HostProbes drain before each query, cheap io/dirty check between
  *     reps), appended as one JSON session file under `dir`
  *     (default /tmp/graft_repin). Run it from ≥2 independent JVMs,
  *     ideally alongside a Bench min-of-2 on the same day — the
  *     PIN-PROVENANCE RULE (Bench.scala) requires cross-session support.
  *
  *   runMain graft.tools.RePin emit [dir]    — merge every session file:
  *     per query, print each session's median, the cross-session MIDDLE
  *     (median of session medians — the drift protocol's pin), the spread
  *     factor, and a ready-to-paste `quietMediansSec` block, plus one
  *     provenance JSON line carrying every reading. Refuses to emit from
  *     a single session (a pin only one window ever produced erodes the
  *     band from the false-escalation side).
  *
  * The sweep also records the host calibration spin and probe readings so
  * the provenance shows the sessions were comparable (a sweep taken on a
  * slow-delivery window is visible in its calib_ms, not silently folded
  * into the pin).
  */
object RePin {
  private def calibrate(): Long = {
    var x = 0x9E3779B97F4A7C15L
    val t0 = System.nanoTime()
    var i = 0
    while (i < 40000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    if (x == 42L) print("")
    (System.nanoTime() - t0) / 1000000L
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("sweep")
    val dir = new java.io.File(args.lift(1).getOrElse("/tmp/graft_repin"))
    dir.mkdirs()
    mode match {
      case "sweep" => sweep(dir)
      case "emit" => emit(dir)
      case other => sys.error(s"unknown mode '$other' (sweep|emit)")
    }
  }

  private def sweep(dir: java.io.File): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    calibrate(); calibrate() // JIT-warm
    def drain(): Unit =
      if (!graft.HostProbes.awaitQuiet(System.nanoTime() + 180L * 1000000000L))
        System.err.println("[repin] drain budget expired — next timing may be contended")
    val readings = graft.Bench.headline.map { name =>
      drain()
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val times = (1 to 3).map { _ =>
        if (!graft.HostProbes.ioQuiet()) drain()
        once()
      }.sorted
      val calib = calibrate()
      println(f"[repin] $name%-28s median ${times(1)}%.3f (min ${times.head}%.3f max ${times.last}%.3f) calib ${calib}ms")
      (name, times, calib)
    }
    val sessionId = java.util.UUID.randomUUID().toString.take(8)
    val ext = graft.HostProbes.externalBusyCores(2000)
    val json = readings.map { case (n, ts, calib) =>
      s""""$n":{"reps":[${ts.map(t => f"$t%.3f").mkString(",")}],"median":${f"${ts(1)}%.3f"},"calib_ms":$calib}"""
    }.mkString(
      s"""{"session":"$sessionId","epoch_ms":${System.currentTimeMillis()},"sf":"$sfDir","cpus":$cpus,"external_cpu":$ext,"queries":{""",
      ",", "}}")
    val out = new java.io.File(dir, s"repin_${System.currentTimeMillis()}_$sessionId.json")
    val w = new java.io.PrintWriter(out)
    try w.println(json) finally w.close()
    println(s"[repin] session $sessionId written to $out — run again from a fresh JVM, then 'emit'")
    spark.stop()
  }

  private def emit(dir: java.io.File): Unit = {
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("repin_")).sortBy(_.getName)
    require(files.length >= 2,
      s"pin-provenance rule: need >=2 independent sessions, found ${files.length} in $dir")
    // tiny hand parser (no JSON lib on the classpath by design): pull
    // "name":{"reps":[..],"median":X,...} pairs per session
    val medianRe = """"([a-z0-9_]+)":\{"reps":\[[^\]]*\],"median":([0-9.]+)""".r
    val sessions = files.map { f =>
      val txt = scala.io.Source.fromFile(f).mkString
      f.getName -> medianRe.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    println(s"[repin] merging ${sessions.length} sessions: ${files.map(_.getName).mkString(", ")}")
    val pins = graft.Bench.headline.flatMap { q =>
      val meds = sessions.flatMap(_._2.get(q)).sorted
      if (meds.isEmpty) { println(f"[repin] $q%-28s NO READINGS"); None }
      else {
        val middle = meds(meds.length / 2)
        val spread = if (meds.head > 0) meds.last / meds.head else Double.NaN
        println(f"[repin] $q%-28s sessions ${meds.map(m => f"$m%.2f").mkString("/")} -> middle $middle%.2f (spread ${spread}%.2fx)")
        Some(q -> middle)
      }
    }
    println("\n// paste into Bench.quietMediansSec (provenance: the session files above)")
    pins.grouped(2).foreach { pair =>
      println(pair.map { case (q, m) => f""""$q" -> $m%.2f""" }.mkString("    ", ", ", ","))
    }
    val prov = sessions.map { case (f, m) =>
      s""""$f":{${m.map { case (q, v) => s""""$q":$v""" }.mkString(",")}}"""
    }.mkString("{\"sessions\":{", ",", "},\"pins\":{" +
      pins.map { case (q, m) => f""""$q":$m%.2f""" }.mkString(",") + "}}")
    println(s"\n[repin] provenance JSON:\n$prov")
  }
}
