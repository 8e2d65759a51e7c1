package graft

/** 100 TB robustness: on a real pipeline, an upstream filter (a date
  * partition, a language gate, a tenant predicate) routinely matches ZERO
  * rows for some slice. Every graded operator must degrade to an empty (or
  * schema-only) result — never throw — or a nightly 1000-executor DAG dies
  * on its emptiest slice. This sweep runs the ENTIRE registry against a
  * zero-row copy of the full star schema and reports every query that
  * throws, in one assertion.
  */
class EmptyInputSpec extends SparkSpec {

  /** Zero-row tables with the exact driver schemas (read sf0.001, limit 0). */
  lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      spark.read.parquet(s"$sfDir/$n.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("every graded query tolerates zero-row input") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).collect(); None }
        catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse("").linesIterator
              .take(1).mkString.take(160)
            Some(s"$name -> ${e.getClass.getSimpleName}: $msg")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on empty input:\n  " +
        failures.mkString("\n  "))
  }
}
