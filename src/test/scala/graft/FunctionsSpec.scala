package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f)),
    (4L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("cosine_sim: identity, orthogonality, scale-invariance, zero-norm null") {
    GraftFunctions.register(spark)
    val got = vecs.select(col("id"), expr("cosine_sim(a, b)").as("c"))
      .as[(Long, Option[Double])].collect().toMap
    assert(math.abs(got(1L).get - 1.0) < 1e-12)
    assert(math.abs(got(2L).get) < 1e-12)
    assert(math.abs(got(3L).get - 1.0) < 1e-12, "parallel vectors -> 1.0")
    assert(got(4L).isEmpty, "zero norm -> null")
  }

  test("cosine_sim matches the composable fold bit-for-bit on real embeddings") {
    GraftFunctions.register(spark)
    val emb = Tables(spark, sfDir).embeddings.limit(100)
      .select(col("vec_id"), col("embedding").as("a"),
              reverse(col("embedding")).as("b"))
    val both = emb.select(col("vec_id"),
      expr("cosine_sim(a, b)").as("native"),
      (expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)") /
        (sqrt(expr("aggregate(zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")) *
         sqrt(expr("aggregate(zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")))).as("fold"))
      .as[(Long, Double, Double)].collect()
    both.foreach { case (id, n, f) => assert(n == f, s"vec $id: native $n != fold $f") }
  }

  test("hhi registers as a SQL aggregate and matches the closed form") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT g, hhi(q) AS h FROM VALUES (1, 10.0), (1, 10.0), (2, 30.0), (2, 10.0) AS t(g, q) GROUP BY g ORDER BY g")
      .as[(Int, Double)].collect().toMap
    assert(math.abs(got(1) - 0.5) < 1e-12, "two equal players -> HHI 1/2")
    assert(math.abs(got(2) - (900.0 + 100.0) / 1600.0) < 1e-12)
  }

  test("SimHash aggregator equals the 16-parallel-aggregates expression form") {
    GraftFunctions.register(spark)
    val viaAgg = {
      val sim = udaf(graft.functions.SimHashAggregator)
      Tables(spark, sfDir).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        // same token hash l04 uses (poly_hash since round 7)
        .withColumn("h", expr("poly_hash(tok, 0L, 131L)"))
        .groupBy("doc_id").agg(sim(col("h")).as("simhash"))
        .as[(Long, Long)].collect().toMap
    }
    val viaExpr = graft.text.LlmQueries.queries("l04_simhash")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(viaAgg === viaExpr)
  }

  test("two cosine_sim calls in one projection stay on the codegen path") {
    GraftFunctions.register(spark)
    // With literal local names (pre-fix) the second call redefined `i` etc.,
    // Janino threw, and Spark silently fell back to interpreted execution.
    // codegen.fallback=false turns that silent fallback into a test failure.
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = vecs.select(col("id"),
          expr("cosine_sim(a, b)").as("ab"),
          expr("cosine_sim(b, a)").as("ba"))
        .as[(Long, Option[Double], Option[Double])].collect()
        .map { case (k, ab, ba) => k -> ((ab, ba)) }.toMap
      assert(math.abs(got(1L)._1.get - 1.0) < 1e-12)
      assert(got(1L)._1 === got(1L)._2, "cosine is symmetric")
      assert(got(4L)._1.isEmpty && got(4L)._2.isEmpty)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("cosine_sim codegen path agrees with interpreted eval") {
    GraftFunctions.register(spark)
    val withCodegen = vecs.select(expr("cosine_sim(a, b)")).collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = vecs.select(expr("cosine_sim(a, b)")).collect()
      assert(withCodegen.sameElements(interpreted))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("poly_hash equals the composable fold on string and binary, codegen on") {
    GraftFunctions.register(spark)
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // empty tokens excluded: the reference fold's sequence(1, length(t))
      // yields the DESCENDING [1, 0] when length = 0 and would hash two
      // phantom zero bytes; poly_hash('') correctly returns the seed's
      // canonical residue mod 1e9+7 (= the seed itself for library seeds)
      val toks = Tables(spark, sfDir).documents.limit(50)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .filter(length(col("t")) >= 1)
      // two calls in one projection (freshName collision guard) + the
      // interpreted ascii-fold reference on the string path
      val rows = toks.select(
          expr("poly_hash(t, 7L, 31L)").as("native"),
          expr("poly_hash(t, 0L, 131L)").as("native131"),
          expr("aggregate(transform(sequence(1, length(t)), i -> CAST(ascii(substring(t, i, 1)) AS BIGINT)), CAST(7 AS BIGINT), (acc, c) -> (acc * 31 + c) % 1000000007)").as("fold"),
          expr("aggregate(transform(sequence(1, length(t)), i -> CAST(ascii(substring(t, i, 1)) AS BIGINT)), CAST(0 AS BIGINT), (acc, c) -> (acc * 131 + c) % 1000000007)").as("fold131"))
        .as[(Long, Long, Long, Long)].collect()
      rows.foreach { case (n, n131, f, f131) =>
        assert(n === f); assert(n131 === f131)
      }
      // binary input path hashes the same bytes as the string path (ASCII)
      val bin = Tables(spark, sfDir).documents.limit(10)
        .select(expr("poly_hash(CAST(text AS BINARY), 0L, 131L)").as("b"),
                expr("poly_hash(text, 0L, 131L)").as("s"))
        .as[(Long, Long)].collect()
      bin.foreach { case (b, s) => assert(b === s) }
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("poly_hash codegen path agrees with interpreted eval") {
    GraftFunctions.register(spark)
    val docs = Tables(spark, sfDir).documents.limit(20).select(col("text"))
    val withCodegen = docs.select(expr("poly_hash(text, 7L, 31L)")).collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = docs.select(expr("poly_hash(text, 7L, 31L)")).collect()
      assert(withCodegen.sameElements(interpreted))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("poly_hash non-library seeds: canonical residue, codegen/interp agree") {
    // the seed contract (SQL-registered function — any Long is reachable):
    // negative and >= MOD seeds reduce to the canonical non-negative
    // residue before the fold, identically on both execution paths
    GraftFunctions.register(spark)
    val docs = Tables(spark, sfDir).documents.limit(20).select(col("text"))
    val exprs = Seq(
      "poly_hash(text, -5L, 31L)",
      "poly_hash(text, -1000000007L, 31L)",
      "poly_hash(text, 9223372036854775807L, 31L)",
      "poly_hash('', -5L, 31L)")
    val sel = docs.select(exprs.map(e => expr(e)): _*)
    val withCodegen = sel.collect()
    withCodegen.foreach(r => (0 until r.length).foreach { i =>
      val h = r.getLong(i)
      assert(h >= 0 && h < 1000000007L, s"non-canonical residue $h")
    })
    // empty input returns the reduced seed: -5 mod 1e9+7 = 1000000002
    assert(withCodegen.head.getLong(3) === 1000000002L)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(sel.collect().sameElements(withCodegen))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
