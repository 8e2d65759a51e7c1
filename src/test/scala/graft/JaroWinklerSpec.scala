package graft

import graft.functions.StringSimilarity
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** functions/JaroWinkler: semantics pinned to the DuckDB oracle's
  * `jaro_winkler_similarity` (the values below are DuckDB 1.0 outputs,
  * probed directly), plus interpreted≡codegen and codegen-residency.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    StringSimilarity.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("pinned DuckDB values: textbook pairs and edge semantics") {
    val pinned = Seq(
      // classic Winkler pairs
      ("martha", "marhta", 0.9611111111111111),   // prefix 3, 1 transposition
      ("DWAYNE", "DUANE", 0.8400000000000001),    // prefix 1
      // boost threshold is STRICT jaro > 0.7: jaro here is exactly 0.5
      // with a 2-char common prefix — DuckDB does NOT boost
      ("abcdefgh", "abxxxxxx", 0.5),
      // prefix cap at 4: 6 common chars, boost uses l=4
      ("abcdefghij", "abcdefxxxx", 0.8400000000000001),
      // above threshold but zero common prefix: boost is a no-op
      ("CRATE", "TRACE", 0.7333333333333334),
      // integer-halved transpositions: 4 matches all out of order -> t=2
      ("abab", "baba", 0.8333333333333334),
      // window max(len/2-1, 0) = 0 on 2-char strings: no cross match
      ("ab", "ba", 0.0),
      // DuckDB returns 0 for empty inputs (m=0 path), including ''~''
      ("", "", 0.0), ("a", "", 0.0), ("", "abc", 0.0),
      ("a", "a", 1.0), ("a", "b", 0.0))
    pinned.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw('$a','$b') = ${jw(a, b)}, want $want")
    }
  }

  test("integer transposition halving: odd mismatch counts floor") {
    // fuzz-derived discriminator pair (DuckDB jaro 0.5833...): under
    // FLOAT halving this pair reads 0.5416... — the variant 10% of random
    // pairs disagree on. Pinned so a refactor cannot silently flip it.
    assert(math.abs(jw("ecbebbdb", "bedcaacd") - 0.5833333333333334) < 1e-12)
    assert(math.abs(jw("eadcaad", "bdbdcaddd") - 0.5886243386243386) < 1e-12)
  }

  test("properties: symmetry, range, identity") {
    val rnd = new scala.util.Random(11)
    def word() = (0 until rnd.nextInt(13)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    (1 to 2000).foreach { _ =>
      val (a, b) = (word(), word())
      val f = jw(a, b)
      assert(f == jw(b, a), s"asymmetric on ('$a','$b')")
      assert(f >= 0.0 && f <= 1.0)
      if (a.nonEmpty) assert(jw(a, a) == 1.0)
    }
  }

  test("codegen path agrees with the interpreted kernel and stays in a codegen span") {
    // NB a local Seq.toDF would be CONSTANT-FOLDED by ConvertToLocalRelation
    // (interpreted eval at optimize time, nothing codegen'd) — the pairs
    // must come off a real scan for this test to exercise doGenCode.
    graft.functions.GraftFunctions.register(spark)
    val df = Tables(spark, sfDir).customer
      .select(col("c_name").as("a"), col("c_mktsegment").as("b"))
      .withColumn("jw", expr("jaro_winkler(a, b)"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.length > 100)
    got.foreach { case (a, b, v) =>
      assert(v == jw(a, b), s"codegen/interpreted drift on ('$a','$b')")
    }
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(_.contains("jaro_winkler")).get
    assert("""\*\(\d+\)""".r.findFirstIn(line).isDefined,
      s"jaro_winkler projection not codegen'd: $line")
  }
}
