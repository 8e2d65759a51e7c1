package graft

import org.apache.spark.sql.functions._

/** l45 semantics on a hand fixture (the graded hash checks the real
  * corpus): an exact 13-token window is contamination, a 12-token overlap
  * is not, sub-13-token eval docs report clean zeros, and duplicate
  * contaminators count once each.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("13-gram collisions flag; 12-gram overlaps and short docs don't; dup contaminators both count") {
    val w = (1 to 20).map(i => s"w$i")
    val window13 = w.slice(2, 15) // w3..w15, 13 tokens of doc 1
    val docs = Seq(
      (1L, w.mkString(" ")),                                    // corpus
      (2L, w.mkString(" ")),                                    // corpus, exact dup of 1
      (3L, (1 to 15).map(i => s"x$i").mkString(" ")),           // corpus, unrelated
      (50L, (window13 :+ "tail1").mkString(" ")),               // eval: exact 13-window of 1 AND 2
      (100L, (w.slice(2, 14) ++ Seq("zzz", "yyy")).mkString(" ")), // eval: only a 12-token run
      (150L, "just a few tokens here"),                         // eval: < 13 tokens
      (200L, (1 to 14).map(i => s"q$i").mkString(" ")))         // eval: clean
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("decon").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("l45_decontaminate")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSeq
    // doc 50 has 14 tokens => windows (w3..w15) and (w4..w15 tail1); only
    // the first exists in the corpus, in BOTH dup docs => 1 shared gram,
    // 2 contaminating docs, sample = min id
    assert(got === Seq(
      (50L, 2L, 1L, 1L, true),
      (100L, 0L, 0L, -1L, false),
      (150L, 0L, 0L, -1L, false),
      (200L, 0L, 0L, -1L, false)))
  }
}
