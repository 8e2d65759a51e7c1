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

  test("fuzzy: a near-dup crossing the eval boundary flags with the right witness; eval-eval near-dups don't leak through") {
    val base = (1 to 20).map(i => s"w$i")
    val docs = Seq(
      // corpus doc 1 and a paraphrase-level eval twin (2 words changed)
      (1L, base.mkString(" ")),
      (50L, base.updated(4, "CHANGED").updated(12, "ALSO").mkString(" ")),
      // two eval docs that are near-dups OF EACH OTHER but of nothing in
      // the corpus — the cross-slice filter must report both clean
      (100L, (1 to 20).map(i => s"q$i").mkString(" ")),
      (150L, (1 to 20).map(i => s"q$i").updated(9, "X").mkString(" ")),
      // unrelated corpus doc
      (2L, (1 to 20).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("deconf").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("l46_decontaminate_fuzzy")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got.map(_._1) === Seq(50L, 100L, 150L))
    val hit = got.head
    assert(hit._2 === 1L && hit._4 === 1L, s"eval 50 must match corpus 1 once: $hit")
    assert(hit._3 > 0.2 && hit._3 < 1.0, s"paraphrase jaccard should be fuzzy, not exact: $hit")
    assert(got(1) === ((100L, 0L, 0.0, -1L)), s"eval-eval near-dup leaked: ${got(1)}")
    assert(got(2) === ((150L, 0L, 0.0, -1L)), s"eval-eval near-dup leaked: ${got(2)}")
  }

  test("semantic: best neighbor and threshold count match a driver-side brute force") {
    val rows = SparkEntry.queries("l47_decontaminate_semantic")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(rows.nonEmpty)
    val vecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
      .as[(Long, Seq[Double])].collect().map { case (i, v) => (i, v.toArray) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val evs = vecs.filter(_._1 % 50 == 0).toMap
    val corp = vecs.filter(_._1 % 50 != 0)
    rows.foreach { case (eid, nNear, bestCos, bestDoc) =>
      val scored = corp.map { case (cid, cv) => (cos(cv, evs(eid)), cid) }
      val (expCos, expDoc) = scored.maxBy { case (c, cid) => (c, -cid) }
      assert(math.abs(bestCos - expCos) < 1e-9 && bestDoc === expDoc,
        s"eval $eid: best ($bestCos, $bestDoc) != brute force ($expCos, $expDoc)")
      assert(nNear === scored.count(_._1 >= 0.99).toLong,
        s"eval $eid: near-identical count mismatch")
    }
  }
}
