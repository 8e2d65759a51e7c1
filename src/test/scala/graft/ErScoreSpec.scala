package graft

import org.apache.spark.sql.functions._

/** Pins ErScore's two contracts a hash can't argue from: (1) the blocker
  * UNION is genuinely wider than either blocker alone (one-sided shapes
  * each blocker must catch where the other is blind); (2) FUSION is
  * load-bearing — a pair below EVERY single matcher's operating point
  * still ranks its true match first, above a review threshold, on the
  * fused score (the Fellegi–Sunter independent-failure argument in
  * ErScore's scaladoc, demonstrated numerically).
  */
class ErScoreSpec extends SparkSpec {
  import spark.implicits._

  private val pack = rel.TokenSetJoin.businessAbbrev

  private def queue(reg: Seq[(Long, String)], cat: Seq[(Long, String)],
                    block: Double, topK: Int = 3) = {
    val r = reg.toDF("id", "raw")
      .withColumn("norm", rel.TokenSetJoin.mapTokens(col("raw"), pack))
    rel.ErScore.screeningQueue(r, cat.toDF("id", "label"), block, topK = topK)
  }

  test("blocker union is wider than either blocker alone") {
    val cat = Seq(1L -> "acme", 2L -> "acme beta holdings")
    val reg = Seq(
      10L -> "acmee",              // lev 1 of 'acme', token-Jaccard 0 — ONLY the deletion-key blocker can see it
      11L -> "holdings beta acme") // token reorder: Jaccard 1, lev 14 — ONLY the prefix blocker can see it
    val out = queue(reg, cat, block = 0.5)
      .select("registry_id", "catalog_label", "rnk").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out.contains((10L, "acme")),
      "single-token typo pair lost — the lev blocker leg is not reaching the union")
    assert(out.contains((11L, "acme beta holdings")),
      "reordered multi-word pair lost — the prefix-filter leg is not reaching the union")
    // and the blind spots are real: each pair is invisible to the OTHER blocker
    assert(rel.TokenSetJoin.joinJaccard(
        Seq(10L -> "acmee").toDF("id", "label"), Seq(1L -> "acme").toDF("id", "label"), 0.1)
      .count() === 0L, "token blocker unexpectedly sees the zero-overlap typo pair")
    assert(rel.FuzzyJoin.joinLev(
        Seq(11L -> "holdings beta acme").toDF("id", "name"),
        Seq(2L -> "acme beta holdings").toDF("id", "name"), 2)
      .count() === 0L, "lev blocker unexpectedly sees the reordered pair")
  }

  test("fusion is load-bearing: a pair below every single matcher still ranks first") {
    // reorder + abbreviation + two out-of-pack typos: token-Jaccard 3/7 ≈
    // 0.43 (< the 0.6 graded token-ER point), lev far beyond the ≤2 tiers,
    // Jaro–Winkler unboosted (fronts differ) — EVERY matcher alone rejects
    // or under-ranks it; the fused sum still puts the true label at rnk 1
    val cat = Seq(
      1L -> "acme global holdings group ventures",
      2L -> "acme global shipping group ventures",
      3L -> "zeta global holdings group ventures")
    val reg = Seq(10L -> "hldgs acme global gruop vntrs")
    val rows = queue(reg, cat, block = 0.4).collect()
    val top = rows.find(r => r.getAs[Long]("rnk") == 1L).get
    assert(top.getAs[String]("catalog_label") === "acme global holdings group ventures")
    // each component alone sits below its matcher's operating point…
    assert(top.getAs[Double]("jacc6") < 0.6, "fixture drifted: Jaccard no longer sub-threshold")
    val lev = Seq(("hldgs acme global gruop vntrs", top.getAs[String]("catalog_label")))
      .toDF("a", "b").select(levenshtein(col("a"), col("b"))).head.getInt(0)
    assert(lev > 2, "fixture drifted: lev tier would catch this pair")
    // …while the fused score clears a review threshold with margin
    assert(top.getAs[Double]("score6") > 0.55,
      s"fused score ${top.getAs[Double]("score6")} no longer separates the true match")
    // and fusion's arithmetic is exactly the documented pack over rounded
    // components — recomputed here in the same integer micro-space
    def ppm(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val expect = ((450000L * ppm(top.getAs[Double]("jacc6"))
        + 350000L * ppm(top.getAs[Double]("jw6"))
        + 200000L * ppm(top.getAs[Double]("lev_sim6")) + 500000L) / 1000000L) / 1e6
    assert(math.abs(top.getAs[Double]("score6") - expect) < 1e-12)
  }

  test("queue shape: topK per registry record, deterministic rank order") {
    val cat = (1L to 6L).map(i => i -> s"acme unit $i")
    val reg = Seq(10L -> "acme unit 1")
    val rows = queue(reg, cat, block = 0.4, topK = 3).orderBy("rnk").collect()
    assert(rows.length === 3, "topK truncation missing")
    assert(rows.map(_.getAs[Long]("rnk")).toSeq === Seq(1L, 2L, 3L))
    // scores non-increasing; ties broken by catalog label ascending
    val scores = rows.map(_.getAs[Double]("score6"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.head.getAs[String]("catalog_label") === "acme unit 1")
  }
}
