package graft

import graft.rel.TokenSetJoin
import org.apache.spark.sql.functions._

/** The prefix-filter token-set join must (a) RECALL multi-word matches the
  * character-level lev<=1 blocking cannot see — whole-word REORDERS and
  * one-word substitutions/abbreviations — (b) reject low-overlap pairs,
  * and (c) PRUNE: blocking on each record's rarest prefix tokens must
  * admit fewer candidates than blocking on every token, which in turn is
  * below all-pairs. Recall is proven lossless by set-equality against a
  * brute-force crossJoin Jaccard on the same corpus (test scale only —
  * the brute force is the oracle here, never the shipped plan).
  */
class TokenSetJoinSpec extends SparkSpec {
  import spark.implicits._

  private def catalogLabels = Tables(spark, sfDir).part
    .groupBy(concat_ws(" ", col("p_name"), col("p_brand"), col("p_type")).as("label"))
    .agg(min(col("p_partkey")).as("id"))
    .select("id", "label")

  test("planted reorder and abbreviation variants: recall at jaccard>=0.6") {
    val ents = Seq(
      1L -> "acme global trading ltd",
      2L -> "global acme trading ltd",     // pure reorder: J = 1.0, lev = 10
      3L -> "acme global trading limited", // abbreviation variant: J = 3/5
      4L -> "acme global shipping ltd",    // one word swapped: J = 3/5
      5L -> "acme pacific shipping corp",  // J(1,5) = 1/7 — reject
      6L -> "zenith holdings plc"          // far
    ).toDF("id", "label")
    val pairs = TokenSetJoin.selfJoinJaccard(ents, 0.6)
      .filter(col("id_a") === 1L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (1L, 4L)),
      s"expected the reorder + two one-word variants of id 1, got $pairs")
    // the reorder pair is invisible to character-level lev<=1 blocking
    val lev = graft.rel.FuzzyJoin.selfJoinLev1(
      ents.withColumnRenamed("label", "name"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!lev.contains((1L, 2L)), "lev<=1 should NOT see the whole-word reorder")
  }

  test("jaccard values and n_common are exact") {
    val ents = Seq(
      1L -> "alpha beta gamma delta",
      2L -> "beta gamma delta epsilon" // common 3, union 5
    ).toDF("id", "label")
    val r = TokenSetJoin.selfJoinJaccard(ents, 0.5).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_common") === 3L)
    assert(r.head.getAs[Double]("jacc") === 0.6)
  }

  test("prefix blocking is lossless vs brute force on the catalog corpus") {
    val ents = catalogLabels
    val blocked = TokenSetJoin.selfJoinJaccard(ents, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val toks = TokenSetJoin.tokens(col("label"))
    val e2 = ents.select(col("id").as("id_b"), col("label").as("label_b"))
    val tb = TokenSetJoin.tokens(col("label_b"))
    val common = size(array_intersect(toks, tb)).cast("long")
    val brute = ents.crossJoin(e2)
      .filter(col("id") < col("id_b") &&
        round(common / (size(toks) + size(tb) - common), 6) >= 0.6)
      .select(col("id"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(blocked.nonEmpty && blocked === brute)
  }

  test("the prefix prunes: below any-token blocking, well below all-pairs") {
    val ents = catalogLabels
    val n = ents.count()
    val allPairs = n * (n - 1) / 2
    val prefixCands = TokenSetJoin.candidateCount(ents, 0.6)
    // any-shared-token blocking (no prefix filter) for comparison
    val tok = ents.select(col("id"), explode(TokenSetJoin.tokens(col("label"))).as("tok"))
    val anyToken = tok.select(col("id").as("id_a"), col("tok"))
      .join(tok.select(col("id").as("id_b"), col("tok")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().count()
    assert(prefixCands < anyToken,
      s"prefix filter admitted no fewer candidates than any-token blocking: $prefixCands vs $anyToken")
    assert(prefixCands * 2 < allPairs,
      s"blocker did not prune: $prefixCands vs $allPairs all-pairs")
    info(s"candidates prefix: $prefixCands, any-token: $anyToken, all-pairs: $allPairs")
  }

  test("tokens and prefixLen: dedup, empty safety, formula") {
    val t = Seq("a b b  c", "", "solo").toDF("label")
      .select(col("label"), TokenSetJoin.tokens(col("label")).as("ts"))
      .as[(String, Seq[String])].collect().toMap
    assert(t("a b b  c") === Seq("a", "b", "c")) // dup token and double space dropped
    assert(t("") === Seq.empty)
    assert(t("solo") === Seq("solo"))
    val p = Seq((4, 0.6), (4, 0.5), (5, 0.8), (1, 0.6)).toDF("sz", "t")
    val got = p.select(col("sz"), col("t"),
        TokenSetJoin.prefixLen(col("sz"), 0.6).as("p06"))
      .filter(col("t") === 0.6).select("sz", "p06").as[(Int, Long)].collect().toMap
    assert(got(4) === 2L) // 4 - ceil(2.4) + 1
    assert(got(1) === 1L) // singleton always blocks on its one token
  }

  test("length filter kills short×long candidates, keeps every true pair") {
    // heterogeneous-length corpus — the shape the catalog fixture lacks
    // (uniform 8-10 token labels make every pair size-compatible at 0.6,
    // so the filter measures as a no-op there; here it must bite).
    // 'rareword' has df 2 — it IS ids 1 and 2's rarest prefix token, so
    // the prefix filter emits the (1,2) candidate — but J(1,2) can never
    // reach 0.6 across sizes 3 vs 15 (max 3/15): the length band drops
    // exactly that candidate before the rerank, and nothing else.
    val ws = (1 to 14).map(i => s"w$i").mkString(" ")
    val ents = Seq(
      1L -> "rareword a b",          //  3 tokens
      2L -> s"rareword $ws",         // 15 tokens — candidate with 1 only via rareword
      3L -> "a b c",                 //  3 tokens
      4L -> "a b c",                 //  duplicate of 3: J = 1.0
      5L -> s"$ws p q",              // 16 tokens, J(2,5) = 14/17
      6L -> s"$ws r s"               // 16 tokens, J(5,6) = 14/18
    ).toDF("id", "label")
    val pairs = TokenSetJoin.selfJoinJaccard(ents, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((3L, 4L), (2L, 5L), (2L, 6L), (5L, 6L)), s"got $pairs")
    // without the band the candidate set is 7 (this 6 plus the (1,2)
    // short×long collision on rareword) — the band removes exactly it
    val cands = TokenSetJoin.candidateCount(ents, 0.6)
    assert(cands === 6L,
      s"length band should drop the short×long rareword candidate (7 -> 6), got $cands")
  }

  test("abbreviation variants resolve ONLY after mapTokens normalization") {
    // the README.md:15 class raw token equality cannot see: registered
    // forms abbreviate ("st"/"street", "co ltd"/"company limited")
    val registry = Seq(
      10L -> "12 main st",
      11L -> "acme co ltd",
      12L -> "9 elm blvd ste 4"
    ).toDF("id", "label")
    val canon = Seq(
      1L -> "12 main street",
      2L -> "acme company limited",
      3L -> "9 elm boulevard suite 4",
      4L -> "14 oak avenue"
    ).toDF("id", "label")
    // raw: "12 main st" vs "12 main street" shares 2 of 4 -> J = 0.5
    val raw = TokenSetJoin.joinJaccard(registry, canon, 0.6)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(raw === Set.empty[(Long, Long)],
      s"raw token equality should NOT match abbreviated forms, got $raw")
    val norm = registry.select(col("id"),
      TokenSetJoin.mapTokens(col("label"), TokenSetJoin.businessAbbrev).as("label"))
    val matched = TokenSetJoin.joinJaccard(norm, canon, 0.6)
      .select("id_l", "id_r", "jacc").as[(Long, Long, Double)].collect().toSet
    assert(matched === Set((10L, 1L, 1.0), (11L, 2L, 1.0), (12L, 3L, 1.0)),
      s"each normalized registry record should hit exactly its canonical, got $matched")
  }

  test("mapTokens: order preserved, case-sensitive, unknown tokens pass through") {
    val m = Map("st" -> "street", "LG" -> "LARGE")
    val got = Seq("12 st lg LG st", "", "plain").toDF("label")
      .select(col("label"), TokenSetJoin.mapTokens(col("label"), m).as("n"))
      .as[(String, String)].collect().toMap
    assert(got("12 st lg LG st") === "12 street lg LARGE street")
    assert(got("") === "")
    assert(got("plain") === "plain")
  }

  test("two-table linkage is lossless vs brute force on the catalog corpus") {
    // the g54 shape: an abbreviated registry view normalized back, linked
    // against the canonical catalog; blocked result must equal the
    // brute-force cross-join Jaccard exactly (test-scale oracle only)
    val canon = catalogLabels
    val fwd = Map("STANDARD" -> "STD", "ECONOMY" -> "ECON", "ring" -> "rg",
      "bolt" -> "blt")
    val registry = canon.select((col("id") + 100000000L).as("id"),
      TokenSetJoin.mapTokens(col("label"), fwd).as("raw"))
    val norm = registry.select(col("id"),
      TokenSetJoin.mapTokens(col("raw"), fwd.map(_.swap)).as("label"))
    val blocked = TokenSetJoin.joinJaccard(norm, canon, 0.6)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    val tl = TokenSetJoin.tokens(col("label_l"))
    val tr = TokenSetJoin.tokens(col("label_r"))
    val common = size(array_intersect(tl, tr)).cast("long")
    val brute = norm.select(col("id").as("id_l"), col("label").as("label_l"))
      .crossJoin(canon.select(col("id").as("id_r"), col("label").as("label_r")))
      .filter(round(common / (size(tl) + size(tr) - common), 6) >= 0.6)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(blocked.nonEmpty && blocked === brute)
    // and the blocker prunes: candidates well below the full cross product
    val n = canon.count()
    val cands = TokenSetJoin.candidateCount(norm, canon, 0.6)
    assert(cands * 2 < n * n,
      s"RS blocker did not prune: $cands candidates vs ${n * n} cross product")
    info(s"RS candidates: $cands vs cross product ${n * n}")
  }
}
