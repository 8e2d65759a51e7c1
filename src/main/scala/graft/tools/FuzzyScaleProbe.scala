package graft.tools

import org.apache.spark.sql.functions._

/** Candidate-volume scaling probe for the round-11 fuzzy-ER family
  * (g49/g51 symmetric-delete tiers, g50 token-set prefix filter): prints
  * the vocabulary sizes, the all-pairs reference, each blocker's
  * candidate count (the monitorable 100 TB cost metric per the FuzzyJoin
  * / TokenSetJoin scaladocs), and the matched pair counts at the given
  * SF dir — the same measure-don't-guess protocol as G11Probe /
  * UboProfile. Run at two sfs and compare ratios: the blockers' claim is
  * that candidates grow with the VOCABULARY's collision structure, not
  * with N², and this prints the numbers that check it.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.FuzzyScaleProbe
  */
object FuzzyScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val part = graft.Tables(spark, sfDir).part

    // g50's exact vocabulary: composite catalog labels
    val labels = part
      .groupBy(concat_ws(" ", col("p_name"), col("p_brand"), col("p_type")).as("label"))
      .agg(min(col("p_partkey")).as("id"))
      .select("id", "label")
      .transform(graft.graph.Materialize.apply)
    val nL = labels.count()
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"g50  [$what took ${(System.nanoTime() - t0) / 1e9}%.1f s]"); r
    }
    val tokCand = timed("candidateCount")(graft.rel.TokenSetJoin.candidateCount(labels, 0.6))
    val tokPairs = timed("selfJoinJaccard")(graft.rel.TokenSetJoin.selfJoinJaccard(labels, 0.6).count())
    println(f"g50  labels=$nL%,d allPairs=${nL * (nL - 1) / 2}%,d " +
      f"prefixCand=$tokCand%,d (x${nL * (nL - 1) / 2.0 / math.max(tokCand, 1)}%.1f below) " +
      f"matchedPairs=$tokPairs%,d")

    // g49/g51's exact vocabulary: distinct part names
    val names = part.groupBy(col("p_name").as("name"))
      .agg(min(col("p_partkey")).as("id"))
      .select("id", "name")
      .transform(graft.graph.Materialize.apply)
    val nN = names.count()
    val c1 = graft.rel.FuzzyJoin.candidateCount(names, 1)
    val p1 = graft.rel.FuzzyJoin.selfJoinLev(names, 1).count()
    val c2 = graft.rel.FuzzyJoin.candidateCount(names, 2)
    val p2 = graft.rel.FuzzyJoin.selfJoinLev(names, 2).count()
    println(f"g49  names=$nN%,d allPairs=${nN * (nN - 1) / 2}%,d " +
      f"lev1Cand=$c1%,d matchedPairs=$p1%,d")
    println(f"g51  lev2Cand=$c2%,d (x${c2.toDouble / math.max(c1, 1)}%.1f the lev1 tier) " +
      f"matchedPairs=$p2%,d")

    // g54's exact linkage inputs (single-sourced via GraphQueries.g54Inputs):
    // abbreviated registry, normalized back, linked against the catalog.
    // The two-table candidate stream is the monitorable metric; all-pairs
    // reference is |L|x|R| (no i<j cut — each side is a distinct collection).
    val (_, normalized, catalog) = graft.graph.GraphQueries.g54Inputs(spark, sfDir)
    val normM = normalized.transform(graft.graph.Materialize.apply)
    val catM = catalog.transform(graft.graph.Materialize.apply)
    val (nRl, nRr) = (normM.count(), catM.count())
    val c54 = timed("g54 candidateCount")(
      graft.rel.TokenSetJoin.candidateCount(normM, catM, 0.6))
    val t54 = System.nanoTime()
    val p54 = graft.rel.TokenSetJoin.joinJaccard(normM, catM, 0.6).count()
    println(f"g54  registry=$nRl%,d catalog=$nRr%,d allPairs=${nRl * nRr}%,d " +
      f"linkCand=$c54%,d (x${nRl * nRr / math.max(c54, 1).toDouble}%.1f below) " +
      f"linkedPairs=$p54%,d wall=${(System.nanoTime() - t54) / 1e9}%.1f s")

    // t13 screening throughput: roster rows screened per second against the
    // broadcast deletion-key index (the stream-side cost model — the key
    // fan-out is |name|+1 keys/row, the index is the watchlist's fan-out).
    val cust = graft.Tables(spark, sfDir).customer
    val roster = cust.select(col("c_custkey").as("id"), col("c_name").as("name"))
      .transform(graft.graph.Materialize.apply)
    val wl = cust.filter(col("c_custkey") % 101 === 0)
      .select(col("c_custkey").as("wid"), col("c_name").as("wname"))
    val nRoster = roster.count()
    val idxRows = wl.select(explode(graft.rel.FuzzyJoin.deletionKeys(col("wname")))).count()
    val tScr = System.nanoTime()
    val hits = graft.stream.Screening.screen(roster, wl).count()
    val scrWall = (System.nanoTime() - tScr) / 1e9
    println(f"t13  roster=$nRoster%,d idxRows=$idxRows%,d hits=$hits%,d " +
      f"wall=$scrWall%.1f s (${nRoster / scrWall}%,.0f rows/s)")

    // g55 scored screening: vocabulary-bound like g50 (5 probes x vocab
    // jaro_winkler evaluations in codegen; the rank window is the shuffle)
    val t55 = System.nanoTime()
    val n55 = graft.SparkEntry.queries("g55_jw_screen_rank")(spark, sfDir).count()
    println(f"g55  rows=$n55%,d wall=${(System.nanoTime() - t55) / 1e9}%.1f s")
    spark.stop()
  }
}
