package graft

import graft.graph.GraphBuilder
import org.apache.spark.sql.functions._

/** g52 composes four pipelines into one briefing for a seed entity; the
  * oracle hashes the values, so this spec pins the COMPOSITION invariants
  * that a hash can't express as intent: every section present, the owner
  * section rank-truncated, the conflict section cut to pairs implicating
  * a principal owner (not the whole g46 board), and the backward
  * single-seed propagation agreeing with the board-wide forward g03
  * propagation on the seed's column (same paths, same products — the
  * exactness argument for running the cone WITHOUT epsilon).
  */
class EntityDossierSpec extends SparkSpec {
  import spark.implicits._

  private val seed = GraphBuilder.SupplierBase + 1L
  private lazy val dossier = {
    val df = SparkEntry.queries("g52_entity_dossier")(spark, sfDir)
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
  }

  test("all five sections present; owner section rank-truncated to 25") {
    val bySection = dossier.groupBy(_._1)
    assert(bySection.keySet === Set("owner", "name_conflict", "risk_part", "ego_edges", "ego_nodes"))
    assert(bySection("owner").length <= 25 && bySection("owner").nonEmpty)
    assert(bySection("ego_nodes").length === 1)
  }

  test("owner scores equal the forward board-wide propagation's seed column") {
    // backward-from-seed (exact, no epsilon) must dominate the forward
    // epsilon-pruned board propagation: every forward-surviving owner of
    // the seed appears backward with share >= the pruned forward value.
    val fwd = SparkEntry.queries("g03_ubo_exposure")(spark, sfDir)
      .filter(col("supplier") === seed)
      .select(col("owner"), col("exposure")).as[(Long, Double)].collect().toMap
    assert(fwd.nonEmpty)
    val owners = dossier.filter(_._1 == "owner").map(t => t._2 -> t._4).toMap
    val topMin = owners.values.min
    fwd.foreach { case (o, exposure) =>
      owners.get(o).foreach { backShare =>
        assert(backShare >= exposure - 1e-6,
          s"owner $o: backward exact share $backShare below forward pruned $exposure")
      }
      // a forward owner missing from the top-25 must be below its floor
      if (!owners.contains(o))
        assert(exposure <= topMin + 1e-6,
          s"forward owner $o ($exposure) outranks the backward top-25 floor $topMin")
    }
  }

  test("conflict section implicates a principal owner on at least one end") {
    val principals = dossier.filter(_._1 == "owner").map(_._2).toSet
    val conflicts = dossier.filter(_._1 == "name_conflict")
    assert(conflicts.nonEmpty)
    // key is the a-side; the detail carries both names — check the a-side
    // OR b-side resolves to a principal via the name
    val names = Tables(spark, sfDir).customer
      .select((lit(GraphBuilder.CustomerBase) + col("c_custkey")).as("id"), col("c_name"))
      .as[(Long, String)].collect().toMap
    val principalNames = principals.map(names)
    conflicts.foreach { case (_, key, detail, _) =>
      val Array(na, nb) = detail.split(" ~ ", 2)
      assert(principals.contains(key) || principalNames.contains(na) || principalNames.contains(nb),
        s"conflict row ($key, $detail) implicates no principal owner")
    }
  }

  test("g53 batched cones agree with g52's single-seed cone on the shared seed") {
    // the watchlist batching claim: a k-row init must produce, for each
    // seed, EXACTLY the single-seed propagation's numbers — no cross-seed
    // bleed through the shared (owner, entity) state. g52's owner section
    // is the single-seed top-25; g53's supplier-1 rows must equal its
    // first 5 under the same (share desc, holder asc) order.
    val batched = SparkEntry.queries("g53_watchlist_dossiers")(spark, sfDir)
      .filter(col("supplier") === seed)
      .orderBy(col("rnk"))
      .collect().map(r => (r.getAs[Long]("holder"), r.getAs[Double]("share6")))
    assert(batched.length === 5)
    val single = dossier.filter(_._1 == "owner")
      .map(t => (t._2, t._4)).sortBy { case (o, sh) => (-sh, o) }.take(5)
    assert(batched.toSeq === single.toSeq,
      s"batched cone diverged from the single-seed cone:\n$batched\nvs\n${single.toSeq}")
  }

  test("risk parts are the seed's own parts, flags follow g16 semantics") {
    val seedParts = graph.GraphBuilder.edges(Tables(spark, sfDir))
      .filter(col("rel_type") === "SUPPLIED_BY" && col("dst") === seed)
      .select(col("src")).as[Long].collect().toSet
    val risk = dossier.filter(_._1 == "risk_part")
    assert(risk.nonEmpty)
    risk.foreach { case (_, key, detail, score) =>
      assert(seedParts.contains(key), s"risk part $key not supplied by the seed")
      assert(score >= 2.5 - 1e-9)
      if (score >= 3.0) assert(detail == "dominant_supplier,highly_concentrated")
      else assert(detail == "dominant_supplier")
    }
  }
}
