package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions.{array_distinct, broadcast, col, collect_list,
  count, lit, max, size, struct, unix_micros, when}

/** Plan-shape regression tests: the properties PLANS.md documents, enforced.
  * A future change that silently drops a pushdown, un-broadcasts a dim, or
  * degrades top-k to a global sort fails here, not in the bench.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(FormattedMode)

  test("r02: every scan-eligible predicate reaches PushedFilters") {
    val p = plan("r02_filter")
    assert(p.contains("PushedFilters"))
    Seq("GreaterThanOrEqual(l_quantity,10.0)", "EqualTo(l_returnflag,R)",
        "In(l_suppkey", "StringStartsWith(l_returnflag,R)")
      .foreach(f => assert(p.contains(f), s"missing pushed filter $f"))
  }

  test("r01: scan reads only the projected columns") {
    val p = plan("r01_projection")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_linenumber")
      && read.contains("l_extendedprice") && read.contains("l_discount"))
    assert(!read.contains("l_shipdate") && !read.contains("l_comment"),
      s"scan reads more than the projection needs: $read")
  }

  test("r03: dimension side plans as a broadcast hash join") {
    assert(plan("r03_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("r16: orderBy.limit plans TakeOrderedAndProject, not a global sort") {
    assert(plan("r16_topk").contains("TakeOrderedAndProject"))
  }

  test("r09: aggregation runs partial then final around one exchange") {
    val p = plan("r09_agg")
    assert(p.contains("HashAggregate"))
    assert("partial".r.findFirstIn(p.toLowerCase).isDefined,
      "no partial (map-side) aggregate in plan")
  }

  test("g12: temporal validity predicate pushes into the scans") {
    val p = plan("g12_snapshot")
    // the snapshot timestamp must appear in scan-level pushed filters, not
    // only in post-scan Filter nodes
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThanOrEqual(o_orderdate"),
      "orderdate validity bound not pushed to the orders scan")
  }

  test("l05 native: cosine_sim runs inside a WholeStageCodegen span") {
    // AQE annotates codegen stages only on the FINAL executed plan — run the
    // query, then inspect (`*(n)` markers in the plan string)
    val df = SparkEntry.queries("l05_cosine_topk_native")(spark, sfDir)
    df.collect() // finalizes THIS QueryExecution's adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), "plan did not finalize")
    val projLine = p.linesIterator.find(_.contains("cosine_sim")).get
    assert("""\*\(\d+\)""".r.findFirstIn(projLine).isDefined,
      s"cosine_sim projection not codegen'd: $projLine")
  }

  test("kHop supernode shape: AQE skew-splits the frontier join (saltedJoin is the fallback)") {
    // SCALE.md's supernode claim, pinned: when a BFS frontier concentrates
    // on one hub key (the "entity with 10^4 edges" case), the frontier ⋈
    // edges shuffle join must come out of AQE with its hot partition SPLIT —
    // nodeName carries "skew=true". The negative control below proves this
    // assertion actually detects the config (it fails when skew handling is
    // off), and rel/Skew.saltedJoin (graded as r36) remains the explicit
    // fallback for hubs so hot that even split partitions bottleneck.
    val confKeys = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confKeys.map(k => k -> spark.conf.getOption(k))
    // force the shuffle-join path: a broadcast join has no partitions to skew
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    def hubJoinPlan(): String = {
      // frontier: 99% of rows sit on hub key 0; edges: 2 neighbors/key
      val frontier = spark.range(150000).select(
        when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id") % 1000).as("src"),
        col("id").as("walk"))
      val edges = spark.range(2000).select(
        (col("id") % 1000).as("src"), (col("id") + 7).as("dst"))
      // aggregate over walk so column pruning can't strip the payload —
      // a key-only hub partition compresses below any skew threshold
      val agg = frontier.join(edges, "src").groupBy("dst")
        .agg(org.apache.spark.sql.functions.sum("walk").as("w"))
      agg.collect() // finalizes THIS QueryExecution's adaptive plan
      agg.queryExecution.executedPlan.toString
    }
    // Derive the detector thresholds from the shuffle THIS fixture actually
    // writes (measured via a dry run with the skew rule off) instead of
    // hand-tuned byte constants, which rot when compression or row width
    // changes (ADVICE r7). With 99% of frontier rows on the hub key, the
    // hub partition carries ~all of the join's shuffle bytes — a threshold
    // of total/20 sits an order of magnitude below the hub and an order
    // above the non-hub partitions regardless of codec or layout.
    val written = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      hubJoinPlan()
      // listener events are delivered async — wait until the counter settles
      var prev = -1L
      var settles = 0
      while (settles < 3) {
        Thread.sleep(100)
        val now = written.get
        if (now == prev) settles += 1 else { settles = 0; prev = now }
      }
      val totalShuffleBytes = written.get
      assert(totalShuffleBytes > 0, "dry run measured no shuffle writes")
      val thresholdBytes = math.max(1024L, totalShuffleBytes / 20)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        thresholdBytes.toString)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        math.max(512L, thresholdBytes / 2).toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val p = hubJoinPlan()
      assert(p.contains("isFinalPlan=true"), "plan did not finalize")
      assert(p.contains("skew=true"),
        s"AQE did not mark the hub join skewed (threshold $thresholdBytes of $totalShuffleBytes measured bytes):\n$p")
      // negative control: with the skew-join rule off the marker must vanish
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      assert(!hubJoinPlan().contains("skew=true"),
        "control failed: skew marker present with skewJoin disabled — assertion is vacuous")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("r07b: custom as-of exec gets exchanges and sorts from EnsureRequirements") {
    val p = plan("r07b_asof_join_custom")
    assert(p.contains("AsOfJoin"))
    assert("""Exchange \(\d+\)""".r.findAllIn(p).size >= 2,
      "both children must exchange")
    assert(p.contains("hashpartitioning"), "exchanges must be hash-partitioned")
    assert("""Sort \(\d+\)""".r.findAllIn(p).size >= 2,
      "both children must sort on (key, ts)")
  }

  // ——— VERDICT r9 #6: pinned plan checks for the four heaviest headliners.
  // A silent plan regression on these would otherwise surface only as bench
  // noise. g02/g03 iterate through Materialize (checkpoint truncation), so
  // their interesting plans never appear in the FINAL plan — capture every
  // executed plan of the run via a QueryExecutionListener instead.

  /** Runs `action` against a FRESH child session (shared SparkContext,
    * own ExecutionListenerManager), returning every executed-plan string
    * that session reported while it ran. The isolation is the point:
    * a listener on the suite's shared session would also receive plans
    * from any other action still draining its async delivery (e.g. an
    * earlier test's BroadcastHashJoin), which could satisfy an exists()
    * assertion here by accident. Delivery is still async — settle-polled;
    * a missed straggler can only FAIL an assertion, never fake a pass. */
  private def capturedPlans(action: SparkSession => Unit): Seq[String] = {
    val session = spark.newSession()
    val plans = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    session.listenerManager.register(listener)
    try {
      action(session)
      var prev = -1
      var settles = 0
      while (settles < 3) {
        Thread.sleep(100)
        val now = plans.synchronized(plans.size)
        if (now == prev) settles += 1 else { settles = 0; prev = now }
      }
      plans.synchronized(plans.toList)
    } finally session.listenerManager.unregister(listener)
  }

  test("g02: the per-level frontier join broadcasts under the measured gate") {
    // kHop's contract: with the frontier/visited counts under
    // broadcastMaxRows, each BFS level joins the (huge) edge table against
    // a BROADCAST frontier — the edge table never shuffles. The graded
    // g02 frontier is always far below the 4M gate, so at least one
    // captured per-level plan must carry a BroadcastHashJoin.
    val ps = capturedPlans(s => SparkEntry.queries("g02_khop")(s, sfDir).collect())
    assert(ps.nonEmpty, "listener captured no executed plans — capture path broke")
    assert(ps.exists(_.contains("BroadcastHashJoin")),
      s"no BFS level planned a broadcast frontier join (captured ${ps.size} plans)")
  }

  test("g03: ubo step exchanges on the NEW group keys before the fan-out agg") {
    // Regroup.aggregateByNewKeys (the measured round-8 fix): the step's
    // plan must show the explicit repartition exchange (REPARTITION_BY_COL)
    // feeding the share-summing aggregate — not a degenerate partial agg
    // over the raw join fan-out.
    val ps = capturedPlans(s => SparkEntry.queries("g03_ubo_exposure")(s, sfDir).collect())
    assert(ps.exists(p => p.contains("REPARTITION_BY_COL") && p.contains("HashAggregate")),
      s"no captured step plan shows the exchange-before-agg shape (captured ${ps.size})")
  }

  test("g11: customer-part distinct runs BELOW the pair self-join") {
    // dedup-before-pair: the (custkey, partkey) distinct must feed the
    // partkey self-join, so pair fan-out happens on deduped rows. In the
    // formatted plan the distinct is a HashAggregate keyed on
    // (custkey, partkey); both join inputs must come from it (the second
    // side may be a ReusedExchange of the first).
    val p = plan("g11_conflict_shared_part")
    val aggIdx = p.linesIterator.zipWithIndex.collect {
      case (l, i) if l.contains("Keys") && l.contains("custkey") && l.contains("partkey") => i
    }.toList
    assert(aggIdx.nonEmpty, s"no (custkey, partkey) distinct aggregate in plan:\n$p")
    // the self-join's key detail line: "Left keys [1]: [partkey#...]"
    val joinLine = p.linesIterator.collectFirst {
      case l if l.contains("Left keys") && l.contains("partkey") => l
    }
    assert(joinLine.isDefined, s"no partkey self-join in plan:\n$p")
    assert(!p.contains("CartesianProduct"), "pair join degraded to a cartesian product")
  }

  test("l02: band-bucket join before the exact rerank, never all-pairs") {
    // the LSH contract: candidates come from an equi-join on the band
    // columns (h, mh_r0); the exact-jaccard filter runs on candidates only.
    val p = plan("l02_minhash_lsh")
    assert(p.contains("mh_r0"), s"band join keys missing from plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation degraded to an all-pairs join")
    assert(p.contains("jaccard_dist"), "exact rerank projection missing")
  }

  test("g50: candidates from the prefix-token equi-join with the length band, never all-pairs") {
    // the token-ER contract (the l02 pin's shape for the g50 blocker):
    // candidate generation is an equi-join on the prefix token with the
    // Arasu/PPJoin size band riding as a residual predicate on that same
    // join; the exact Jaccard rerank projects above the candidate dedup.
    val p = plan("g50_token_er_catalog")
    assert(p.contains("array_intersect"), "exact rerank projection missing")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation degraded to an all-pairs join")
    val joinKeyLine = p.linesIterator.collectFirst {
      case l if l.contains("Left keys") && l.contains("tok") => l
    }
    assert(joinKeyLine.isDefined, s"no equi-join on the prefix token in plan:\n$p")
    assert(p.contains("greatest") && p.contains("least"),
      "length band residual missing from the candidate join")
  }

  test("g54: record-linkage candidates from the prefix-token equi-join, never all-pairs") {
    // joinJaccard's contract (the g50 pin's shape for the two-table form):
    // candidates come from an equi-join on the shared prefix token with the
    // length band riding as a residual; the exact array_intersect rerank
    // projects above the candidate dedup; abbreviation normalization
    // (mapTokens' map-literal lookup) stays an expression — no extra join.
    val p = plan("g54_abbrev_linkage")
    assert(p.contains("array_intersect"), "exact rerank projection missing")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation degraded to an all-pairs join")
    val joinKeyLine = p.linesIterator.collectFirst {
      case l if l.contains("Left keys") && l.contains("tok") => l
    }
    assert(joinKeyLine.isDefined, s"no equi-join on the prefix token in plan:\n$p")
    assert(p.contains("greatest") && p.contains("least"),
      "length band residual missing from the candidate join")
  }

  test("t13: Screening.screen never shuffles the record side") {
    // the streaming-screening contract: the watchlist key index BROADCASTS;
    // the record flow reaches the alert set through explode + broadcast
    // join + per-row filters only. Any shuffle exchange in this fragment
    // would be a stateful/repartitioning step that (a) breaks append-mode
    // legality and (b) moves the 100 TB side of the join. BroadcastExchange
    // is the one allowed exchange.
    val t = Tables(spark, sfDir)
    val wl = t.customer.filter(col("c_custkey") % 101 === 0)
      .select(col("c_custkey").as("wid"), col("c_name").as("wname"))
    val p = graft.stream.Screening.screen(
        t.customer.select(col("c_custkey").as("id"), col("c_name").as("name")), wl)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"), s"key-index join is not a broadcast join:\n$p")
    val shuffles = p.linesIterator.filter(l =>
      l.trim.startsWith("Exchange") && !l.contains("BroadcastExchange")).toList
    assert(shuffles.isEmpty, s"record side shuffles: $shuffles")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      "a stateful aggregate crept into the stateless screen fragment")
  }

  test("t14: the record side stays shuffle-free THROUGH the dossier enrichment join") {
    // t13's contract composed one join further: the precomputed dossier
    // table must ALSO arrive by broadcast, so the screened hit stream —
    // still the 100 TB side — reaches its enriched alert row without any
    // shuffle exchange (the dossier aggregation itself shuffles, but on
    // the watchlist-sized build side, never on the record flow). The
    // fragment pinned here is the screen + enrichment join only, i.e. the
    // exact stream-side plan of the t14 twin.
    val t = Tables(spark, sfDir)
    val wl = t.customer.filter(col("c_custkey") % 101 === 0)
      .select(col("c_custkey").as("wid"), col("c_name").as("wname"))
    val dossier = wl.join(t.orders, col("o_custkey") === col("wid"), "left")
      .groupBy(col("wid"))
      .agg(count(col("o_orderkey")).as("n_orders"))
    val p = graft.stream.Screening.screen(
        t.customer.select(col("c_custkey").as("id"), col("c_name").as("name")), wl)
      .join(broadcast(dossier), Seq("wid"))
      .queryExecution.explainString(FormattedMode)
    // walk the operator ids that feed the record-side lineage: simpler and
    // robust — assert NO non-broadcast exchange sits between the customer
    // scan of the record side and the output. The dossier subtree's own
    // exchange is keyed on wid (watchlist-sized); it must be the ONLY one.
    val shuffles = p.linesIterator.filter(l =>
      l.trim.startsWith("Exchange") && !l.contains("BroadcastExchange")).toList
    assert(shuffles.size <= 1, s"more than the dossier build-side exchange: $shuffles")
    shuffles.foreach(l => assert(l.contains("wid"),
      s"a record-side shuffle crept into the enrichment fragment: $l"))
  }

  test("g55: probes broadcast against one vocabulary scan; jaro_winkler scores in codegen") {
    // the scored-screening contract (l05 cosine-top-k discipline): the tiny
    // probe set broadcasts (BroadcastNestedLoopJoin — a cross join, but of
    // a 5-row side), the roster is scanned once, and the native expression
    // stays inside a WholeStageCodegen span. CartesianProduct would mean
    // the broadcast was lost (both sides shuffling at 100 TB).
    val df = SparkEntry.queries("g55_jw_screen_rank")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), s"probe set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), "probe join degraded to a cartesian product")
    val line = p.linesIterator.find(_.contains("jaro_winkler")).get
    assert("""\*\(\d+\)""".r.findFirstIn(line).isDefined,
      s"jaro_winkler projection not codegen'd: $line")
  }

  test("s09: per-level slider frontier broadcasts with the validity residual on the join") {
    // egoMembersAsOf's contract: every slider position of every seed rides
    // ONE traversal — the per-level join broadcasts the (seed, as_of)
    // frontier under the measured gate, and snapshot validity
    // (active_from <= as_of) is a RESIDUAL on that broadcast join, never a
    // per-position re-scan of the edge table. Like g02, the levels iterate
    // through Materialize, so capture every executed plan of the run.
    val ps = capturedPlans(s =>
      SparkEntry.queries("s09_timeslider_export")(s, sfDir).collect())
    assert(ps.nonEmpty, "listener captured no executed plans — capture path broke")
    assert(ps.exists(p => p.contains("BroadcastHashJoin") && p.contains("active_from")),
      s"no per-level plan shows the broadcast frontier join with the validity " +
        s"residual (captured ${ps.size} plans)")
  }

  test("g56: slider dates add ZERO scans — lineitem is read once per layer") {
    // the as-of UBO scale contract: per-date layer weights come from
    // conditional aggregates over ONE scan per layer (contains + supplied
    // = 2 lineitem scans total for ANY number of slider dates); a
    // branch-per-date formulation would show dates × layers scans. The
    // propagation checkpoints at its last step, so count scans across
    // every executed plan of the run.
    val ps = capturedPlans(s => SparkEntry.queries("g56_ubo_asof")(s, sfDir).collect())
    assert(ps.nonEmpty, "listener captured no executed plans — capture path broke")
    // AQE plan strings append an "Initial Plan" section that repeats every
    // scan node — count only the executed (final) section of each plan
    val lineitemScans = ps
      .map(_.split("Initial Plan").head)
      .map("""lineitem\.parquet""".r.findAllIn(_).size).sum
    assert(lineitemScans == 2,
      s"expected both dated layers to scan lineitem once each (dates must add " +
        s"zero scans), got $lineitemScans across ${ps.size} plans")
  }

  test("g47: every per-year snapshot branch pushes its validity bound to the scan") {
    // branch-per-snapshot design: each of the 7 year branches must push its
    // l_shipdate bound into ITS lineitem scan (row-group pruning per branch)
    val p = plan("g47_snapshot_series")
    val pushed = """LessThanOrEqual\(l_shipdate""".r.findAllIn(p).size
    assert(pushed >= 7, s"only $pushed of 7 branches push the l_shipdate bound:\n$p")
    assert("""LessThanOrEqual\(o_orderdate""".r.findAllIn(p).size >= 7,
      "PLACED-branch o_orderdate validity bound not pushed in every year branch")
  }

  test("g63: the peak aggregation reuses the velocity window's target partitioning") {
    // one hash shuffle on dst feeds BOTH the range-frame window and the
    // per-target peak aggregation (same key ⇒ Catalyst reuses the
    // partitioning); a second hashpartitioning(dst) exchange would mean
    // the plan re-shuffles what is already co-located. Pinned on the
    // SCALE-tier transitions derivation (OrderedLag) — the graded sf0.001
    // plan takes the single-window tier, whose SinglePartition satisfies
    // every distribution and shows no dst exchange at all.
    val t = Tables(spark, sfDir)
    val tr = graft.graph.GraphBuilder.userTransitionsAtScale(t)
      .select(col("src"), col("dst"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("dst")
      .orderBy(col("ts_us")).rangeBetween(-6L * 3600L * 1000000L, 0)
    val p = tr
      .withColumn("v", size(array_distinct(collect_list(col("src")).over(w))).cast("long"))
      .groupBy(col("dst"))
      .agg(max(struct(col("v"), (-col("ts_us")).as("nts"))).as("pk"))
      .queryExecution.explainString(FormattedMode)
    val exchanges = """\) Exchange""".r.findAllIn(p).size
    val dstHash = """hashpartitioning\(dst""".r.findAllIn(p).size
    assert(exchanges == 1 && dstHash >= 1,
      s"expected ONE exchange (hash on dst) shared by window and agg, " +
        s"got $exchanges exchanges / $dstHash dst-hash args:\n$p")
  }

  test("g62: slider dates and dossier sections hold lineitem at 4 scans") {
    // the g56 scan contract carried to the composed dossier: the dated
    // supplied layer is materialized once (THREE consumers — ownership,
    // concentration, seed linkage — read the checkpoint), contains is
    // scanned once, and the ego section's full-graph build (whose
    // CONTAINS/SUPPLIED_BY edges also derive from lineitem) is
    // materialized so traversal + induced join share its 2 branch scans:
    // 4 lineitem scans total, regardless of slider positions or sections
    val ps = capturedPlans(s => SparkEntry.queries("g62_dossier_asof")(s, sfDir).collect())
    assert(ps.nonEmpty, "listener captured no executed plans — capture path broke")
    val lineitemScans = ps
      .map(_.split("Initial Plan").head)
      .map("""lineitem\.parquet""".r.findAllIn(_).size).sum
    assert(lineitemScans == 4,
      s"expected 4 lineitem scans (2 dated layers + 2 materialized edge-union " +
        s"branches), got $lineitemScans across ${ps.size} plans")
  }

  test("l43: term filter below the tf aggregate; scan reads only (doc_id, text); top-k lowers to TakeOrdered") {
    // the BM25 scale contract: the expensive state is (matching docs x <=3
    // terms) — the token IN filter must run at row level under the
    // aggregation, the scan must prune to the two used columns, and the
    // final LIMIT must lower to TakeOrderedAndProject instead of a global
    // sort materialization
    val p = SparkEntry.queries("l43_bm25")(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("TakeOrderedAndProject"), s"top-20 did not lower:\n$p")
    assert("""token#\d+ IN \(""".r.findFirstIn(p).isDefined
      || p.contains("token#") && p.contains(" IN ("),
      s"query-term filter missing from the physical plan:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan must prune to (doc_id, text):\n$p")
  }

  test("g65: the dossier delta adds ZERO lineitem scans over g62's 4-scan pin") {
    // the diff is a full-outer self-join + groupBy over the SAME
    // materialized dossierAsOfRows frame g62 reads — both slider frames
    // come out of one build, so the delta costs g62's 4 pinned scans and
    // nothing more (VERDICT r12 #2: assert the reuse, don't just claim it)
    val ps = capturedPlans(s => SparkEntry.queries("g65_dossier_delta")(s, sfDir).collect())
    assert(ps.nonEmpty, "listener captured no executed plans — capture path broke")
    val lineitemScans = ps
      .map(_.split("Initial Plan").head)
      .map("""lineitem\.parquet""".r.findAllIn(_).size).sum
    assert(lineitemScans == 4,
      s"expected the g62 pin unchanged (4 lineitem scans, the diff adds none), " +
        s"got $lineitemScans across ${ps.size} plans")
  }

  test("l47b: candidates come from the bucket equi-join, never the brute-force cross join") {
    // the IVF-screen contract: eval × corpus pairing happens ONLY through
    // the probed-bucket equi-join on `cluster` (partition pruning on a
    // persisted index) — l47's BroadcastNestedLoopJoin Cross must NOT
    // appear anywhere; the per-eval vector join rides the broadcast eval
    // slice
    val p = plan("l47b_decontaminate_ivf")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"IVF screen degraded to an all-pairs join:\n$p")
    assert(p.contains("cluster"), s"bucket join key missing from plan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "eval slice no longer broadcasts into the candidate scoring")
  }

  test("g66: the merge-map remap joins broadcast — the standing labels are scanned, never shuffled") {
    // the incremental-CC contract: after the ≤2·|delta|-node component
    // graph is solved, the corpus-sized label table is updated by ONE
    // broadcast-hash remap (plus the broadcast new-node lookup) — a
    // SortMergeJoin on the label table here would mean the maintenance
    // path shuffles the state it exists to avoid rewriting. Pinned on a
    // fixture whose delta GENUINELY merges (at the spec's sf0.001 the
    // graded slice's strong graph is already one dense component, the
    // merge map comes out empty, and PropagateEmptyRelation correctly
    // collapses the remap joins away — itself the right plan, but it
    // would leave this contract unasserted; at the graded sf0.01 the
    // delta carries 46 cross-component merges, measured)
    import spark.implicits._
    val base = Seq((1L, 2L), (10L, 11L)).toDF("src", "dst")
    val delta = Seq((2L, 10L), (11L, 30L)).toDF("src", "dst")
    val inc = graft.graph.Algorithms.ccIncrement(
      graft.graph.Algorithms.cc(base), delta)
    val p = inc.queryExecution.explainString(FormattedMode)
    val remaps = "BroadcastHashJoin LeftOuter".r.findAllIn(p).size
    assert(remaps >= 2,
      s"expected the label remap AND the new-node lookup as broadcast left joins, got $remaps:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the standing label table must never shuffle in the remap:\n$p")
    assert(!p.contains("CartesianProduct"), "remap degraded to a cartesian product")
    // base labels and the merge map arrive via the union-find tier's local
    // datasets — the plan must contain no iterative CC over the edge corpus
    assert(!p.contains("VertexRDD") && !p.contains("EdgeRDD"),
      "increment path fell back to a GraphX global CC run")
    // and the graded query itself must never degrade to a cartesian product
    val gp = plan("g66_cc_increment")
    assert(!gp.contains("CartesianProduct") && !gp.contains("SortMergeJoin"),
      s"graded increment plan shuffles or crosses:\n$gp")
  }

  test("t17: each refresh scans only its order slice — watchlist broadcasts, date bounds push to the scans") {
    // the maintained-view economics (VERDICT r13 #6): the two merge folds
    // scan orders exactly twice (base slice + delta slice), each with its
    // date bound pushed to the parquet scan (at 100 TB: partition pruning
    // on the date-partitioned feed), and the watchlist joins broadcast so
    // the slice aggregation never shuffles the order rows on wid
    val p = plan("t17_dossier_increment")
    val scans = """orders\.parquet""".r.findAllIn(p).size
    assert(scans == 2, s"expected exactly 2 orders-slice scans, got $scans:\n$p")
    assert("""LessThanOrEqual\(o_orderdate""".r.findAllIn(p).size >= 1 &&
           """GreaterThan\(o_orderdate""".r.findAllIn(p).size >= 1,
      s"slice date bounds not pushed to the orders scans:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"watchlist must broadcast into both slice aggregations:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("t17b: retraction costs the cancel slice + ONE surviving recompute scan; no corpus re-aggregation") {
    // retract materializes the watchlist-bound (state ⋈ cancel-delta)
    // frame, so the fold (1 full scan) and the cancel-slice aggregation
    // (1 scan) run exactly once AT the materialization; the FINAL plan —
    // the one that would re-execute per consumer — touches orders only
    // for the displaced-max recompute (1 scan) and reads the maintained
    // state as a local dataset (Scan ExistingRDD), never re-aggregating
    // the corpus. (The materialize runs through the RDD checkpoint path,
    // which the SQL listener does not capture — so the pin is on the
    // final plan's shape, the part that repeats.)
    val p = plan("t17b_dossier_retract")
    val scans = """orders\.parquet""".r.findAllIn(p).size
    assert(scans == 1,
      s"final retract plan must scan orders ONLY for the recompute, got $scans:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"the maintained state must enter materialized, not re-derived:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"watchlist/displaced joins must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("g68: the decrement runs blast-radius-sized — touched set broadcasts, labels never sort-merge") {
    // fixture with a genuine split + a genuine merge (the graded slice at
    // sf0.001 may have an empty removal set, which would collapse the very
    // joins this pins — the g66 lesson)
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val surviving = Seq((1L, 2L), (10L, 11L)).toDF("src", "dst")
    val removed = Seq((2L, 3L)).toDF("src", "dst")
    val dec = graft.graph.Algorithms.ccDecrement(
      graft.graph.Algorithms.cc(base), surviving, removed)
    val p = dec.queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"),
      s"touched-component set must broadcast into the label/edge pruning joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the standing label table must never shuffle in the decrement:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("VertexRDD") && !p.contains("EdgeRDD"),
      "decrement fell back to a GraphX global CC run")
    val gp = plan("g68_cc_decrement")
    assert(!gp.contains("CartesianProduct"),
      s"graded decrement plan degraded to a cartesian:\n$gp")
  }

  test("l48: one tokenize pipeline feeds all queries — qterms broadcast, per-query top-20 prunes via WindowGroupLimit") {
    val p = plan("l48_bm25_batch")
    // the corpus is tokenized by the SAME scan shape as l43 (Catalyst
    // re-derives tok for each of dl/stats/tf/df) — batching queries must
    // add ZERO documents scans over the single-query plan
    val scans = """documents\.parquet""".r.findAllIn(p).size
    val l43Scans = """documents\.parquet""".r.findAllIn(plan("l43_bm25")).size
    assert(scans == l43Scans,
      s"query batching added corpus scans: got $scans vs l43's $l43Scans:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"qterms/df/stats must broadcast:\n$p")
    // VERDICT r14 #2 done-clause: term pruning is a broadcast LEFT-SEMI
    // join on the distinct term frame — no driver collect, no isin
    // literal list in the token filter (the query-table-native shape)
    assert(p.contains("LeftSemi"),
      s"term pruning must be the broadcast semi-join, not an isin list:\n$p")
    assert(!p.contains("token#") || !"""token(?:#\d+)? IN \(""".r.findFirstIn(p).isDefined,
      s"an In-literal token filter survived the semi-join refactor:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-query rank filter must prune groups before the full window:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("g69: the ER decrement stays pair-graph-local — no cartesian, state enters materialized") {
    val p = plan("g69_er_decrement")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair maintenance degraded to all-pairs:\n$p")
    // driver-tier local data either way: Scan ExistingRDD is the
    // materialized standing state (blast-radius path); LocalTableScan is
    // the round-15 absolute-size floor's union-find output (small graphs
    // route straight to the rebuild — no checkpoint needed for a
    // driver-built dataset). Both are the union-find tier, never a
    // distributed recompute.
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      "labels must enter as the union-find tier's local dataset")
    assert(p.contains("BroadcastHashJoin"),
      "deleted-set flags and name enrichments must broadcast")
  }

  test("l50: fusing per-query adds no corpus scans — embeddings read twice (queries + corpus), per-query prune via WindowGroupLimit") {
    val p = plan("l50_rrf_batch")
    val emb = """embeddings\.parquet""".r.findAllIn(p).size
    assert(emb == 2, s"the batched semantic side must scan embeddings exactly twice, got $emb:\n$p")
    val docs = """documents\.parquet""".r.findAllIn(p).size
    val l48Docs = """documents\.parquet""".r.findAllIn(plan("l48_bm25_batch")).size
    assert(docs == l48Docs, s"fusion added documents scans: $docs vs l48's $l48Docs")
    assert(p.contains("WindowGroupLimit"),
      "per-query rank filters must prune groups before the full windows")
    assert(!p.contains("CartesianProduct"))
  }

  test("l51: packing shuffles (shard, doc_id, tokens) — never text — into one sorted MapGroups fold") {
    val p = plan("l51_pack_sequences")
    assert("""documents\.parquet""".r.findAllIn(p).size == 1,
      s"packing must scan the corpus once:\n$p")
    assert(p.contains("MapGroups"), "the greedy fold runs as a sorted group map")
    // token counts project BEFORE the shard shuffle, so the exchange moves
    // three longs per doc, not the document text
    val exchangeSections = p.split("\\(\\d+\\) Exchange").drop(1)
    assert(exchangeSections.nonEmpty)
    assert(!exchangeSections.head.linesIterator.take(2).mkString.contains("text#"),
      s"document text must not cross the packing shuffle:\n$p")
  }

  test("l49: the BPE merge chain is projection-level over ONE scan — no UDF, no join, agg is partial") {
    val p = plan("l49_bpe_tokenize")
    val scans = """documents\.parquet""".r.findAllIn(p).size
    assert(scans == 1, s"BPE tokenize must scan the corpus once, got $scans:\n$p")
    assert(!p.contains("Join"), s"no join belongs in the tokenize-count plan:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("MapPartitions"),
      "merge chain must stay expression-level (codegen), not UDF/mapPartitions")
    assert("partial".r.findFirstIn(p.toLowerCase).isDefined,
      "per-doc token counts must partial-aggregate before the shuffle")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("text") && !read.contains("lang"),
      s"scan reads more than (doc_id, text): $read")
  }

  test("l49b: the LEARNED-table apply keeps l49's shape — one corpus scan, expression-level chain, partial agg") {
    // the learn loop runs its own jobs over the distinct-word vocabulary
    // BEFORE this plan exists; the graded dataflow itself must stay l49's:
    // one documents scan, the 12-replace chain as projection work, no join
    val p = plan("l49b_bpe_learned")
    val scans = """documents\.parquet""".r.findAllIn(p).size
    assert(scans == 1, s"learned-BPE apply must scan the corpus once, got $scans:\n$p")
    assert(!p.contains("Join"), s"no join belongs in the apply plan:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("MapPartitions"),
      "learned chain must stay expression-level (codegen), not UDF/mapPartitions")
    assert("partial".r.findFirstIn(p.toLowerCase).isDefined,
      "per-doc token counts must partial-aggregate before the shuffle")
  }

  test("g70: the two-horizon replay composes g68's shapes — no cartesian, erasure as pushed filters, label state materialized") {
    val p = plan("g70_cc_replay")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the replay fold degraded to all-pairs:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      "standing label state must enter materialized (the g68/g66 convention)")
    assert("""% 23\)""".r.findFirstIn(p).isDefined,
      s"the erasure batch must ride as a pushed % 23 predicate, not a separate scan:\n$p")
  }
}
