package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-native bounded traversals (SURVEY.md §2 G2/G5/G14, §4.3).
  *
  * Spark 4.1's DataFrame API has no recursion operator, so bounded iteration
  * runs as a driver-side loop of joins — the idiomatic Spark pattern. Each
  * level is `localCheckpoint`ed: it truncates the logical plan so the k-th
  * level doesn't re-derive levels 1..k-1 (lineage blowup is the classic
  * failure mode of iterative DataFrame code; SURVEY.md §7.3).
  *
  * Scale posture: each hop is one equi-join on `src` — a shuffle-partitioned
  * hash join that AQE can skew-split if a supernode appears. The visited-set
  * anti-join keeps the frontier a set, so path multiplicity never multiplies
  * the data volume (unlike the naive path-enumeration join).
  */
object Traversals {

  /** Min-depth BFS: nodes reachable from `start` (column `id`) in ≤ maxHops
    * directed hops over `edges` (columns `src`, `dst`). Returns (id, depth)
    * where depth is the minimum hop count — BFS order guarantees min-depth.
    *
    * `broadcastMaxRows` gates the frontier/visited broadcast hints: the sets
    * are single-long-column, so the default 4M rows ≈ 32 MB per executor
    * copy. The sets are materialized anyway, so the per-level count that
    * feeds the gate is one cheap job over checkpointed blocks — a measured
    * decision, not a hard-coded hint (a whole-graph BFS whose reachable set
    * outgrows the gate degrades to ordinary shuffle joins instead of
    * overflowing the driver).
    */
  def kHop(edges: DataFrame, start: DataFrame, maxHops: Int,
           broadcastMaxRows: Long = 4000000L): DataFrame = {
    def gated(df: DataFrame, rows: Long): DataFrame =
      if (rows <= broadcastMaxRows) broadcast(df) else df
    // Materialize the edge list once: the edge derivation (unions + window
    // functions in GraphBuilder) would otherwise recompute on every hop.
    // Reachability is invariant under edge multiplicity, so dedup up front:
    // on a multigraph (INTERACTED repeats) every duplicate edge would
    // multiply each hop's join output before the per-level distinct —
    // distinct-ing once here shrinks every subsequent shuffle.
    val e = edges.select(col("src"), col("dst")).distinct().transform(Materialize.apply)
    var visited = start.select(col("id")).distinct()
      .withColumn("depth", lit(0L)).transform(Materialize.apply)
    var frontier = visited.select("id")
    var i = 1
    // One materialization per level (the frontier); `visited` stays a lazy
    // union over checkpointed levels — its lineage depth is maxHops, which is
    // always small (bounded traversal), so re-checkpointing it and probing
    // isEmpty would only add ~2 jobs per level for nothing. An empty
    // frontier makes the remaining joins no-ops at negligible cost.
    //
    // Broadcast hints: bounded traversals are drill-downs, so the frontier
    // and visited sets are orders of magnitude smaller than the edge table —
    // broadcasting them means the EDGE TABLE NEVER SHUFFLES (one scan of
    // cached blocks per hop, one exchange for the frontier distinct). The
    // materialized frontier is RDD-backed with unknown stats, so AQE cannot
    // discover this conversion itself; the measured row counts gate the
    // hints instead (see `broadcastMaxRows` above).
    var frontierCount = visited.count()
    var visitedCount = frontierCount
    while (i <= maxHops) {
      val next = e.join(gated(frontier.withColumnRenamed("id", "fid"), frontierCount),
          col("src") === col("fid"))
        .select(col("dst").as("id")).distinct()
        .join(gated(visited.select("id"), visitedCount), Seq("id"), "left_anti")
        .transform(Materialize.apply)
      frontierCount = next.count()
      visitedCount += frontierCount
      visited = visited.unionByName(next.withColumn("depth", lit(i.toLong)))
      frontier = next
      i += 1
    }
    visited
  }

  /** Undirected view of a directed edge list. */
  def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))

  /** All simple paths (no node revisits) of length 1..maxDepth from startId,
    * as '->'-joined id strings (the ownership chains behind a UBO figure,
    * README.md:11,13). Path enumeration DOES multiply with fan-out — callers
    * bound it with maxDepth and a small start set; at 100 TB this is a
    * per-entity drill-down, never a whole-graph operator.
    */
  def simplePaths(edges: DataFrame, startId: Long, maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).transform(Materialize.apply)
    var frontier = spark.range(1).select(
      lit(startId.toString).as("path_str"), lit(startId).as("last"),
      lit(0).as("depth"), array(lit(startId)).as("visited"))
    var acc: Option[DataFrame] = None
    for (i <- 1 to maxDepth) {
      frontier = frontier.join(e, col("src") === col("last"))
        .filter(!array_contains(col("visited"), col("dst")))
        .select(concat(col("path_str"), lit("->"), col("dst").cast("string")).as("path_str"),
                col("dst").as("last"), lit(i).as("depth"),
                array_append(col("visited"), col("dst")).as("visited"))
        .transform(Materialize.apply)
      acc = Some(acc.map(_.unionByName(frontier)).getOrElse(frontier))
    }
    // maxDepth < 1 → no paths (empty result, not a crash)
    acc.getOrElse(frontier.limit(0)).select(col("path_str"), col("depth"))
  }

  /** Ego network: the subgraph induced by the ≤ radius undirected
    * neighborhood of `centerId` (reference: interactive relationship mapping
    * renders a neighborhood, README.md:11).
    */
  def egoNet(edges: DataFrame, centerId: Long, radius: Int,
             broadcastMaxRows: Long = 4000000L): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.transform(Materialize.apply) // reused: symmetrize + 2 induced joins
    val start = spark.range(1).select(lit(centerId).as("id"))
    val reach = kHop(symmetrize(e), start, radius, broadcastMaxRows).select(col("id"))
    // ego neighborhoods are drill-down-sized; the materialized reach set is
    // RDD-backed (no stats), so hint the broadcast for the induced joins —
    // gated on the measured reach size, same contract as the kHop hints
    // (one cheap count over checkpointed blocks; oversized reach degrades
    // to shuffle semi-joins instead of overflowing the driver)
    val reachGated =
      if (reach.count() <= broadcastMaxRows) (df: DataFrame) => broadcast(df)
      else (df: DataFrame) => df
    e.join(reachGated(reach.withColumnRenamed("id", "sid")), col("src") === col("sid"), "left_semi")
      .join(reachGated(reach.withColumnRenamed("id", "did")), col("dst") === col("did"), "left_semi")
  }

  /** Batched multi-seed ego membership: for every seed in `seeds` (one
    * `seed` column), the nodes within ≤ radius undirected hops, as
    * (seed, id, depth) with min depth. One plan for ALL seeds — the
    * per-level join carries the seed column instead of looping per seed,
    * so k ego nets cost the same number of shuffles as one (the export
    * path the visualization layer batches over, README.md:19). Same
    * measured broadcast gate and per-level localCheckpoint as [[kHop]];
    * the visited anti-join is per (seed, id), so overlapping
    * neighborhoods don't collapse into each other.
    */
  def egoMembers(edges: DataFrame, seeds: DataFrame, radius: Int,
                 broadcastMaxRows: Long = 4000000L): DataFrame = {
    def gated(df: DataFrame, rows: Long): DataFrame =
      if (rows <= broadcastMaxRows) broadcast(df) else df
    val e = symmetrize(edges).distinct().transform(Materialize.apply)
    var visited = seeds.select(col("seed")).distinct()
      .select(col("seed"), col("seed").as("id"), lit(0L).as("depth"))
      .transform(Materialize.apply)
    var frontier = visited.select("seed", "id")
    var frontierCount = visited.count()
    var visitedCount = frontierCount
    for (i <- 1 to radius) {
      val next = e.join(gated(frontier.withColumnRenamed("id", "fid"), frontierCount),
          col("src") === col("fid"))
        .select(col("seed"), col("dst").as("id")).distinct()
        .join(gated(visited.select("seed", "id"), visitedCount), Seq("seed", "id"), "left_anti")
        .transform(Materialize.apply)
      frontierCount = next.count()
      visitedCount += frontierCount
      visited = visited.unionByName(next.withColumn("depth", lit(i.toLong)))
      frontier = next
    }
    visited
  }

  /** Per-seed induced edge lists: every edge whose BOTH endpoints belong
    * to the same seed's member set, tagged with that seed. Two equi-joins
    * against the (small, measured-gate broadcast) membership table — the
    * edge table never shuffles when the gate holds.
    */
  def inducedEdges(edges: DataFrame, members: DataFrame,
                   broadcastMaxRows: Long = 4000000L): DataFrame = {
    val m = members.select(col("seed"), col("id")).distinct().transform(Materialize.apply)
    val hint: DataFrame => DataFrame =
      if (m.count() <= broadcastMaxRows) broadcast else identity
    edges.join(hint(m.select(col("seed"), col("id").as("src"))), Seq("src"))
      .join(hint(m.select(col("seed"), col("id").as("dst"))), Seq("seed", "dst"))
  }

  /** Per-seed member CAP for ego exports: keeps each seed's top `cap`
    * members ranked by (min depth asc, induced incident-weight strength
    * desc, id asc), so a supernode ego cannot emit an unbounded document
    * (a radius-2 ego on a hub otherwise collect_lists millions of nodes
    * into ONE json value — the export's only unbounded allocation; the
    * VERDICT r10 s07 caveat). Ranking semantics: depth dominates (the
    * whole 1-hop shell outranks any 2-hop node — truncation peels the
    * neighborhood from the outside in), strength = the member's total
    * incident edge weight WITHIN the pre-cap induced subgraph (computed
    * by one [[inducedEdges]] pass, so it reflects prominence in the
    * document being drawn, not global degree), id breaks ties
    * deterministically. The seed itself is depth 0 and always survives.
    *
    * Returns (seed, id, depth, n_total) with `n_total` the PRE-cap member
    * count — callers surface it next to the cap so consumers can SEE
    * truncation instead of mistaking a capped document for the whole
    * neighborhood. The per-seed window shuffle partitions on seed; its
    * partitions are ego-sized (bounded by the radius gate), never
    * board-sized.
    */
  /** Batched multi-seed, multi-SNAPSHOT ego membership — the Time-Slider's
    * data feed (reference: README.md:17, the slider renders the seed's
    * neighborhood at each slider position). `seeds` carries (seed, as_of)
    * pairs; one traversal answers EVERY slider position of every seed: the
    * batch key is the PAIR, carried through the per-level join exactly the
    * way [[egoMembers]] carries seed (the g53 "batch key is free" shape),
    * and snapshot validity is a residual predicate on that join — so the
    * edge table is scanned `radius` times TOTAL, not radius × positions
    * (the branch-per-year alternative re-scans per position; on CUMULATIVE
    * validity windows the late-year branches read almost everything, so
    * Σ branch-scan ≈ positions/2 full scans per level — this form wins
    * whenever the edge scan is the bottleneck, which at 100 TB it is).
    * Parallel edge instances collapse to one traversal edge with
    * `min(valid_from)` (NULL ⇒ always-active ⇒ epoch): a node is reachable
    * at `as_of` iff SOME instance had started — `min ≤ as_of` is exactly
    * that ∃, and the reduction shrinks the per-level join's left side to
    * distinct pairs. Same measured broadcast gate and per-level
    * materialization as [[egoMembers]].
    */
  def egoMembersAsOf(edges: DataFrame, seeds: DataFrame, radius: Int,
                     broadcastMaxRows: Long = 4000000L): DataFrame = {
    def gated(df: DataFrame, rows: Long): DataFrame =
      if (rows <= broadcastMaxRows) broadcast(df) else df
    val epoch = lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    val e = edges
      .select(col("src"), col("dst"), coalesce(col("valid_from"), epoch).as("vf"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"),
        coalesce(col("valid_from"), epoch).as("vf")))
      .groupBy("src", "dst").agg(min(col("vf")).as("active_from"))
      .transform(Materialize.apply)
    var visited = seeds.select(col("seed"), col("as_of")).distinct()
      .select(col("seed"), col("as_of"), col("seed").as("id"), lit(0L).as("depth"))
      .transform(Materialize.apply)
    var frontier = visited.select("seed", "as_of", "id")
    var frontierCount = visited.count()
    var visitedCount = frontierCount
    for (i <- 1 to radius) {
      val next = e.join(gated(frontier.withColumnRenamed("id", "fid"), frontierCount),
          col("src") === col("fid") && col("active_from") <= col("as_of"))
        .select(col("seed"), col("as_of"), col("dst").as("id")).distinct()
        .join(gated(visited.select("seed", "as_of", "id"), visitedCount),
          Seq("seed", "as_of", "id"), "left_anti")
        .transform(Materialize.apply)
      frontierCount = next.count()
      visitedCount += frontierCount
      visited = visited.unionByName(next.withColumn("depth", lit(i.toLong)))
      frontier = next
    }
    visited
  }

  /** Per-(seed, as_of) induced edge lists for [[egoMembersAsOf]] members:
    * both endpoints in the same slider position's member set AND the edge
    * instance itself valid at that position (members collapse parallel
    * instances for traversal; the DOCUMENT lists every valid instance).
    * Same two gated equi-joins as [[inducedEdges]] — the edge table never
    * shuffles under the gate; validity is a post-join filter on the
    * already-joined as_of.
    */
  def inducedEdgesAsOf(edges: DataFrame, members: DataFrame,
                       broadcastMaxRows: Long = 4000000L): DataFrame = {
    val m = members.select(col("seed"), col("as_of"), col("id")).distinct()
      .transform(Materialize.apply)
    val hint: DataFrame => DataFrame =
      if (m.count() <= broadcastMaxRows) broadcast else identity
    edges.join(hint(m.select(col("seed"), col("as_of"), col("id").as("src"))), Seq("src"))
      .join(hint(m.select(col("seed"), col("as_of"), col("id").as("dst"))),
        Seq("seed", "as_of", "dst"))
      .filter(col("valid_from").isNull || col("valid_from") <= col("as_of"))
  }

  /** [[egoMembers]] carrying a PARENT pointer: per (seed, id), the minimum
    * frontier node that discovered id at its first BFS level (−1 for the
    * seed row). The min makes the pointer deterministic, so a path
    * reconstructed by following parents is canonical — the same path in
    * any engine that picks (min depth, then min parent), which is exactly
    * the tie rule the oracle mirror applies to its walk-enumerated reach
    * (at radius ≤ 2 the two rules coincide: a length-d walk's last hop
    * comes from a node whose OWN min depth is d−1, since no-self-loop
    * symmetric graphs admit no shorter-walk padding inside the bound —
    * the min over discovering-frontier parents equals the min over
    * min-depth-row parents).
    */
  def egoMembersParents(edges: DataFrame, seeds: DataFrame, radius: Int,
                        broadcastMaxRows: Long = 4000000L): DataFrame = {
    def gated(df: DataFrame, rows: Long): DataFrame =
      if (rows <= broadcastMaxRows) broadcast(df) else df
    val e = symmetrize(edges).distinct().transform(Materialize.apply)
    var visited = seeds.select(col("seed")).distinct()
      .select(col("seed"), col("seed").as("id"), lit(0L).as("depth"),
              lit(-1L).as("parent"))
      .transform(Materialize.apply)
    var frontier = visited.select("seed", "id")
    var frontierCount = visited.count()
    var visitedCount = frontierCount
    for (i <- 1 to radius) {
      val next = e.join(gated(frontier.withColumnRenamed("id", "fid"), frontierCount),
          col("src") === col("fid"))
        .groupBy(col("seed"), col("dst"))
        .agg(min(col("fid")).as("parent"))
        .withColumnRenamed("dst", "id")
        .join(gated(visited.select("seed", "id"), visitedCount), Seq("seed", "id"), "left_anti")
        .transform(Materialize.apply)
      frontierCount = next.count()
      visitedCount += frontierCount
      visited = visited.unionByName(next.withColumn("depth", lit(i.toLong)))
      frontier = next.select("seed", "id")
    }
    visited
  }

  /** [[connectionDistance]] plus the WITNESS PATH: for each connected
    * (s_id, t_id) pair, one canonical shortest path rendered as an
    * '->'-joined id string (g05's path convention) — the drawable answer
    * to "how are X and Y connected?". The meet node is the distance
    * query's deterministic witness (min id at min total depth); the path
    * is reconstructed by following [[egoMembersParents]]' min-parent
    * pointers from the meet toward BOTH seeds — `radius` conditional
    * backtrack joins per side against the one materialized cone table,
    * never a path-enumerating traversal (the frontier stays (seed, id)
    * rows; path strings exist only for the ≤ |pairs| witness rows).
    * Pairs beyond 2·radius report dist −1 and path '-'.
    */
  def connectionPaths(edges: DataFrame, pairs: DataFrame, radius: Int,
                      broadcastMaxRows: Long = 4000000L): DataFrame = {
    val seeds = pairs.select(col("s_id").as("seed"))
      .unionByName(pairs.select(col("t_id").as("seed"))).distinct()
    val m = egoMembersParents(edges, seeds, radius, broadcastMaxRows)
      .transform(Materialize.apply) // reused: both meet sides + 2·radius backtracks
    val meets = pairs
      .join(m.select(col("seed").as("s_id"), col("id"), col("depth").as("df")), Seq("s_id"))
      .join(m.select(col("seed").as("t_id"), col("id"), col("depth").as("db")),
            Seq("t_id", "id"))
      .select(col("s_id"), col("t_id"), col("id"), (col("df") + col("db")).as("tot"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("s_id", "t_id")
    var cur = meets.withColumn("dist", min(col("tot")).over(w))
      .filter(col("tot") === col("dist"))
      .groupBy("s_id", "t_id", "dist")
      .agg(min(col("id")).as("meet"))
      .select(col("s_id"), col("t_id"), col("dist"),
              col("meet").as("s_cur"), col("meet").cast("string").as("s_chain"),
              col("meet").as("t_cur"), lit("").as("t_chain"))
    for (_ <- 1 to radius) {
      val stepS = when(col("s_par").isNotNull && col("s_par") =!= -1L, true).otherwise(false)
      val stepT = when(col("t_par").isNotNull && col("t_par") =!= -1L, true).otherwise(false)
      cur = cur
        .join(m.select(col("seed").as("s_id"), col("id").as("s_cur"),
          col("parent").as("s_par")), Seq("s_id", "s_cur"), "left")
        .join(m.select(col("seed").as("t_id"), col("id").as("t_cur"),
          col("parent").as("t_par")), Seq("t_id", "t_cur"), "left")
        .select(col("s_id"), col("t_id"), col("dist"),
          when(stepS, col("s_par")).otherwise(col("s_cur")).as("s_cur"),
          when(stepS, concat(col("s_par").cast("string"), lit("->"), col("s_chain")))
            .otherwise(col("s_chain")).as("s_chain"),
          when(stepT, col("t_par")).otherwise(col("t_cur")).as("t_cur"),
          when(stepT, concat(col("t_chain"), lit("->"), col("t_par").cast("string")))
            .otherwise(col("t_chain")).as("t_chain"))
    }
    pairs.join(cur, Seq("s_id", "t_id"), "left")
      .select(col("s_id"), col("t_id"),
              coalesce(col("dist"), lit(-1L)).as("dist"),
              coalesce(concat(col("s_chain"), col("t_chain")), lit("-")).as("path_str"))
  }

  /** Batched s–t connection distance via bidirectional meet-in-the-middle:
    * for every (s_id, t_id) row in `pairs`, the exact undirected shortest
    * distance when it is ≤ 2·radius, else −1 (the documented bound). A
    * path of length L ≤ 2·radius splits at its midpoint into halves of
    * ≤ radius each, so min over meeting nodes m of depth_s(m) + depth_t(m)
    * is exact within the bound — and because the search is undirected,
    * forward and backward cones are the SAME computation: all pair
    * endpoints batch as seeds of ONE [[egoMembers]] traversal (one
    * symmetrize, `radius` edge scans total), and the meet is an equi-join
    * of that single member table with itself on the node id. The 100 TB
    * arithmetic: a radius-2k single-source frontier is ~b^2k rows; two
    * radius-k cones are ~2·b^k.
    *
    * `n_meet` counts the meeting nodes — nodes inside BOTH radius cones
    * with depth_s + depth_t = dist, i.e. the shortest-path nodes both
    * cones can see: at dist = 2·radius that is exactly the path midpoints
    * (1 = a single bottleneck entity, large = structurally entangled); at
    * smaller distances the visible window widens toward the endpoints.
    * `meet_min` is the least such node id, a deterministic witness.
    */
  def connectionDistance(edges: DataFrame, pairs: DataFrame, radius: Int,
                         broadcastMaxRows: Long = 4000000L): DataFrame = {
    val seeds = pairs.select(col("s_id").as("seed"))
      .unionByName(pairs.select(col("t_id").as("seed"))).distinct()
    val m = egoMembers(edges, seeds, radius, broadcastMaxRows)
      .transform(Materialize.apply) // reused as both cone sides of the meet
    val meets = pairs
      .join(m.select(col("seed").as("s_id"), col("id"), col("depth").as("df")), Seq("s_id"))
      .join(m.select(col("seed").as("t_id"), col("id"), col("depth").as("db")),
            Seq("t_id", "id"))
      .select(col("s_id"), col("t_id"), col("id"), (col("df") + col("db")).as("tot"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("s_id", "t_id")
    val best = meets.withColumn("dist", min(col("tot")).over(w))
      .filter(col("tot") === col("dist"))
      .groupBy("s_id", "t_id", "dist")
      .agg(count(lit(1)).as("n_meet"), min(col("id")).as("meet_min"))
    pairs.join(best, Seq("s_id", "t_id"), "left")
      .select(col("s_id"), col("t_id"),
              coalesce(col("dist"), lit(-1L)).as("dist"),
              coalesce(col("n_meet"), lit(0L)).as("n_meet"),
              coalesce(col("meet_min"), lit(-1L)).as("meet_min"))
  }

  /** Batched s–t STRONGEST connection via bidirectional meet-in-the-middle
    * on MAX-PRODUCT: for every (s_id, t_id) pair, the maximum-product chain
    * of ≤ 2·radius undirected weighted edges (weights in (0, 1] — ownership
    * shares), with the chain itself as a '->'-joined id string. The
    * analyst's follow-up to [[connectionDistance]]'s hop count: not "how
    * FAR apart are X and Y" but "how STRONG is the strongest link chain"
    * (reference README.md:13 UBO percentages × README.md:28 weighted
    * pathfinding).
    *
    * Exactness (the [[connectionDistance]] split argument carried to
    * max-product): a simple path of length L ≤ 2·radius splits at its
    * midpoint into halves of ≤ radius; each cone's per-cell value
    * best(m) — the [[Ubo.strongestChain]] recurrence run from every pair
    * endpoint as one batched owner set over the symmetrized edges —
    * dominates its half, so max over m of best_s(m)·best_t(m) ≥ the best
    * simple-path product. Conversely every meet value IS a walk product,
    * and with weights ≤ 1 a walk is dominated by the simple path inside it
    * (cycle factors only shrink the product), so the meet max EQUALS the
    * best simple-path product within the bound. The reported witness chain
    * is the deterministic argmax (strength DESC, chain ASC per pair — the
    * g39 tie rule); on ties the concatenated halves can share an interior
    * node (a walk), but its product still equals the simple-path optimum.
    *
    * Scale arithmetic as [[connectionDistance]]: two radius-k cones are
    * ~2·b^k rows vs ~b^2k single-source, and the per-cell rn=1 prune caps
    * each cone at |seeds| × |nodes| with ONE chain string per cell — never
    * a path enumeration. Pairs with no ≤ 2·radius connection report
    * strength 0, chain '-', hops −1.
    */
  def strongestConnections(edges: DataFrame, pairs: DataFrame, radius: Int): DataFrame = {
    val symw = edges.select(col("src"), col("dst"), col("weight"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
    val seeds = pairs.select(col("s_id").as("owner"))
      .unionByName(pairs.select(col("t_id").as("owner"))).distinct()
    // level-0 rows join the DP output so a pair can meet AT an endpoint
    // (hops_t = 0 ⇒ the whole chain lives in one cone); the re-rank uses
    // the same (share DESC, chain ASC) order, where the seed's own 1.0 row
    // wins every tie (its chain is a strict prefix, so it sorts first)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("owner"), col("entity"))
      .orderBy(col("share").desc, col("chain"))
    val lvl0 = seeds.select(col("owner"), col("owner").as("entity"),
      lit(1.0).cast("double").as("share"), col("owner").cast("string").as("chain"),
      lit(0).as("hops"))
    val cones = lvl0.unionByName(Ubo.strongestChain(symw, seeds, radius))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .transform(Materialize.apply) // reused as both meet sides
    val f = cones.select(col("owner").as("s_id"), col("entity").as("id"),
      col("share").as("share_s"), col("chain").as("chain_s"), col("hops").as("hops_s"))
    val b = cones.select(col("owner").as("t_id"), col("entity").as("id"),
      col("share").as("share_t"), col("chain").as("chain_t"), col("hops").as("hops_t"))
    // chain_t runs t→…→m; symmetric weights make its reversal m→…→t the
    // same product, so the full chain is chain_s ++ reverse(chain_t)[2:]
    // — string surgery on the ≤ |pairs|-dominated meet rows only, never
    // in the frontier (the g58 discipline)
    val rt = reverse(split(col("chain_t"), "->"))
    val meets = pairs.join(f, Seq("s_id")).join(b, Seq("t_id", "id"))
      .withColumn("strength", col("share_s") * col("share_t"))
      .withColumn("chain", concat_ws("->",
        concat(split(col("chain_s"), "->"), slice(rt, lit(2), size(rt) - 1))))
      .withColumn("hops", (col("hops_s") + col("hops_t")).cast("long"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("s_id", "t_id").orderBy(col("strength").desc, col("chain"))
    val best = meets.withColumn("rn", row_number().over(pw)).filter(col("rn") === 1)
      .select(col("s_id"), col("t_id"), round(col("strength"), 6).as("strength6"),
              col("chain"), col("hops"))
    pairs.join(best, Seq("s_id", "t_id"), "left")
      .select(col("s_id"), col("t_id"),
              coalesce(col("strength6"), lit(0.0)).as("strength6"),
              coalesce(col("chain"), lit("-")).as("chain"),
              coalesce(col("hops"), lit(-1L)).as("hops"))
  }

  /** [[strongestConnections]] AT each Time-Slider position: pairs carry an
    * `as_of` column; `edges` are a DATED per-position-renormalized
    * weighted web (as_of, src, dst, weight) — "how STRONG was the
    * strongest chain between X and Y in 1996?", completing the
    * {distance, strength} × {now, as-of} matrix with g57/g59/g60. The
    * batch key grows from owner to (owner, as_of) through
    * [[Ubo.strongestChainAsOf]] (the g56 free-batch-key argument on the
    * Viterbi recurrence), the meet joins gain as_of in their keys so no
    * strength leaks between positions, and the exactness argument is
    * [[strongestConnections]]'s walk-dominance split applied per position
    * (each as_of is an independent weighted graph with weights ≤ 1).
    */
  def strongestConnectionsAsOf(edges: DataFrame, pairs: DataFrame, radius: Int): DataFrame = {
    val symw = edges.select(col("as_of"), col("src"), col("dst"), col("weight"))
      .unionByName(edges.select(col("as_of"), col("dst").as("src"),
        col("src").as("dst"), col("weight")))
    val seeds = pairs.select(col("s_id").as("owner"), col("as_of"))
      .unionByName(pairs.select(col("t_id").as("owner"), col("as_of"))).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("owner"), col("as_of"), col("entity"))
      .orderBy(col("share").desc, col("chain"))
    val lvl0 = seeds.select(col("owner"), col("as_of"), col("owner").as("entity"),
      lit(1.0).cast("double").as("share"), col("owner").cast("string").as("chain"),
      lit(0).as("hops"))
    val cones = lvl0.unionByName(Ubo.strongestChainAsOf(symw, seeds, radius))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .transform(Materialize.apply) // reused as both meet sides
    val f = cones.select(col("owner").as("s_id"), col("as_of"), col("entity").as("id"),
      col("share").as("share_s"), col("chain").as("chain_s"), col("hops").as("hops_s"))
    val b = cones.select(col("owner").as("t_id"), col("as_of"), col("entity").as("id"),
      col("share").as("share_t"), col("chain").as("chain_t"), col("hops").as("hops_t"))
    val rt = reverse(split(col("chain_t"), "->"))
    val meets = pairs.join(f, Seq("s_id", "as_of")).join(b, Seq("t_id", "as_of", "id"))
      .withColumn("strength", col("share_s") * col("share_t"))
      .withColumn("chain", concat_ws("->",
        concat(split(col("chain_s"), "->"), slice(rt, lit(2), size(rt) - 1))))
      .withColumn("hops", (col("hops_s") + col("hops_t")).cast("long"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("s_id", "t_id", "as_of").orderBy(col("strength").desc, col("chain"))
    val best = meets.withColumn("rn", row_number().over(pw)).filter(col("rn") === 1)
      .select(col("s_id"), col("t_id"), col("as_of"),
              round(col("strength"), 6).as("strength6"), col("chain"), col("hops"))
    pairs.join(best, Seq("s_id", "t_id", "as_of"), "left")
      .select(col("s_id"), col("t_id"), col("as_of"),
              coalesce(col("strength6"), lit(0.0)).as("strength6"),
              coalesce(col("chain"), lit("-")).as("chain"),
              coalesce(col("hops"), lit(-1L)).as("hops"))
  }

  /** [[connectionDistance]] AT each Time-Slider position: pairs carry an
    * `as_of` column and the answer is the shortest undirected distance
    * over edges whose earliest instance had started by that date ("were X
    * and Y connected in 1996?" — README.md:17's slider × README.md:11's
    * navigation). The batch key grows from seed to the (seed, as_of) PAIR
    * exactly as [[egoMembersAsOf]] extends [[egoMembers]] (the g56
    * free-batch-key argument, verbatim): one traversal answers every
    * (pair, position), `radius` edge scans TOTAL, and the meet equi-join
    * gains as_of in its keys so no mass leaks between slider positions.
    * Same −1 beyond-2·radius contract and deterministic (n_meet,
    * meet_min) witnesses as the untimed form.
    */
  def connectionDistanceAsOf(edges: DataFrame, pairs: DataFrame, radius: Int,
                             broadcastMaxRows: Long = 4000000L): DataFrame = {
    val seeds = pairs.select(col("s_id").as("seed"), col("as_of"))
      .unionByName(pairs.select(col("t_id").as("seed"), col("as_of"))).distinct()
    val m = egoMembersAsOf(edges, seeds, radius, broadcastMaxRows)
      .transform(Materialize.apply) // reused as both cone sides of the meet
    val meets = pairs
      .join(m.select(col("seed").as("s_id"), col("as_of"), col("id"),
        col("depth").as("df")), Seq("s_id", "as_of"))
      .join(m.select(col("seed").as("t_id"), col("as_of"), col("id"),
        col("depth").as("db")), Seq("t_id", "as_of", "id"))
      .select(col("s_id"), col("t_id"), col("as_of"), col("id"),
              (col("df") + col("db")).as("tot"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("s_id", "t_id", "as_of")
    val best = meets.withColumn("dist", min(col("tot")).over(w))
      .filter(col("tot") === col("dist"))
      .groupBy("s_id", "t_id", "as_of", "dist")
      .agg(count(lit(1)).as("n_meet"), min(col("id")).as("meet_min"))
    pairs.join(best, Seq("s_id", "t_id", "as_of"), "left")
      .select(col("s_id"), col("t_id"), col("as_of"),
              coalesce(col("dist"), lit(-1L)).as("dist"),
              coalesce(col("n_meet"), lit(0L)).as("n_meet"),
              coalesce(col("meet_min"), lit(-1L)).as("meet_min"))
  }

  def capEgoMembers(edges: DataFrame, members: DataFrame, cap: Int,
                    broadcastMaxRows: Long = 4000000L): DataFrame = {
    require(cap >= 1, s"cap must keep at least the seed, got $cap")
    val m = members.select(col("seed"), col("id"), col("depth"))
      .transform(Materialize.apply)
    val ind = inducedEdges(edges.select(col("src"), col("dst"), col("weight")),
      m, broadcastMaxRows)
    val strength = ind.select(col("seed"), col("src").as("id"), col("weight"))
      .unionByName(ind.select(col("seed"), col("dst").as("id"), col("weight")))
      .groupBy("seed", "id").agg(sum(col("weight")).as("strength"))
    val bySeed = org.apache.spark.sql.expressions.Window.partitionBy("seed")
    val rank = bySeed.orderBy(col("depth").asc, col("strength").desc_nulls_last, col("id").asc)
    m.join(strength, Seq("seed", "id"), "left")
      .withColumn("rnk", row_number().over(rank))
      .withColumn("n_total", count(lit(1)).over(bySeed))
      .filter(col("rnk") <= cap)
      .select(col("seed"), col("id"), col("depth"), col("n_total"))
  }

  /** [[capEgoMembers]] for the Time-Slider's (seed, as_of) members
    * ([[egoMembersAsOf]] output): same depth-then-induced-strength-then-id
    * ranking, per (seed, as_of) WINDOW — a LOCATED_IN hub ego that grows
    * linearly with the board (the SCALE.md s09 caveat) is truncated per
    * slider position instead of emitting an unbounded document, and the
    * pre-cap `n_total` rides along so a consumer can SEE the truncation.
    * Strength is the member's incident edge weight within the position's
    * OWN induced snapshot ([[inducedEdgesAsOf]] — validity-filtered), so
    * prominence reflects the frame being drawn, not a later year's edges.
    * The seed survives at every position (depth 0 dominates the ranking).
    */
  def capEgoMembersAsOf(edges: DataFrame, members: DataFrame, cap: Int,
                        broadcastMaxRows: Long = 4000000L): DataFrame = {
    require(cap >= 1, s"cap must keep at least the seed, got $cap")
    val m = members.select(col("seed"), col("as_of"), col("id"), col("depth"))
      .transform(Materialize.apply)
    val ind = inducedEdgesAsOf(
      edges.select(col("src"), col("dst"), col("weight"), col("valid_from")),
      m, broadcastMaxRows)
    val strength = ind.select(col("seed"), col("as_of"), col("src").as("id"), col("weight"))
      .unionByName(ind.select(col("seed"), col("as_of"), col("dst").as("id"), col("weight")))
      .groupBy("seed", "as_of", "id").agg(sum(col("weight")).as("strength"))
    val byPos = org.apache.spark.sql.expressions.Window.partitionBy("seed", "as_of")
    val rank = byPos.orderBy(col("depth").asc, col("strength").desc_nulls_last, col("id").asc)
    m.join(strength, Seq("seed", "as_of", "id"), "left")
      .withColumn("rnk", row_number().over(rank))
      .withColumn("n_total", count(lit(1)).over(byPos))
      .filter(col("rnk") <= cap)
      .select(col("seed"), col("as_of"), col("id"), col("depth"), col("n_total"))
  }
}
