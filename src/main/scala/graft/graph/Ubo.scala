package graft.graph

import graft.Tables
import graft.Tables.dec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UBO-style ownership propagation (reference: "Automatically calculate …
  * Ultimate Beneficial Owners", /root/reference/README.md:13; cycle safety
  * per README.md:15 "circular ownership loops").
  *
  * Semantics: share(owner → entity) = Σ over all paths of Π edge weights,
  * computed as `steps` matrix-power iterations (join + groupBy-sum per step).
  * A step count is a depth cap — on cyclic graphs the propagation is bounded
  * by construction, the documented cycle-safe semantics (SURVEY.md §7.3.2).
  *
  * Scale posture: each step is a shuffle join keyed on the current entity —
  * the frontier stays (owner, entity)-aggregated, so size is bounded by
  * |owners| × |entities| regardless of path multiplicity (no path-enumeration
  * blowup). `localCheckpoint` every 3 steps truncates lineage.
  *
  * Numeric discipline: weights are ratios of exact decimal sums (deterministic
  * doubles in both engines); path-sum aggregation is float-order-dependent, so
  * graded outputs round to 6 decimals (SURVEY.md §5.3 rule 2).
  */
object Ubo {
  import GraphBuilder._

  /** Normalized 3-layer ownership DAG: customer -(1/n_orders)-> order
    * -(qty share)-> part -(supply share)-> supplier. Out-weights sum to 1.0
    * per source node, the ownership-percentage invariant.
    */
  def placedEdges(t: Tables): DataFrame = t.orders
    .select((lit(CustomerBase) + col("o_custkey")).as("src"),
            (lit(OrderBase) + col("o_orderkey")).as("dst"))
    .withColumn("weight", lit(1.0) / count(lit(1)).over(Window.partitionBy(col("src"))))
    .select(col("src"), col("dst"), col("weight"))

  def containsEdges(t: Tables): DataFrame = t.lineitem
    .groupBy(col("l_orderkey"), col("l_partkey"))
    .agg(sum(dec(col("l_quantity"))).as("qty"))
    .withColumn("total", sum(col("qty")).over(Window.partitionBy(col("l_orderkey"))))
    .select((lit(OrderBase) + col("l_orderkey")).as("src"),
            (lit(PartBase) + col("l_partkey")).as("dst"),
            (col("qty").cast("double") / col("total").cast("double")).as("weight"))

  def suppliedByEdges(t: Tables): DataFrame = t.lineitem
    .groupBy(col("l_partkey"), col("l_suppkey"))
    .agg(sum(dec(col("l_quantity"))).as("qty"))
    .withColumn("total", sum(col("qty")).over(Window.partitionBy(col("l_partkey"))))
    .select((lit(PartBase) + col("l_partkey")).as("src"),
            (lit(SupplierBase) + col("l_suppkey")).as("dst"),
            (col("qty").cast("double") / col("total").cast("double")).as("weight"))

  def uboEdges(t: Tables): DataFrame =
    placedEdges(t).unionByName(containsEdges(t)).unionByName(suppliedByEdges(t))

  /** Collapsed INTERACTED user pairs with multiplicity (single-sourced from
    * [[GraphBuilder.userTransitions]]).
    */
  def interactedPairs(t: Tables): DataFrame =
    GraphBuilder.userTransitions(t)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("cnt"))

  /** Out-normalized INTERACTED user graph — cyclic, for the depth-capped
    * propagation demo. weight(u,v) = cnt(u,v) / out_cnt(u).
    */
  def interactedWeighted(t: Tables): DataFrame =
    interactedPairs(t)
      .withColumn("weight",
        col("cnt").cast("double") / sum(col("cnt")).over(Window.partitionBy(col("src"))).cast("double"))
      .select(col("src"), col("dst"), col("weight"))

  /** `steps` propagation iterations of (owner, entity, share) over
    * (src, dst, weight) edges. Matrix-power semantics: shares over parallel
    * paths sum at every step.
    *
    * `epsilon`: prune (owner, entity) pairs whose share drops below it after
    * each step — THE scale lever. Without it, a fast-mixing graph degrades to
    * |owners|×|entities| dense state times out-degree per step (observed:
    * 30 s at sf0.1 on the cyclic user graph). Pruned semantics are part of
    * the operator contract and mirrored exactly in the oracle SQL (HAVING
    * share >= eps per step), per SURVEY.md §7.3.2.
    */
  def propagate(edges: DataFrame, init: DataFrame, steps: Int,
                epsilon: Option[Double] = None): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("weight")).transform(Materialize.apply)
    propagateLayers(Seq.fill(steps)(e), init, epsilon, materializeLayers = false)
  }

  /** Layered variant: step k joins only `layers(k)` — on a layered DAG
    * (customer→order→part→supplier) each step's probe side shrinks to the
    * one relevant edge set instead of the full union. Identical results to
    * [[propagate]] when layers partition the edges by source type (a join on
    * `entity = src` can only ever match the matching layer).
    */
  def propagateLayers(layers: Seq[DataFrame], init: DataFrame,
                      epsilon: Option[Double] = None,
                      materializeLayers: Boolean = true): DataFrame = {
    var own = init.select(col("owner"), col("entity"), col("share"))
    var i = 1
    layers.foreach { layer =>
      val e0 = layer.select(col("src"), col("dst"), col("weight"))
      val e = if (materializeLayers) e0.transform(Materialize.apply) else e0
      own = step(own, e, epsilon)
      if (i % 3 == 0) own = own.transform(Materialize.apply)
      i += 1
    }
    own
  }

  /** [[propagateLayers]] batched over SNAPSHOT DATES: layers and state both
    * carry an `as_of` column and each step joins on (entity = src AND
    * as_of = as_of) — every slider position's ownership cone propagates in
    * the SAME three joins (the g53 free-batch-key argument extended from
    * the owner column to the date axis: state is bounded by
    * |owners| × |dates| × cone, and k dates never re-run the plan). The
    * per-date layers themselves are built by the CALLER from conditional
    * aggregates over one scan — this function only contracts that the
    * join respects the date key, so share mass never leaks between
    * slider positions.
    */
  def propagateLayersAsOf(layers: Seq[DataFrame], init: DataFrame): DataFrame = {
    var own = init.select(col("owner"), col("as_of"), col("entity"), col("share"))
    var i = 1
    layers.foreach { layer =>
      val e = layer.select(col("as_of").as("e_as_of"), col("src"), col("dst"), col("weight"))
      own = graft.rel.Regroup.aggregateByNewKeys(
          own.join(e, col("entity") === col("src") && col("as_of") === col("e_as_of")),
          groupKeys = Seq(col("owner"), col("as_of"), col("dst")),
          aggs = Seq(sum(col("share") * col("weight")).as("share")))
        .select(col("owner"), col("as_of"), col("dst").as("entity"), col("share"))
      if (i % 3 == 0) own = own.transform(Materialize.apply)
      i += 1
    }
    own
  }

  /** Strongest-ownership-chain DP (reference README.md:11,13 — showing THE
    * chain behind a UBO figure): per (owner, target), the maximum-product
    * path of ≤ maxHops edges, with the chain itself reconstructed as a
    * '->'-joined id string (g05's path convention). A compliance user asks
    * "through which chain does X control Y?" — [[propagate]] answers with
    * the SUM over all paths; this answers with the argmax path.
    *
    * Viterbi-style bounded dynamic program over unrolled steps: frontier i
    * holds, per (owner, entity), the best EXACTLY-i-hop path (share +
    * chain), pruned to one row per cell by (share DESC, chain ASC). The
    * per-step prune loses nothing: every extension multiplies by the same
    * edge weight, so the best prefix stays best (max-product optimal
    * substructure — the min-plus/−log-weight DP without the log round
    * trip; weights ≤ 1 so products only shrink), and equal-hop chains to
    * the same node never string-prefix each other (same component count),
    * so the ASC tie order is extension-invariant. Walk semantics: with
    * weights ≤ 1, any walk revisiting a node is dominated by the simple
    * path it contains, so the DP's argmax VALUE equals the simple-path
    * argmax; GraphAlgosSpec cross-checks the values against a GraphX
    * Pregel max-product run ([[Algorithms.maxProductGraphX]]).
    *
    * Scale posture: state is capped at |owners| × |nodes| rows per step BY
    * CONSTRUCTION (the rn=1 prune), each step one equi-join on the entity
    * key plus one (owner, entity)-partitioned window — the bounded-owner
    * drill-down contract of [[propagate]]'s cyclic form, with a ≤
    * maxHops+1-id string column riding along. Mirrored step-for-step by
    * [[UboSql.chainStep]].
    */
  def strongestChain(edges: DataFrame, owners: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("weight")).transform(Materialize.apply)
    val w = Window.partitionBy(col("owner"), col("entity"))
      .orderBy(col("share").desc, col("chain"))
    var frontier = owners.select(col("owner")).distinct()
      .select(col("owner"), col("owner").as("entity"), lit(1.0).as("share"),
              col("owner").cast("string").as("chain"))
    var best: DataFrame = null
    for (i <- 1 to maxHops) {
      frontier = frontier.join(e, col("entity") === col("src"))
        .select(col("owner"), col("dst").as("entity"),
                (col("share") * col("weight")).as("share"),
                concat(col("chain"), lit("->"), col("dst").cast("string")).as("chain"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .transform(Materialize.apply) // reused: level output + next join
      val lvl = frontier.withColumn("hops", lit(i))
      best = if (best == null) lvl else best.unionByName(lvl)
    }
    best.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** [[strongestChain]] AT each Time-Slider position: `edges` carry an
    * `as_of` column (a DATED, per-date-renormalized web — see
    * GraphQueries.datedUboLayers) and `owners` carry (owner, as_of); the
    * DP runs per position by adding as_of to the step-join and argmax-
    * window keys — the g56 free-batch-key argument applied to the Viterbi
    * recurrence: positions ride the state width, never extra passes. The
    * per-step rn=1 prune and its optimal-substructure proof are unchanged
    * (each position is an independent weighted graph). Mirrored by
    * [[UboSql.chainStepAsOf]].
    */
  def strongestChainAsOf(edges: DataFrame, owners: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("as_of").as("e_as_of"), col("src"), col("dst"), col("weight"))
      .transform(Materialize.apply)
    val w = Window.partitionBy(col("owner"), col("as_of"), col("entity"))
      .orderBy(col("share").desc, col("chain"))
    var frontier = owners.select(col("owner"), col("as_of")).distinct()
      .select(col("owner"), col("as_of"), col("owner").as("entity"),
              lit(1.0).as("share"), col("owner").cast("string").as("chain"))
    var best: DataFrame = null
    for (i <- 1 to maxHops) {
      frontier = frontier.join(e,
          col("entity") === col("src") && col("as_of") === col("e_as_of"))
        .select(col("owner"), col("as_of"), col("dst").as("entity"),
                (col("share") * col("weight")).as("share"),
                concat(col("chain"), lit("->"), col("dst").cast("string")).as("chain"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .transform(Materialize.apply) // reused: level output + next join
      val lvl = frontier.withColumn("hops", lit(i))
      best = if (best == null) lvl else best.unionByName(lvl)
    }
    best.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** One propagation step. The step is the canonical
    * [[graft.rel.Regroup.aggregateByNewKeys]] case — all three conditions
    * of its decision rule hold here: the join fans out (130M rows from a
    * 15M-row frontier at sf0.8), the group keys (owner, dst) differ from
    * the join key (entity = src), and the default plan's partial-agg map
    * spills. Exchanging the fan-out on the group keys before aggregating
    * made the isolated step 54.7 → 10.0 s and halved whole-query g03 at
    * sf0.8 (SCALE.md round 8); the probes cited in Regroup's scaladoc
    * also record where the same move does NOT pay (l03, g11).
    */
  def step(own: DataFrame, layer: DataFrame,
           epsilon: Option[Double] = None): DataFrame = {
    var next = graft.rel.Regroup.aggregateByNewKeys(
      own.join(layer, col("entity") === col("src")),
      groupKeys = Seq(col("owner"), col("dst")),
      aggs = Seq(sum(col("share") * col("weight")).as("share")))
    epsilon.foreach(eps => next = next.filter(col("share") >= eps))
    next.select(col("owner"), col("dst").as("entity"), col("share"))
  }
}

/** DuckDB mirrors for [[Ubo]] — MUST stay in lockstep with the Spark code. */
object UboSql {
  val uboEdgesCte: String =
    """ubo_edges AS (
      |  SELECT 3000000000 + o_custkey AS src, 6000000000 + o_orderkey AS dst,
      |         CAST(1.0 AS DOUBLE) / COUNT(*) OVER (PARTITION BY o_custkey) AS weight
      |  FROM orders
      |  UNION ALL
      |  SELECT 6000000000 + l_orderkey, 5000000000 + l_partkey,
      |         CAST(qty AS DOUBLE) / CAST(SUM(qty) OVER (PARTITION BY l_orderkey) AS DOUBLE)
      |  FROM (SELECT l_orderkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty FROM lineitem GROUP BY 1, 2)
      |  UNION ALL
      |  SELECT 5000000000 + l_partkey, 4000000000 + l_suppkey,
      |         CAST(qty AS DOUBLE) / CAST(SUM(qty) OVER (PARTITION BY l_partkey) AS DOUBLE)
      |  FROM (SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty FROM lineitem GROUP BY 1, 2)
      |)""".stripMargin

  /** Collapsed INTERACTED pairs with multiplicity (cnt kept for thresholds). */
  val interactedPairsCte: String =
    """ie_pairs AS (
      |  SELECT 7000000000 + prev AS src, 7000000000 + user_id AS dst, COUNT(*) AS cnt
      |  FROM (SELECT user_id, ts, event_id, LAG(user_id) OVER (ORDER BY ts, event_id) AS prev FROM events)
      |  WHERE prev IS NOT NULL AND prev <> user_id GROUP BY 1, 2
      |)""".stripMargin

  val interactedWeightedCte: String = interactedPairsCte + """,
      |ie_edges AS (
      |  SELECT src, dst, CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER (PARTITION BY src) AS DOUBLE) AS weight
      |  FROM ie_pairs
      |)""".stripMargin

  /** One unrolled propagation step (the CTE equivalent of one loop pass).
    * `epsilon` mirrors Ubo.propagate's per-step pruning.
    */
  def step(prev: String, cur: String, edges: String, epsilon: Option[Double] = None): String = {
    val having = epsilon.map(e => s" HAVING SUM(p.share * e.weight) >= $e").getOrElse("")
    s"""$cur AS (
       |  SELECT p.owner, e.dst AS entity, SUM(p.share * e.weight) AS share
       |  FROM $prev p JOIN $edges e ON e.src = p.entity GROUP BY 1, 2$having)""".stripMargin
  }

  /** One unrolled [[Ubo.strongestChain]] DP step: extend every frontier
    * cell by one edge, keep the (share DESC, chain ASC) argmax per
    * (owner, entity). The window sits in an outer subquery so both engines
    * rank the SAME computed (share, chain) values.
    */
  def chainStep(prev: String, cur: String, edges: String): String =
    s"""$cur AS (
       |  SELECT owner, entity, share, chain FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY owner, entity
       |                                 ORDER BY share DESC, chain) AS rn
       |    FROM (SELECT p.owner, e.dst AS entity, p.share * e.weight AS share,
       |                 p.chain || '->' || CAST(e.dst AS VARCHAR) AS chain
       |          FROM $prev p JOIN $edges e ON e.src = p.entity))
       |  WHERE rn = 1)""".stripMargin

  /** [[chainStep]] with the slider position in the join and window keys —
    * the mirror of [[Ubo.strongestChainAsOf]]'s step. */
  def chainStepAsOf(prev: String, cur: String, edges: String): String =
    s"""$cur AS (
       |  SELECT owner, as_of, entity, share, chain FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY owner, as_of, entity
       |                                 ORDER BY share DESC, chain) AS rn
       |    FROM (SELECT p.owner, p.as_of, e.dst AS entity, p.share * e.weight AS share,
       |                 p.chain || '->' || CAST(e.dst AS VARCHAR) AS chain
       |          FROM $prev p JOIN $edges e ON e.src = p.entity AND e.as_of = p.as_of))
       |  WHERE rn = 1)""".stripMargin
}
