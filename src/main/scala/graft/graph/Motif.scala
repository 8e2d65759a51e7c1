package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One hop of an edge-chain motif: `(prev)-[relType]->(alias)`, or the
  * reverse direction when `reversed` (i.e. `(prev)<-[relType]-(alias)` —
  * the hop still EXTENDS the chain at `alias`, only the edge's stored
  * orientation flips, which is how conflict patterns walk back down a
  * shared attribute: a-PLACED->o1-CONTAINS->p<-CONTAINS-o2<-PLACED-b).
  *
  * Temporal predicates bind each hop's edge date to the PREVIOUS hop's:
  *  - `timeOrdered`: this edge fires no earlier than the previous one
  *    (the time-respecting-path rule of g34, Holme & Saramäki 2012);
  *  - `maxDelay`: additionally within a window, e.g. "1 HOUR" — the
  *    Δ-windowed motif rule of g35 (Paranjape/Benson/Leskovec 2017).
  * Both compare `valid_from` and therefore DROP undated edges (null
  * never satisfies the comparison) — a temporal motif over undated
  * edges is meaningless, so that is the semantics a caller wants.
  *
  * `repeat = Some((lo, hi))` makes this a VARIABLE-LENGTH hop (Cypher
  * `-[:T*lo..hi]->`, 0 ≤ lo ≤ hi, hi ≥ 1). `lo = 0` is Cypher's
  * ZERO-LENGTH match (`*0..hi` — "the node and its reachables"): the
  * hop's alias additionally binds the ENTRY node itself, with this
  * hop's time and weight columns null (no edge was traversed — so a
  * LATER hop chained with `timeOrdered`/`maxDelay` drops those rows,
  * the same null-comparison rule as undated edges). For lo ≥ 1, the
  * pattern matches lo to hi
  * consecutive edges, every one filtered by this hop's `relType` and
  * walked in this hop's direction, with INTERMEDIATE nodes anonymous —
  * only the terminal node binds `alias` (and `label`, if given).
  * `timeOrdered`/`maxDelay` then chain through EVERY consecutive edge
  * pair inside the repetition (and bind its first edge to the previous
  * hop, exactly like a fixed hop), so a repeated hop is a bounded
  * time-respecting reachability step (g34's rule as a pattern element).
  * The hop's output time column is its LAST edge's `valid_from`. Default
  * is WALK semantics: intermediates may revisit nodes (no trail guard) —
  * the same multiplicity a hand-unrolled join chain produces; `hi`
  * bounds the expansion, so state stays hi × one join chain, never
  * recursive.
  *
  * `unique = true` (repeated hops only) switches the repetition to
  * NODE-TRAIL semantics: the hop's entry node, every intermediate, and
  * the terminal are pairwise distinct — the simple-path guard
  * [[Traversals.simplePaths]] uses (path-accumulator + `array_contains`),
  * carried as an array column through the unrolled levels. This is the
  * Spark rendering of Cypher's uniqueness on `-[:T*lo..hi]->` (Neo4j
  * default is relationship-uniqueness; on the cyclic ownership graphs
  * the reference targets — README.md:15 "circular ownership" — walks
  * overcount reach, and node-trail is the stricter, chain-shaped
  * semantics a compliance query wants: no entity appears twice in one
  * chain). Uniqueness is LOCAL to the repeated hop — constraints against
  * OTHER aliases in the pattern stay `notEqual`'s job. MotifSpec proves
  * walk vs trail counts differ on a deliberately cyclic fixture and that
  * trail matches a hand-unrolled pairwise-guard join.
  *
  * `undirected = true` matches the edge in EITHER stored orientation
  * (Cypher `(a)-[r]-(b)`): the hop lowers over the two-orientation union
  * of the edge frame — plan-wise one extra union branch feeding the same
  * single equi-join, so the hop still costs one shuffle on node ids.
  * Mutually exclusive with `reversed` (an undirected hop has no
  * direction to flip). MotifSpec proves it equals the union of the
  * forward and reversed patterns.
  *
  * `edgeFilter` is an arbitrary predicate over the EDGE frame's columns
  * (`weight`, `valid_from`, `rel_type`, `src`, `dst`) — Cypher's
  * relationship-property predicate (`-[r:OWNS WHERE r.share >= 0.25]->`).
  * It is applied to the edge frame BEFORE the hop join (same plan slot
  * as the `relType` literal filter, so Catalyst pushes it below the
  * join and, when the predicate reaches a parquet column, into the
  * scan). On a repeated hop it constrains EVERY edge of the repetition —
  * the per-link threshold rule (e.g. the FATF/AMLD "each link ≥ 25%"
  * beneficial-ownership chain test), which prunes the frontier at every
  * level rather than post-filtering an enumerated path set.
  *
  * `from` names the ALREADY-BOUND alias this hop extends from (default:
  * the previous hop's alias, i.e. a linear chain). With it, patterns
  * BRANCH — Cypher's `(a)-[:X]->(b), (a)-[:Y]->(c)` star shape, e.g.
  * "the same customer placed the order AND sits in the nation": each
  * branch is still one equi-join on a node id, so a tree-shaped pattern
  * of k hops costs exactly the k shuffles of its chain-shaped
  * linearization. Temporal chaining (`timeOrdered`/`maxDelay`) always
  * binds to the previous hop in PATTERN ORDER (t_{i-1}), independent of
  * `from` — document order is the timeline a pattern author reads.
  *
  * `closes = true` makes this hop CLOSE A CYCLE: `alias` must name an
  * already-bound node alias, and the hop matches an edge from `from`
  * (default: previous alias) back to THAT node — Cypher's
  * `(b)-[:OWNS]->(a)` with `a` bound earlier, the circular-ownership
  * pattern (README.md:15) as a pattern element. No new node column is
  * bound (the hop contributes its edge's t/w columns only); the
  * closing condition lowers to an equality filter on the hop join's far
  * side, so Catalyst evaluates it as a residual predicate on the same
  * single equi-join — a k-cycle costs the same k shuffles as a k-chain.
  * Mutually exclusive with `repeat` (close a variable-length cycle by
  * repeating INTO a terminal alias, then closing with a fixed hop),
  * `optional`, and `unique`.
  *
  * `optional = true` is Cypher's `OPTIONAL MATCH` for this hop: rows of
  * the chain so far that have NO matching edge survive with this hop's
  * alias, time, and weight columns null, instead of being dropped — the
  * hop lowers to a LEFT OUTER join (same equi-key, same one shuffle;
  * temporal predicates move into the join condition so they decide
  * matchedness rather than killing the preserved null rows, and a
  * `label` constraint pre-filters the edge side's far node before the
  * join — a post-hoc semi-join would drop the preserved rows). Null
  * propagation then follows Cypher: a later non-optional hop joining
  * through a null alias finds no match and drops the row, and a
  * `notEqual` against a null alias excludes the row (SQL three-valued
  * logic — the same outcome a Cypher `WHERE a <> b` gives). Not allowed
  * on the first hop (the chain must start from a matched edge; start
  * from the other end or a prior hop instead) nor on a repeated hop
  * (Cypher expresses that as `*0..hi`, a different feature).
  */
final case class Hop(
    alias: String,
    relType: Option[String] = None,
    label: Option[String] = None,
    reversed: Boolean = false,
    timeOrdered: Boolean = false,
    maxDelay: Option[String] = None,
    repeat: Option[(Int, Int)] = None,
    unique: Boolean = false,
    undirected: Boolean = false,
    edgeFilter: Option[Column] = None,
    optional: Boolean = false,
    from: Option[String] = None,
    closes: Boolean = false) {
  repeat.foreach { case (lo, hi) =>
    require(0 <= lo && lo <= hi && hi >= 1,
      s"repeat bounds must satisfy 0 <= lo <= hi and hi >= 1, got ($lo, $hi)")
  }
  require(!(optional && repeat.isDefined),
    "optional applies to fixed hops; an optional repetition is Cypher *0..hi — " +
      "model it with repeat lower bound semantics, not OPTIONAL MATCH")
  require(!(closes && repeat.isDefined),
    "a closing hop is fixed — repeat into a terminal alias, then close with a fixed hop")
  require(!(closes && optional), "an optional closing hop is not supported")
  require(!(closes && unique), "unique applies to repetitions; a closing hop is fixed")
  require(!(closes && label.isDefined),
    "a closing hop targets an already-bound alias — constrain its label where it is bound")
  require(!unique || repeat.isDefined,
    "unique (trail semantics) applies to variable-length hops; " +
      "for fixed hops express node constraints with Motif.notEqual")
  require(!(reversed && undirected),
    "reversed and undirected are mutually exclusive — an undirected hop matches both orientations")
}

/** Declarative edge-chain pattern over a [[PropertyGraph]] — the general
  * form of the hand-built join chains (g11's shared-attribute conflict,
  * g35's temporal relay, g36's dated supply chain). The reference's Neo4j
  * stack implies Cypher-style patterns (/root/reference/README.md:25);
  * this is the Spark-native rendering: each hop lowers to ONE equi-join
  * on a node id, so Catalyst sees a plain join chain — rel_type literal
  * filters prune the edge-union's other branches at plan time, labels
  * become broadcast semi-joins against the (small) node table, temporal
  * predicates stay residual (no extra shuffle), and AQE/broadcast/skew
  * treatment applies hop by hop exactly as it does to the hand-built
  * queries this API generalizes (MotifSpec proves g11/g35 are reproduced
  * verbatim). At 100 TB a k-hop motif is k shuffles on node ids — the
  * same cost as writing the joins by hand; there is no driver-side state.
  *
  * `notEqual` expresses the cross-step inequality constraints patterns
  * need (g11's `cust_a < cust_b` generalization, g35's `u ≠ w`).
  * General cross-alias WHERE predicates need no API surface: every
  * node alias and per-hop t/w column is exposed in the returned
  * DataFrame, so arbitrary Cypher-WHERE logic is an ordinary
  * `.filter` over the result (g42/g43 canonicalize with `a < b` this
  * way) — Catalyst pushes deterministic predicates into the join chain
  * exactly as if the API had taken them.
  *
  * `edgeUnique = true` is Cypher's DEFAULT uniqueness for a MATCH
  * pattern: no two hops may bind the same relationship (nodes may
  * repeat). The third uniqueness mode alongside walk (default — the
  * multiplicity of a hand-unrolled join chain) and node-trail
  * (`Hop.unique` inside a repetition). Lowered by carrying each hop's
  * STORED edge endpoints through the chain and pairwise-excluding rows
  * where two hops bound the same (src, dst, valid_from, weight) tuple —
  * property identity, which equals edge identity except for fully
  * indistinguishable parallel edges (same endpoints, date, AND weight),
  * where excluding one of an indistinguishable pair is observationally
  * equivalent anyway. The filters are residual predicates after the
  * joins (no extra shuffle); unmatched OPTIONAL hops (all-null
  * identity) are never excluded. Fixed-hop patterns only — inside a
  * repetition use node-trail `unique`, which is strictly stronger.
  */
final case class Motif(
    start: String,
    startLabel: Option[String] = None,
    hops: Seq[Hop],
    notEqual: Seq[(String, String)] = Nil,
    emitWeights: Boolean = false,
    edgeUnique: Boolean = false) {
  require(hops.nonEmpty, "motif needs at least one hop")
  require(!edgeUnique || hops.forall(_.repeat.isEmpty),
    "edgeUnique applies to fixed-hop patterns — use per-hop `unique` (node trail) " +
      "inside a repetition")
  /** Node aliases the pattern binds, in binding order (closing hops bind none). */
  private[graph] val aliases: Seq[String] = start +: hops.filterNot(_.closes).map(_.alias)
  require(aliases.distinct.size == aliases.size,
    s"motif node aliases must be unique, got $aliases")
  /** Entry alias of hop i: explicit `from`, else the previous hop's alias. */
  private[graph] def entry(i: Int): String =
    hops(i).from.getOrElse(if (i == 0) start else hops(i - 1).alias)
  hops.zipWithIndex.foreach { case (h, i) =>
    val bound = start +: hops.take(i).filterNot(_.closes).map(_.alias)
    require(i > 0 || h.from.forall(_ == start),
      "the first hop starts the chain — `from` must be absent or equal to start")
    require(i > 0 || !h.optional,
      "the first hop cannot be optional — the chain must start from a matched edge")
    h.from.foreach(f => require(bound.contains(f),
      s"hop '${h.alias}': from='$f' is not bound yet (bound: $bound)"))
    if (h.closes) require(bound.contains(h.alias),
      s"closing hop must target an already-bound alias, '${h.alias}' is not (bound: $bound)")
  }
}

object Motif {

  /** Match the pattern; one output row per bound edge tuple (multigraph
    * semantics — the same row multiplicity the hand-built chains produce;
    * callers dedup/aggregate downstream, e.g. g11's DISTINCT projection).
    * Output columns: every node alias in chain order, then `t1..tk` — the
    * `valid_from` of each hop's edge — so callers can aggregate on dates
    * without re-deriving them. With `emitWeights`, additionally `w1..wk`:
    * hop i's edge weight, or for a repeated hop the MINIMUM weight across
    * its edges — the chain's bottleneck (weakest-link) share, which is
    * what an ownership-threshold query reports per matched chain.
    */
  def find(g: PropertyGraph, m: Motif): DataFrame = {
    def labelIds(label: String): DataFrame =
      g.nodes.filter(col("label") === label).select(col("id").as("__lbl"))
    // Label constraint = semi-join against the node table's matching ids;
    // broadcast explicitly — node-id sets are dwarfed by edge tables at
    // every scale, and a semi-join must never shuffle the accumulated
    // chain just to check a label.
    def constrain(df: DataFrame, alias: String, label: Option[String]): DataFrame =
      label.fold(df)(l =>
        df.join(broadcast(labelIds(l)), col(alias) === col("__lbl"), "left_semi"))

    var acc: DataFrame = null
    m.hops.zipWithIndex.foreach { case (h, i) =>
      var e = g.edges
      h.relType.foreach(rt => e = e.filter(col("rel_type") === rt))
      h.edgeFilter.foreach(p => e = e.filter(p))
      val (near, far) = if (h.reversed) ("dst", "src") else ("src", "dst")
      val t = s"t${i + 1}"
      // one edge step with fresh column names (suffix keeps repeated
      // self-joins of the same edge frame unambiguous); an undirected hop
      // unions the two orientations BEFORE the join, so it stays one
      // equi-join (Catalyst pushes the rel_type filter into both branches)
      def step(sfx: String): DataFrame = {
        // edgeUnique carries the STORED orientation as the edge's identity —
        // identical in both branches of an undirected union, so a back-and-
        // forth rebind of one edge is recognized as the same edge
        def eid(sel: Seq[Column]): Seq[Column] =
          if (m.edgeUnique)
            sel ++ Seq(col("src").as(s"__es$sfx"), col("dst").as(s"__ed$sfx"))
          else sel
        val fwd = e.select(eid(Seq(
          col(near).as(s"__n$sfx"), col(far).as(s"__f$sfx"),
          col("valid_from").as(s"__t$sfx"), col("weight").as(s"__w$sfx"))): _*)
        if (!h.undirected) fwd
        else fwd.unionByName(e.select(eid(Seq(
          col(far).as(s"__n$sfx"), col(near).as(s"__f$sfx"),
          col("valid_from").as(s"__t$sfx"), col("weight").as(s"__w$sfx"))): _*))
      }
      // bind the FIRST edge of this hop onto the chain (or start it),
      // applying the previous-hop temporal predicates. An OPTIONAL hop
      // left-joins instead, with the temporal predicates folded into the
      // join condition (a post-join filter would evaluate to null on the
      // preserved rows and drop them — exactly the rows OPTIONAL keeps)
      // and the label constraint pre-applied to the edge side's far node.
      def first(): DataFrame = {
        require(!(i == 0 && h.optional),
          "the first hop cannot be optional — the chain must start from a matched edge")
        if (h.optional) {
          var st = step("0")
          h.label.foreach(l =>
            st = st.join(broadcast(labelIds(l)), col("__f0") === col("__lbl"), "left_semi"))
          var cond = col(m.entry(i)) === col("__n0")
          if (h.timeOrdered) cond = cond && col("__t0") >= col(s"t$i")
          h.maxDelay.foreach(d =>
            cond = cond && col("__t0") <= col(s"t$i") + expr(s"INTERVAL $d"))
          acc.join(st, cond, "left").drop("__n0")
        } else {
          var df =
            if (i == 0) constrain(step("0").withColumnRenamed("__n0", m.start), m.start, m.startLabel)
            else acc.join(step("0"), col(m.entry(i)) === col("__n0")).drop("__n0")
          if (i > 0) {
            if (h.timeOrdered) df = df.filter(col("__t0") >= col(s"t$i"))
            h.maxDelay.foreach(d =>
              df = df.filter(col("__t0") <= col(s"t$i") + expr(s"INTERVAL $d")))
          }
          df
        }
      }
      // a closing hop binds no new node: the far side must EQUAL the
      // already-bound target alias (residual equality on the same join)
      def emit(df: DataFrame): DataFrame =
        (if (h.closes) df.filter(col("__f0") === col(h.alias)).drop("__f0")
         else df.withColumnRenamed("__f0", h.alias))
          .withColumnRenamed("__t0", t)
          .withColumnRenamed("__w0", s"w${i + 1}")
          .withColumnRenamed("__es0", s"__e${i + 1}s")
          .withColumnRenamed("__ed0", s"__e${i + 1}d")
          .drop("__vis")
      acc = h.repeat match {
        case None => emit(first())
        case Some((lo, hi)) =>
          // bounded variable-length expansion: extend edge by edge, the
          // walk head riding in (__f0, __t0); union the levels in
          // [lo, hi]. Each level is ONE more equi-join on node ids — the
          // kHop join shape, unrolled (hi is a small pattern constant, so
          // no checkpoint/recursion machinery is warranted here).
          // Trail mode (`unique`) additionally rides the visited-node set
          // in an array column (__vis) and guards each extension with
          // array_contains — Traversals.simplePaths' accumulator, scoped
          // to this hop. The array holds ≤ hi+1 longs, so the state cost
          // is a constant-width column, and on cyclic graphs the guard
          // SHRINKS every level (revisiting walks are pruned instead of
          // multiplied).
          var cur = first()
          if (h.unique) cur = cur
            .filter(col(m.entry(i)) =!= col("__f0"))
            .withColumn("__vis", array(col(m.entry(i)), col("__f0")))
          var out = if (lo <= 1) emit(cur) else null
          for (lvl <- 2 to hi) {
            var nxt = cur.join(step(lvl.toString), col("__f0") === col(s"__n$lvl"))
            if (h.timeOrdered) nxt = nxt.filter(col(s"__t$lvl") >= col("__t0"))
            h.maxDelay.foreach(d =>
              nxt = nxt.filter(col(s"__t$lvl") <= col("__t0") + expr(s"INTERVAL $d")))
            if (h.unique) nxt = nxt
              .filter(!array_contains(col("__vis"), col(s"__f$lvl")))
              .withColumn("__vis", array_append(col("__vis"), col(s"__f$lvl")))
            // bottleneck share so far: min over this repetition's edges
            nxt = nxt.withColumn(s"__w$lvl", least(col("__w0"), col(s"__w$lvl")))
            cur = nxt.drop("__f0", "__t0", "__w0", s"__n$lvl")
              .withColumnRenamed(s"__f$lvl", "__f0")
              .withColumnRenamed(s"__t$lvl", "__t0")
              .withColumnRenamed(s"__w$lvl", "__w0")
            if (lvl >= lo) {
              val lvlOut = emit(cur)
              out = if (out == null) lvlOut else out.unionByName(lvlOut)
            }
          }
          if (lo == 0) {
            // zero-length level: the alias binds the entry node itself;
            // t/w null-typed to the edge frame's column types so the
            // union stays schema-exact
            val base =
              if (i == 0)
                m.startLabel.fold(g.nodes)(l => g.nodes.filter(col("label") === l))
                  .select(col("id").as(m.start))
              else acc
            val z = base
              .withColumn(h.alias, col(m.entry(i)))
              .withColumn(t, lit(null).cast(g.edges.schema("valid_from").dataType))
              .withColumn(s"w${i + 1}", lit(null).cast(g.edges.schema("weight").dataType))
            out = out.unionByName(z)
          }
          out
      }
      // optional hops applied their label constraint pre-join (above) —
      // a semi-join here would drop the preserved null rows; closing hops
      // bind no new alias to constrain
      if (!h.optional && !h.closes) acc = constrain(acc, h.alias, h.label)
    }
    m.notEqual.foreach { case (a, b) => acc = acc.filter(col(a) =!= col(b)) }
    if (m.edgeUnique) {
      // pairwise property-identity exclusion; null identity (an unmatched
      // OPTIONAL hop) never excludes. Residual filters — no extra shuffle.
      val k = m.hops.size
      for (i <- 1 to k; j <- (i + 1) to k) {
        val a = struct(col(s"__e${i}s"), col(s"__e${i}d"), col(s"t$i"), col(s"w$i"))
        val b = struct(col(s"__e${j}s"), col(s"__e${j}d"), col(s"t$j"), col(s"w$j"))
        acc = acc.filter(
          !(col(s"__e${i}s").isNotNull && col(s"__e${j}s").isNotNull && (a <=> b)))
      }
    }
    val wCols: Seq[Column] =
      if (m.emitWeights) (1 to m.hops.size).map(i => col(s"w$i")) else Nil
    val cols: Seq[Column] =
      m.aliases.map(col) ++ (1 to m.hops.size).map(i => col(s"t$i")) ++ wCols
    acc.select(cols: _*)
  }

  /** Per-hop measured candidate estimate for a pattern, in DOCUMENT order.
    * `edgeRows`/`entryNodes`/`farNodes` are exact counts over the hop's
    * filtered edge frame; `factor` is the hop's expected per-row expansion;
    * `cumRows` the estimated chain state after the hop — the number whose
    * PEAK is the shuffle an order actually pays (SCALE.md round-9 g42
    * lesson: the nation-first order estimates ~|customers|²/25 pairs
    * before any part evidence).
    */
  final case class HopEstimate(alias: String, edgeRows: Long, entryNodes: Long,
                               farNodes: Long, factor: Double, cumRows: Double)

  /** Estimate each hop's candidate volume from cheap measured counts — the
    * planning number Cypher's optimizer computes silently, surfaced. This
    * API keeps join order explicit (the round-9 design stance: order is
    * both the author's control and responsibility); this helper gives the
    * ordering choice a measured basis and NEVER reorders.
    *
    * Per distinct filtered edge frame, ONE aggregate job (the kHop
    * measure-then-decide protocol): rows n, distinct entry nodes Dn,
    * distinct far nodes Df, with relType / edgeFilter / label /
    * startLabel applied exactly as [[find]]'s lowering applies them.
    * Chain model: a normal hop expands the state by n/Dn (expected edges
    * per bound entry node); a closing hop contracts by n/(Dn·Df) (its far
    * side must EQUAL the bound target — the independence estimate); an
    * optional hop never shrinks (left join preserves rows); a repeated
    * hop sums the per-length powers of its base factor over [lo, hi]
    * (+1 for the zero-length level). Temporal and uniqueness predicates
    * only ever PRUNE, so estimates are upper bounds — the safe direction
    * for an ordering decision. Counts are memoized per frame, so a
    * pattern touching one rel_type twice pays one job.
    */
  def estimateHops(g: PropertyGraph, m: Motif): Seq[HopEstimate] = {
    val memo = scala.collection.mutable.Map[String, (Long, Long, Long)]()
    def measured(h: Hop, applyStartLabel: Boolean): (Long, Long, Long) = {
      val key = Seq(h.relType, h.edgeFilter.map(_.toString), h.label, h.reversed,
        h.undirected, applyStartLabel && m.startLabel.isDefined).mkString("|")
      memo.getOrElseUpdate(key, {
        var e = g.edges
        h.relType.foreach(rt => e = e.filter(col("rel_type") === rt))
        h.edgeFilter.foreach(p => e = e.filter(p))
        val (near, far) = if (h.reversed) ("dst", "src") else ("src", "dst")
        var f = e.select(col(near).as("__n"), col(far).as("__f"))
        if (h.undirected)
          f = f.unionByName(e.select(col(far).as("__n"), col(near).as("__f")))
        def lblIds(l: String) =
          g.nodes.filter(col("label") === l).select(col("id").as("__lbl"))
        h.label.foreach(l =>
          f = f.join(broadcast(lblIds(l)), col("__f") === col("__lbl"), "left_semi"))
        if (applyStartLabel) m.startLabel.foreach(l =>
          f = f.join(broadcast(lblIds(l)), col("__n") === col("__lbl"), "left_semi"))
        val r = f.agg(count(lit(1)), countDistinct(col("__n")), countDistinct(col("__f"))).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      })
    }
    var cum = 0.0
    m.hops.zipWithIndex.map { case (h, i) =>
      val (n, dn, df) = measured(h, applyStartLabel = i == 0)
      val perLen =
        if (h.closes) { if (dn == 0 || df == 0) 0.0 else n.toDouble / dn / df }
        else if (dn == 0) 0.0
        else n.toDouble / dn
      val factor = h.repeat match {
        case Some((lo, hi)) =>
          (math.max(lo, 1) to hi).map(k => math.pow(perLen, k)).sum +
            (if (lo == 0) 1.0 else 0.0)
        case None => if (h.optional) math.max(1.0, perLen) else perLen
      }
      // hop 1 starts the chain: state = its bound entry-node count, so
      // cum after hop 1 = dn × (n/dn) = n, the EXACT first-join row count
      cum = if (i == 0) dn * factor else cum * factor
      HopEstimate(h.alias, n, dn, df, factor, cum)
    }
  }

  /** Rank author-supplied ALTERNATIVE orderings of a pattern by estimated
    * peak candidate volume, cheapest first; logs one line per candidate
    * and the suggestion. The API never rewrites a pattern — the author
    * proposes semantically equivalent orderings (they, not the helper,
    * carry the equivalence proof) and reads back which one the measured
    * counts favor. MotifSpec shows it ranks g42's evidence-first order
    * over the nation-pair-first alternative, the round-9 lesson as a
    * machine answer.
    */
  def adviseOrder(g: PropertyGraph, candidates: Seq[(String, Motif)]): Seq[(String, Double)] = {
    require(candidates.nonEmpty, "adviseOrder needs at least one candidate ordering")
    val ranked = candidates.map { case (name, m) =>
      val est = estimateHops(g, m)
      val peak = est.map(_.cumRows).max
      println(f"[motif-advise] $name%-24s peak ≈ ${peak}%.4g rows  (" +
        est.map(e => f"${e.alias}:${e.cumRows}%.3g").mkString(" → ") + ")")
      name -> peak
    }.sortBy(_._2)
    println(s"[motif-advise] suggested order: ${ranked.head._1}")
    ranked
  }
}
