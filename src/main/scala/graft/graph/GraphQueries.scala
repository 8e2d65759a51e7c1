package graft.graph

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G-series graph operators (SURVEY.md §2.2) as graded queries.
  * Flagship first (M1); the rest land with M3/M4/M5.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame
  private final case class E(name: String, fn: Q, sql: Option[String])

  import GraphSql.{edgesCte, nodesCte}

  private val entries: Seq[E] = Seq(

    // G1 — 1-hop expand: entity -> located-in neighbor, with neighbor name
    // (Cypher `MATCH (a)-[:LOCATED_IN]->(b)`, README.md:25).
    E("g01_expand_1hop", (s, d) => {
      val g = GraphBuilder(Tables(s, d))
      g.edgesOf("LOCATED_IN")
        .join(g.nodes.withColumnRenamed("id", "nid"), col("dst") === col("nid"))
        .select(col("src"), col("dst"), col("name").as("dst_name"))
        .orderBy("src", "dst")
    }, Some(s"""
      WITH $edgesCte, $nodesCte
      SELECT e.src, e.dst, n.name AS dst_name
      FROM graph_edges e JOIN graph_nodes n ON e.dst = n.id
      WHERE e.rel_type = 'LOCATED_IN'
      ORDER BY src, dst""")),

    // G2 — k-hop traversal ("Navigate N-tier ownership structures",
    // README.md:11): min-depth reachability within 3 forward hops from all
    // entities located in nation 0. Driver-side BFS loop in Spark; depth-
    // capped recursive CTE in DuckDB with MIN(depth) (SURVEY §5.3 rule 5).
    E("g02_khop", (s, d) => {
      val g = GraphBuilder(Tables(s, d))
      val start = g.edgesOf("LOCATED_IN")
        .filter(col("dst") === GraphBuilder.NationBase)
        .select(col("src").as("id"))
      Traversals.kHop(g.edges, start, 3)
        .orderBy("id")
    }, Some(s"""
      WITH RECURSIVE $edgesCte,
      start_nodes AS (
        SELECT src AS id FROM graph_edges WHERE rel_type = 'LOCATED_IN' AND dst = 2000000000),
      reach(id, depth) AS (
        SELECT id, CAST(0 AS BIGINT) FROM start_nodes
        UNION ALL
        SELECT e.dst, r.depth + 1 FROM reach r JOIN graph_edges e ON e.src = r.id
        WHERE r.depth < 3)
      SELECT id, MIN(depth) AS depth FROM reach GROUP BY id ORDER BY id""")),

    // G8 — degree centrality (NetworkX "centrality", README.md:28)
    E("g08_degree", (s, d) => {
      val e = GraphBuilder.edges(Tables(s, d))
      val out = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
      val in = e.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_deg"))
      out.join(in, Seq("id"), "full_outer")
        .na.fill(0L, Seq("out_deg", "in_deg"))
        .withColumn("total_deg", col("out_deg") + col("in_deg"))
        .orderBy("id")
    }, Some(s"""
      WITH $edgesCte,
      o AS (SELECT src AS id, COUNT(*) AS out_deg FROM graph_edges GROUP BY 1),
      i AS (SELECT dst AS id, COUNT(*) AS in_deg FROM graph_edges GROUP BY 1)
      SELECT COALESCE(o.id, i.id) AS id,
             COALESCE(out_deg, 0) AS out_deg, COALESCE(in_deg, 0) AS in_deg,
             COALESCE(out_deg, 0) + COALESCE(in_deg, 0) AS total_deg
      FROM o FULL OUTER JOIN i ON o.id = i.id ORDER BY id""")),

    // common registered addresses", README.md:15). Here: customer pairs
    // linked by ordering the same part — scan → join → self-join → agg → sort.
    // Scale note: the self-join fans out per-part; part fan-out is bounded
    // (~30 distinct customers per part at every sf), unlike supplier fan-out
    // which would explode — at 100 TB, pick the bounded attribute or cap
    // per-attribute fan-out before the pair join.
    E("g11_conflict_shared_part", (s, d) => {
      val t = Tables(s, d)
      val cp = t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
        .distinct()
      val a = cp.select(col("custkey").as("cust_a"), col("partkey"))
      val b = cp.select(col("custkey").as("cust_b"), col("partkey"))
      a.join(b, Seq("partkey"))
        .filter(col("cust_a") < col("cust_b"))
        .groupBy(col("cust_a"), col("cust_b"))
        .agg(count(lit(1)).as("shared_parts"))
        .filter(col("shared_parts") >= 2)
        .orderBy(col("shared_parts").desc, col("cust_a"), col("cust_b"))
    }, Some("""
      WITH cp AS (
        SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
      SELECT a.custkey AS cust_a, b.custkey AS cust_b, COUNT(*) AS shared_parts
      FROM cp a JOIN cp b ON a.partkey = b.partkey AND a.custkey < b.custkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
      ORDER BY shared_parts DESC, cust_a, cust_b""")),

    // G12 — temporal snapshot (time-slider, README.md:17): graph as of
    // 1997-01-01. The validity predicate pushes down to the edge scan.
    E("g12_snapshot", (s, d) => {
      val g = GraphBuilder(Tables(s, d))
      g.snapshot(lit("1997-01-01 00:00:00").cast("timestamp"))
        .edges.groupBy(col("rel_type"))
        .agg(count(lit(1)).as("cnt"), countDistinct(col("src")).as("n_src"))
        .orderBy("rel_type")
    }, Some(s"""
      WITH $edgesCte
      SELECT rel_type, COUNT(*) AS cnt, COUNT(DISTINCT src) AS n_src
      FROM graph_edges
      WHERE valid_from IS NULL OR valid_from <= TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY rel_type ORDER BY rel_type""")),

    // G13 — temporal diff ("how structures have evolved", README.md:17):
    // edge keys present at T2 but not at T1, via EXCEPT (set semantics in
    // both engines).
    E("g13_temporal_diff", (s, d) => {
      val g = GraphBuilder(Tables(s, d))
      def snap(ts: String) =
        g.snapshot(lit(ts).cast("timestamp")).edges.select(col("src"), col("dst"), col("rel_type"))
      snap("1997-01-01 00:00:00").except(snap("1996-01-01 00:00:00"))
        .orderBy("src", "dst", "rel_type")
    }, Some(s"""
      WITH $edgesCte
      SELECT src, dst, rel_type FROM graph_edges
      WHERE valid_from IS NULL OR valid_from <= TIMESTAMP '1997-01-01 00:00:00'
      EXCEPT
      SELECT src, dst, rel_type FROM graph_edges
      WHERE valid_from IS NULL OR valid_from <= TIMESTAMP '1996-01-01 00:00:00'
      ORDER BY src, dst, rel_type""")),

    // G14 — ego network: subgraph induced by the ≤2-hop undirected
    // neighborhood of customer #1 (interactive mapping, README.md:11).
    E("g14_ego_net", (s, d) => {
      val g = GraphBuilder(Tables(s, d))
      Traversals.egoNet(g.edges, GraphBuilder.CustomerBase + 1L, 2)
        .select(col("src"), col("dst"), col("rel_type"))
        .orderBy("src", "dst", "rel_type")
    }, Some(s"""
      WITH RECURSIVE $edgesCte,
      sym AS (SELECT src, dst FROM graph_edges UNION ALL SELECT dst, src FROM graph_edges),
      reach(id, depth) AS (
        SELECT CAST(3000000001 AS BIGINT), 0
        UNION ALL
        SELECT s.dst, r.depth + 1 FROM reach r JOIN sym s ON s.src = r.id WHERE r.depth < 2),
      rs AS (SELECT DISTINCT id FROM reach)
      SELECT e.src, e.dst, e.rel_type
      FROM graph_edges e JOIN rs a ON e.src = a.id JOIN rs b ON e.dst = b.id
      ORDER BY src, dst, rel_type""")),

    // G15 — neighborhood aggregation (README.md:13): per-part supplier
    // stats from the weighted SUPPLIED_BY edges + deterministic neighbor list.
    E("g15_neighborhood_agg", (s, d) => {
      GraphBuilder.edges(Tables(s, d)).filter(col("rel_type") === "SUPPLIED_BY")
        .groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("n_suppliers"),
             max(col("weight")).as("max_share"),
             min(col("weight")).as("min_share"),
             array_join(transform(sort_array(collect_list(col("dst"))), x => x.cast("string")), ",")
               .as("suppliers"))
        .orderBy("id")
    }, Some(s"""
      WITH $edgesCte
      SELECT src AS id, COUNT(*) AS n_suppliers,
             MAX(weight) AS max_share, MIN(weight) AS min_share,
             string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS suppliers
      FROM graph_edges WHERE rel_type = 'SUPPLIED_BY'
      GROUP BY src ORDER BY id""")),

    // G16 — risk flags ("identify hidden risks in seconds", README.md:6,15):
    // union of pattern detectors -> per-entity sorted flag set.
    // Dominance ratio = max_share × n_suppliers (how many × the uniform share
    // the top supplier holds) — scale-invariant, so the flags fire at every sf.
    E("g16_risk_flags", (s, d) => {
      val agg = GraphBuilder.edges(Tables(s, d)).filter(col("rel_type") === "SUPPLIED_BY")
        .groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("n"), max(col("weight")).as("mx"))
        .withColumn("ratio", col("mx") * col("n"))
      val dominant = agg.filter(col("ratio") >= 2.5)
        .select(col("id"), lit("dominant_supplier").as("flag"))
      val concentrated = agg.filter(col("ratio") >= 3.0)
        .select(col("id"), lit("highly_concentrated").as("flag"))
      dominant.unionByName(concentrated)
        .groupBy(col("id"))
        .agg(array_join(sort_array(collect_set(col("flag"))), ",").as("flags"))
        .orderBy("id")
    }, Some(s"""
      WITH $edgesCte,
      agg AS (
        SELECT src AS id, COUNT(*) AS n, MAX(weight) AS mx,
               MAX(weight) * COUNT(*) AS ratio
        FROM graph_edges WHERE rel_type = 'SUPPLIED_BY' GROUP BY src),
      f AS (
        SELECT id, 'dominant_supplier' AS flag FROM agg WHERE ratio >= 2.5
        UNION ALL
        SELECT id, 'highly_concentrated' AS flag FROM agg WHERE ratio >= 3.0)
      SELECT id, string_agg(flag, ',' ORDER BY flag) AS flags
      FROM f GROUP BY id ORDER BY id"""))
  )

  val queries: Map[String, Q] = entries.map(e => e.name -> e.fn).toMap
  val oracleSql: Map[String, String] = entries.flatMap(e => e.sql.map(sql => e.name -> sql.trim)).toMap
}
