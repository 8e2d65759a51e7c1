package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search" — PAPERS.md) — the compression half of the
  * canonical billion-vector layout (IVF prunes WHICH vectors to read;
  * PQ shrinks WHAT is read per vector): the 64-dim float vector (256 B)
  * becomes `m` one-byte codes (8 B at m=8) — each of the `m` contiguous
  * 8-dim SUBSPACES is quantized independently against its own `k`-entry
  * codebook, and a query scores candidates with ASYMMETRIC DISTANCE
  * COMPUTATION (ADC): one m×k table of exact query-to-subcentroid
  * distances (m·k = 128 doubles, broadcast-sized), then each vector's
  * approximate distance is the sum of its m table lookups — no float
  * vector is ever read at query time.
  *
  * Spark-first shape: the quantizer is ONE dataflow for all m subspaces —
  * [[LlmQueries.lloydModel]]'s position-exploded two-round Lloyd with
  * `sub = pos div subDim` added to every key (assign = argmin per
  * (vec_id, sub), update = mean per (sub, cid, pos)) — so determinism,
  * seeding (the k lowest-id vectors' subvectors seed every subspace),
  * and the near-tie hazard class are exactly the audited l05_ann_ivf
  * quantizer's, and the graded l53 carries a full DuckDB oracle
  * ([[pqCtes]]). ADC sums the m per-subspace lookups in FIXED subspace
  * order (a conditional pivot, never an engine-ordered float SUM — the
  * l43/l48 discipline), so the doubles are engine-stable bit-for-bit.
  *
  * Scale: codes are 32× smaller than the vectors, so the ADC scan reads
  * 1/32nd the bytes of a brute-force cosine pass; the codebook table is
  * a broadcast constant. Composed with [[IvfIndex]] (probe nprobe
  * buckets, ADC within them) this is the standard IVF-PQ serving stack;
  * the composition rides the existing partition pruning unchanged.
  */
object Pq {

  /** Fit the per-subspace codebooks and encode every vector: returns
    * (codebook (sub, cid, pos, c), codes (vec_id, sub, cid)) — `m` code
    * rows per vector. Pure function of (data, m, k): two Lloyd rounds
    * from the k lowest-id seeds per subspace, squared-euclidean argmin
    * with (d2, cid) tie order. `emb` carries (vec_id, embedding); dim
    * must divide by m.
    */
  def model(emb: DataFrame, m: Int, k: Int): (DataFrame, DataFrame) = {
    val pts = subPts(emb, m, "vec_id", "v")
    val init = subPts(emb.orderBy("vec_id").limit(k)
      .withColumnRenamed("vec_id", "cid"), m, "cid", "c")
    def assign(cent: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id"), col("sub"))
        .orderBy(col("d2"), col("cid"))
      pts.join(cent, Seq("sub", "pos"))
        .groupBy(col("vec_id"), col("sub"), col("cid"))
        .agg(sum((col("v") - col("c")) * (col("v") - col("c"))).as("d2"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("vec_id"), col("sub"), col("cid"))
    }
    def update(asg: DataFrame): DataFrame =
      asg.join(pts, Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("cid"), col("pos")).agg(avg(col("v")).as("c"))
    val c1 = update(assign(init))
    (c1, assign(c1))
  }

  /** Position-exploded subvector points: (id, sub, pos, value) with
    * sub = pos div (dim/m) — the lloydModel explode with the subspace
    * key attached. */
  private def subPts(emb: DataFrame, m: Int, idCol: String, vCol: String): DataFrame =
    emb.select(col(idCol), size(col("embedding")).as("dim"),
        posexplode(col("embedding")).as(Seq("p", "v0")))
      .select(col(idCol),
        expr(s"CAST(p AS LONG) div CAST(dim div $m AS LONG)").as("sub"),
        col("p").cast("long").as("pos"),
        col("v0").cast("double").as(vCol))

  /** ADC scores for ONE query against every encoded vector: the m×k
    * query-to-subcentroid distance table (one aggregation over the
    * broadcast-sized codebook), then per vector the FIXED-ORDER sum of
    * its m lookups. Output (vec_id, pq_d2) — approximate squared
    * euclidean, rounded to 6 (the cross-engine comparison discipline).
    */
  def adc(codebook: DataFrame, codes: DataFrame, query: DataFrame, m: Int,
          subDim: Int = 8): DataFrame = {
    val qpts = subPts(query.select(lit(0L).as("qid"), col("embedding")),
      m, "qid", "qv").drop("qid")
    // the table entry is OUTPUT-bearing (it sums into pq_d2), so its
    // subDim terms add in FIXED within-subspace position order (pos mod
    // subDim pivot) — never an engine-ordered float SUM (the l43/l48
    // discipline). The codebook's AVG centroids keep lloydModel's audited
    // form; their cross-engine noise is ~1e-15 absolute against values
    // O(1..100) rounded to 6 decimals — six orders of margin, same
    // argument as the round-6 score family.
    val sq = (col("qv") - col("c")) * (col("qv") - col("c"))
    val fixedPosSum = (0 until subDim)
      .map(j => coalesce(max(when(pmod(col("pos"), lit(subDim)) === j, sq)), lit(0.0)))
      .reduce(_ + _)
    val table = qpts.join(codebook, Seq("sub", "pos"))
      .groupBy(col("sub"), col("cid"))
      .agg(fixedPosSum.as("d"))
    val fixedSum = (0 until m)
      .map(s0 => coalesce(max(when(col("sub") === s0, col("d"))), lit(0.0)))
      .reduce(_ + _)
    codes.join(broadcast(table), Seq("sub", "cid"))
      .groupBy(col("vec_id"))
      .agg(round(fixedSum, 6).as("pq_d2"))
  }

  /** Pack the per-subspace code rows into ONE row per vector — the
    * serving layout: (vec_id, codes array in subspace order). 8 bytes of
    * information per vector (the array encoding costs more on disk than
    * a true byte-pack, but the row count — the scan's cost driver — is
    * corpus-sized, not 8× it). */
  def pack(codes: DataFrame, m: Int): DataFrame =
    codes.groupBy(col("vec_id"))
      .agg(array((0 until m).map(s =>
        max(when(col("sub") === s, col("cid")))): _*).as("codes"))

  /** ADC over the PACKED layout — the shape a serving scan runs: the m×k
    * table is computed DRIVER-SIDE (m·k = 128 doubles — the IvfIndex
    * centroid-pull argument) in the same fixed within-subspace position
    * order as [[adc]]'s pivot, then compiled into a codegen'd
    * CASE-lookup chain over the codes array: one scan of one
    * corpus-sized row set, no join, no shuffle before the top-k. Values
    * are bit-identical to [[adc]]'s (same sums in the same order), so
    * the graded oracle is shared.
    */
  def adcPacked(codebook: DataFrame, packedCodes: DataFrame, query: DataFrame,
                m: Int, subDim: Int = 8): DataFrame = {
    val book = codebook.select(col("sub"), col("cid"), col("pos"), col("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(_._1).map(_._2).toArray).toMap
    val qRow = query.select(expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
      .take(1)
    if (qRow.isEmpty) // empty query slice: schema-only result, never a throw
      return packedCodes.select(col("vec_id"),
        lit(null).cast("double").as("pq_d2")).limit(0)
    val qv = qRow.head.getSeq[Double](0).toArray
    val table: Map[(Long, Long), Double] = book.map { case ((s, cid), c) =>
      var d = 0.0
      var j = 0
      while (j < c.length) {
        val diff = qv(s.toInt * subDim + j) - c(j); d += diff * diff; j += 1
      }
      (s, cid) -> d
    }.toMap
    val perSub = (0 until m).map { s =>
      val cases = table.toSeq.collect { case ((sl, cid), d) if sl == s => (cid, d) }
        .sortBy(_._1)
      cases.foldLeft(lit(0.0)) { case (acc, (cid, d)) =>
        when(element_at(col("codes"), s + 1) === cid, lit(d)).otherwise(acc)
      }
    }
    packedCodes.select(col("vec_id"),
      round(perSub.reduce(_ + _), 6).as("pq_d2"))
  }

  /** DuckDB mirror of [[model]] + [[adc]]: CTE chain over the
    * (vec_id, embedding) relation `src` ending in
    * `pq_adc(vec_id, pq_d2)` for the query relation `qsrc` (one row,
    * (vec_id, embedding)). Same seeding, rounds, tie orders, and
    * fixed-subspace pivot as the Spark side. */
  def pqCtes(src: String, qsrc: String, m: Int, k: Int, dim: Int = 64): String = {
    val subDim = dim / m
    val pivot = (0 until m)
      .map(s0 => s"COALESCE(MAX(CASE WHEN t.sub = $s0 THEN t.d END), 0.0)")
      .mkString(" + ")
    s"""qpts AS (SELECT i // $subDim AS sub, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS qv
       |         FROM $qsrc, UNNEST(range($dim)) AS t(i)),
       |ppts AS (SELECT vec_id, i // $subDim AS sub, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS v
       |         FROM $src, UNNEST(range($dim)) AS t(i)),
       |pinit AS (SELECT e.vec_id AS cid, i // $subDim AS sub, i AS pos,
       |                 CAST(embedding[i + 1] AS DOUBLE) AS c
       |          FROM (SELECT * FROM $src ORDER BY vec_id LIMIT $k) e,
       |               UNNEST(range($dim)) AS t(i)),
       |pd1 AS (SELECT p.vec_id, p.sub, c.cid, SUM((p.v - c.c) * (p.v - c.c)) AS d2
       |        FROM ppts p JOIN pinit c ON c.sub = p.sub AND c.pos = p.pos
       |        GROUP BY 1, 2, 3),
       |pa1 AS (SELECT vec_id, sub, cid FROM (
       |          SELECT vec_id, sub, cid,
       |                 ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
       |          FROM pd1) WHERE rn = 1),
       |pc1 AS (SELECT a.sub, a.cid, p.pos, AVG(p.v) AS c
       |        FROM pa1 a JOIN ppts p ON p.vec_id = a.vec_id AND p.sub = a.sub
       |        GROUP BY 1, 2, 3),
       |pd2 AS (SELECT p.vec_id, p.sub, c.cid, SUM((p.v - c.c) * (p.v - c.c)) AS d2
       |        FROM ppts p JOIN pc1 c ON c.sub = p.sub AND c.pos = p.pos
       |        GROUP BY 1, 2, 3),
       |pa2 AS (SELECT vec_id, sub, cid FROM (
       |          SELECT vec_id, sub, cid,
       |                 ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
       |          FROM pd2) WHERE rn = 1),
       |qtab AS (SELECT c.sub, c.cid, ${(0 until subDim).map(j =>
                  s"COALESCE(MAX(CASE WHEN c.pos % $subDim = $j THEN (q.qv - c.c) * (q.qv - c.c) END), 0.0)")
                  .mkString(" + ")} AS d
       |         FROM qpts q JOIN pc1 c ON c.sub = q.sub AND c.pos = q.pos
       |         GROUP BY 1, 2),
       |pq_adc AS (SELECT a.vec_id, ROUND($pivot, 6) AS pq_d2
       |           FROM pa2 a JOIN qtab t ON t.sub = a.sub AND t.cid = a.cid
       |           GROUP BY a.vec_id)""".stripMargin
  }
}
