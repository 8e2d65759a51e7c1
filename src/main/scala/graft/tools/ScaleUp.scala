package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data builder: writes K id-shifted copies of a source sf
  * directory as one larger sf (e.g. 4 × sf0.1 → "sf0.4"), preserving every
  * FK relationship within each copy (all big keys shift by the same
  * per-copy offset; small dimensions — region, nation — and nationkey FKs
  * are shared across copies, as TPC-H scaling does). Distribution SHAPE is
  * preserved, so tier gates and partition sizing see a faithful 4× load.
  * Output goes OUTSIDE /root/testdata (that tree is read-only).
  *
  * ORGANIC document growth (round 8, VERDICT r7 #4): copies k ≥ 1 of the
  * documents table get a deterministic content-keyed token jitter — ~70%
  * of token VOCABULARY (selected by a hash of the token text and k; all
  * occurrences of a selected token move together) is suffixed with "_k" —
  * so cross-copy pairs stop being near-duplicates (a changed token kills
  * the 3 shingles through it; expected shingle survival ≈ 0.3³ ≈ 0.03 →
  * cross-copy Jaccard ≈ 0.014, far under the graded 0.2 thresholds)
  * while WITHIN-copy similarity is preserved EXACTLY: the map
  * token→token' is injective and content-keyed, so two docs in the same
  * copy share a token/shingle after the map iff they shared it before.
  * Injectivity PRECONDITION (ADVICE r8): no source token may itself end
  * in "_<copy index>" — an unselected "foo_1" would collide with
  * selected "foo" mapped to "foo_1", creating spurious within-copy
  * overlap. The driver vocabulary contains no underscores at all
  * (measured: 0 of ~60 distinct tokens at every sf), and main() now
  * ENFORCES the precondition with one aggregate over the source corpus
  * instead of assuming it, so a future fixture change fails loudly here
  * rather than silently corrupting the scale-evidence series.
  * The rate is MEASURED, not modeled: at the original 30% rate the
  * cross-copy Jaccard model (0.7³ → J ≈ 0.21) sat exactly at the 0.2
  * graded threshold, and repeated-token correlation pushed the realized
  * median to 0.28 — 7,209 of 8,233 sf0.4 l03 pairs were cross-copy
  * boundary noise (pair-count split measured in SCALE.md's round-8
  * entry). n_chars is recomputed (source
  * invariant n_chars = LENGTH(text), verified on the driver fixtures).
  * xxhash64 keys the jitter: this is tool-side DATA GENERATION — both
  * engines then read the same parquet, so no SQL-mirrorability
  * constraint applies.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> <copies>
  */
object ScaleUp {
  private val Shift = 10000000L // > every key range at sf0.1, ≪ 1e9 node-id base gap
  private val MaxCopies = (1000000000L / Shift - 1).toInt

  /** ~70% of token vocabulary perturbed, keyed on (token text, copy). */
  private def jitterText(textCol: Column, k: Int): Column =
    array_join(
      transform(split(textCol, " "),
        t => when(pmod(xxhash64(t, lit(k)), lit(10L)) < 7,
               concat(t, lit("_"), lit(k))).otherwise(t)),
      " ")

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: runMain graft.tools.ScaleUp <srcDir> <outDir> <copies>")
      sys.exit(2)
    }
    val Array(src, out, copiesS) = args.take(3)
    val copies = copiesS.toIntOption.getOrElse {
      System.err.println(s"copies must be an integer, got '$copiesS'")
      sys.exit(2); 0
    }
    // copies·Shift must stay under the 1e9 node-id base gap or shifted keys
    // would collide with the next label's id range in the property graph
    if (copies < 1 || copies > MaxCopies) {
      System.err.println(s"copies must be in [1, $MaxCopies] " +
        s"(copies × $Shift must stay under the 1e9 node-id base gap), got $copies")
      sys.exit(2)
    }
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    // Enforce the jitter-injectivity precondition (scaladoc above): a source
    // token ending in "_<k>" for any copy index k in range would alias a
    // jittered token. One cheap aggregate over the corpus; underscore-free
    // tokens can never collide with "<tok>_<k>".
    val clashing = spark.read.parquet(s"$src/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").rlike(s"_([1-9]|[1-9][0-9])$$"))
      .filter(expr(s"CAST(regexp_extract(tok, '_([0-9]+)$$', 1) AS INT) < $copies"))
      .limit(1).count()
    if (clashing > 0) {
      System.err.println("source vocabulary violates the jitter-injectivity " +
        s"precondition: a token ends in '_<k>' for a copy index k < $copies; " +
        "pick a different suffix separator before generating this fixture")
      sys.exit(2)
    }
    def shifted(table: String, keyCols: Seq[String],
                perCopy: (DataFrame, Int) => DataFrame = (df, _) => df): DataFrame = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until copies).map { k =>
        val s = keyCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(k * Shift)) }
        perCopy(s, k)
      }.reduce(_ unionByName _)
    }
    // copy 0 stays verbatim (the smaller sf remains a prefix of the larger);
    // copies 1..k-1 get the organic jitter described above
    val perturbDocs: (DataFrame, Int) => DataFrame = (df, k) =>
      if (k == 0) df
      else df
        .withColumn("text", when(col("text").isNull, col("text"))
          .otherwise(jitterText(col("text"), k)))
        .withColumn("n_chars", when(col("text").isNull, col("n_chars"))
          .otherwise(length(col("text")).cast("long")))
    val plan: Seq[(String, Seq[String])] = Seq(
      "region" -> Seq.empty, "nation" -> Seq.empty, // shared dims: one copy
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    plan.foreach { case (t, keys) =>
      val df0 =
        if (keys.isEmpty) spark.read.parquet(s"$src/$t.parquet")
        else if (t == "documents") shifted(t, keys, perturbDocs)
        else shifted(t, keys)
      // events.ts encoding varies by fixture round (ns-as-LONG under the
      // nanosAsLong session flag, µs NTZ since round 8). Normalize through
      // the shared adapter and write a µs TIMESTAMP — lossless (the data is
      // µs-precision) and type-faithful for BOTH engines: a raw-long copy
      // breaks every DuckDB oracle that unions ts into a TIMESTAMP column
      // (edgesCte valid_from), while Tables.events adapts to any of the three.
      val df = if (t == "events") graft.Tables.normalizeEventsTs(df0) else df0
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"scaleup: $t -> ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
