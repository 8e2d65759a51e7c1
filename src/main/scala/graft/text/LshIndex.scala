package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standing MinHash-LSH dedup index — the DEDUP family's maintained
  * artifact, completing the arc the vector store joined in round 15
  * (IvfIndex: build-once / append / sampled-refit / remove): l02/l46
  * recompute every signature per run, which is the right graded shape but
  * not what a 100 TB ingest pipeline does — there, the corpus's band
  * buckets are a PERSISTED table and each arriving batch is deduped
  * against it by (1) sketching ONLY the batch, (2) an equi-join of the
  * batch's band buckets against the standing table (batch side broadcasts
  * — the index is scanned, never shuffled), (3) an exact-Jaccard rerank
  * that re-reads the corpus for CANDIDATE docs only (semi-join pruning —
  * at 100 TB this is the difference between reading everything and
  * reading the collision set). The index row is (doc_id, band, minhash)
  * — 12 longs per document, ~1/1000th of a text corpus — so the standing
  * artifact is cheap to store and cheap to scan.
  *
  * Single-sourcing: the trigram / sketch / bucket builders here ARE the
  * graded l02/l02b/l46 dataflow (LlmQueries.minhashNearDupPairs calls
  * them), so the index can never drift from the audited pipeline, and
  * the graded l52_dedup_incremental carries the same DuckDB oracle
  * machinery. Maintenance mirrors IvfIndex: [[appendTo]] lands new docs'
  * bucket rows inside the sharded layout; [[removeFrom]] (erasure — the
  * g68/g69/t17b/l47c contract) rewrites only the shards holding deleted
  * docs and is idempotent under at-least-once redelivery.
  */
final case class LshIndex(buckets: DataFrame, bandRows: Int) {

  /** Near-duplicates of `batch` against the INDEXED corpus: LSH candidate
    * pairs (batch bucket table ⋈ standing bucket table on the band
    * columns; the batch side is batch-sized and broadcasts) reranked by
    * exact trigram Jaccard. `corpus` supplies the text for the rerank —
    * only CANDIDATE corpus docs are re-tokenized (left-semi pruning), so
    * the rerank cost is ∝ collisions, not corpus. Output: (batch_id,
    * corpus_id, jaccard_dist) for pairs at distance ≤ `maxDist` — the
    * l02 threshold and rounding, so probe results are comparable with
    * the batch-graded pipeline. Batch ids must be disjoint from indexed
    * ids (they are not yet ingested — the contract of an ingest dedup).
    */
  def probe(batch: DataFrame, corpus: DataFrame,
            maxDist: Double = 0.8): DataFrame = {
    val bandCols = LshIndex.bandCols(bandRows)
    val bb = LshIndex.buckets(batch, bandRows)
      .withColumnRenamed("doc_id", "batch_id")
    val cand = buckets.withColumnRenamed("doc_id", "corpus_id")
      .join(broadcast(bb), bandCols)
      .select(col("batch_id"), col("corpus_id")).distinct()
      .transform(graft.graph.Materialize.apply)
    val tgB = LshIndex.grams(batch)
      .select(col("doc_id").as("batch_id"), col("g"))
    val tgC = LshIndex.grams(
        corpus.join(cand.select(col("corpus_id").as("doc_id")),
          Seq("doc_id"), "left_semi"))
      .select(col("doc_id").as("corpus_id"), col("g"))
      .transform(graft.graph.Materialize.apply)
    val szB = tgB.groupBy("batch_id").agg(count(lit(1)).as("nb"))
    val szC = tgC.groupBy("corpus_id").agg(count(lit(1)).as("nc"))
    cand
      .join(tgB, Seq("batch_id"))
      .join(tgC, Seq("corpus_id", "g"))
      .groupBy("batch_id", "corpus_id").agg(count(lit(1)).as("i"))
      .join(szB, Seq("batch_id"))
      .join(szC, Seq("corpus_id"))
      .withColumn("jaccard_dist",
        round(lit(1.0) - col("i").cast("double") / (col("nb") + col("nc") - col("i")), 6))
      .filter(col("jaccard_dist") <= maxDist)
      .select(col("batch_id"), col("corpus_id"), col("jaccard_dist"))
  }

  /** In-memory append: the index over corpus ∪ delta (new docs sketched,
    * bucket rows unioned — existing rows untouched; signatures are
    * per-document, so append ≡ rebuild-over-union by construction). */
  def append(delta: DataFrame): LshIndex =
    copy(buckets = buckets.unionByName(LshIndex.buckets(delta, bandRows)))

  /** In-memory erasure: every bucket row of the given doc ids removed —
    * erased docs can never again surface as dedup candidates. Unknown ids
    * are no-ops (idempotent replay). */
  def remove(ids: DataFrame): LshIndex =
    copy(buckets = buckets.join(
      ids.select(col("doc_id")), Seq("doc_id"), "left_anti"))
}

/** What [[LshIndex.removeFrom]] did: distinct docs the erasure batch hit
  * and which `shard=` partitions were rewritten — every other shard is
  * byte-untouched. */
final case class LshRemoveStats(nDocsRemoved: Long, rewrittenShards: Seq[Long])

object LshIndex {

  /** The l02 sketch family: 12 odd multipliers for the poly_hash minhash
    * lanes (single-sourced — LlmQueries' graded pipeline reads THIS val). */
  val minhashMults: Seq[Long] =
    Seq(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L, 67L, 71L, 73L, 79L)

  /** Shard width for the persisted layout: bucket rows partition by
    * `shard = doc_id / rowsPerShard`, so a CONTIGUOUS id range (one
    * crawl, one source — the shape real erasure batches take) lives in
    * few shards and [[removeFrom]] rewrites only those; a %-sampled
    * batch spreads across all shards (the same uniform-vs-clustered
    * bound the IvfIndex erasure table measures). Probing never uses the
    * shard: candidates come from the band-column equi-join with the
    * batch side broadcast. */
  val defaultRowsPerShard: Long = 1L << 20

  private[graft] def bandCols(bandRows: Int): Seq[String] =
    Seq("h") ++ (0 until bandRows).map(r => s"mh_r$r")

  /** Distinct word-trigram set per doc — the l02/l03/l16 tokenization
    * verbatim (docs under 3 words have no trigrams and drop out). */
  def grams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
        .as("g"))
      .distinct()

  /** 12-lane minhash sketch per doc (poly_hash mins over the trigram
    * set). Callers must have registered GraftFunctions. */
  def sketch(docs: DataFrame): DataFrame = sketchOf(grams(docs))

  /** [[sketch]] over an already-computed gram table (the graded pipeline
    * reuses its materialized grams for sketch + sizes + rerank). */
  def sketchOf(tg: DataFrame): DataFrame = {
    val mins = minhashMults.zipWithIndex.map { case (m, h) =>
      min(expr(s"poly_hash(g, 0L, ${m}L)")).as(s"mh$h") }
    tg.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** Band-bucket rows: one row per (doc, band) carrying the band's
    * `bandRows` minhashes — the index row format and the LSH join key. */
  def buckets(docs: DataFrame, bandRows: Int = 1): DataFrame =
    bucketsOf(sketch(docs), bandRows)

  /** [[buckets]] over an already-computed sketch. */
  def bucketsOf(sketch: DataFrame, bandRows: Int): DataFrame = {
    require(minhashMults.size % bandRows == 0,
      s"bandRows=$bandRows must divide the ${minhashMults.size}-hash sketch; " +
        "a non-divisor would silently drop trailing minhashes from the banding")
    val nBands = minhashMults.size / bandRows
    val stackExpr = (0 until nBands).map(b =>
      (Seq(s"$b") ++ (0 until bandRows).map(r => s"mh${b * bandRows + r}")).mkString(", ")).mkString(", ")
    sketch.select(col("doc_id"),
      expr(s"stack($nBands, $stackExpr)").as(bandCols(bandRows)))
  }

  /** Build the standing index over a corpus (one tokenize + sketch pass —
    * the same jobs the batch pipeline runs, materialized once). */
  def build(corpus: DataFrame, bandRows: Int = 1): LshIndex =
    LshIndex(buckets(corpus, bandRows)
      .transform(graft.graph.Materialize.apply), bandRows)

  /** Persist: bucket rows sharded by contiguous doc-id range (see
    * [[defaultRowsPerShard]]), band width recorded alongside. */
  def save(idx: LshIndex, dir: String,
           rowsPerShard: Long = defaultRowsPerShard): Unit = {
    val spark = idx.buckets.sparkSession
    import spark.implicits._
    idx.buckets
      .withColumn("shard", (col("doc_id") / lit(rowsPerShard)).cast("long"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/buckets")
    Seq((idx.bandRows, rowsPerShard)).toDF("band_rows", "rows_per_shard")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: SparkSession, dir: String): LshIndex = {
    // meta columns read BY NAME (ADVICE r15): positional gets would
    // silently mis-read if the meta schema ever grows or reorders
    val meta = spark.read.parquet(s"$dir/meta").head()
    val bandRows = meta.getAs[Int]("band_rows")
    LshIndex(spark.read.parquet(s"$dir/buckets").drop("shard")
      .select(col("doc_id") +: bandCols(bandRows).map(col): _*), bandRows)
  }

  /** Incremental ingest against a persisted index: sketch ONLY the new
    * docs, append their bucket rows into the sharded layout — nothing on
    * disk is rewritten. Signatures are per-document, so the appended
    * index equals a from-scratch rebuild of the union (LshIndexSpec). */
  def appendTo(spark: SparkSession, dir: String, delta: DataFrame): Unit = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val (bandRows, rowsPerShard) =
      (meta.getAs[Int]("band_rows"), meta.getAs[Long]("rows_per_shard"))
    buckets(delta, bandRows)
      .withColumn("shard", (col("doc_id") / lit(rowsPerShard)).cast("long"))
      .write.mode("append").partitionBy("shard").parquet(s"$dir/buckets")
  }

  /** Persisted erasure (the IvfIndex.removeFrom pattern on the dedup
    * side): delete the given doc ids' bucket rows by rewriting ONLY the
    * shards that hold them — every untouched shard is byte-identical,
    * emptied shard directories are dropped, and replaying the batch is a
    * no-op (unknown ids touch nothing). */
  def removeFrom(spark: SparkSession, dir: String, ids: DataFrame): LshRemoveStats = {
    import spark.implicits._
    val idFrame = ids.select(col("doc_id")).distinct()
      .transform(graft.graph.Materialize.apply)
    val stored = spark.read.parquet(s"$dir/buckets")
    val hit = stored.join(idFrame, Seq("doc_id"), "left_semi")
      .transform(graft.graph.Materialize.apply)
    val nDocs = hit.select("doc_id").distinct().count()
    if (nDocs == 0L) return LshRemoveStats(0L, Seq.empty)
    val touched = hit.select("shard").distinct()
      .as[Long].collect().sorted.toSeq
    val touchedLits = touched.map(java.lang.Long.valueOf)
    val survivors = stored
      .filter(col("shard").isin(touchedLits: _*))
      .join(idFrame, Seq("doc_id"), "left_anti")
      .transform(graft.graph.Materialize.apply)
    // dynamic overwrite scoped to THIS write via the writer option (takes
    // precedence over the session conf — ADVICE r15: mutating the session
    // conf would leak dynamic mode into concurrent writes). Crash window:
    // a failure between this write and the emptied-shard delete below
    // leaves erased rows on disk until the batch is replayed — replay
    // converges (unknown ids are no-ops, surviving shards rewrite to the
    // same bytes), which is the at-least-once recovery expectation.
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(s"$dir/buckets")
    val stillPopulated = survivors.select("shard").distinct().as[Long].collect().toSet
    val hconf = spark.sparkContext.hadoopConfiguration
    (touched.toSet -- stillPopulated).foreach { sh =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/buckets/shard=$sh")
      val fs = p.getFileSystem(hconf)
      if (fs.exists(p)) fs.delete(p, true)
    }
    LshRemoveStats(nDocs, touched)
  }
}
