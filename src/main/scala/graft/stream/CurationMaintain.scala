package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{LlmQueries, LshIndex}

/** The CURATION TICK as a continuously-running ingest loop (round 16 —
  * the streaming deployment of the graded l55 composition, built on
  * [[IndexMaintain]]'s foreachBatch pattern): each signed micro-batch of
  * documents flows through dedup-against-everything-accepted-so-far →
  * the Gopher quality gate → shard-local packing, and the ACCEPTED
  * survivors are ingested into the standing state the NEXT batch dedups
  * against — a persisted [[LshIndex]] plus a sharded accepted-document
  * store. This is the property no per-batch grading implies and the
  * whole point of the loop: a re-crawl arriving three batches after its
  * original is dropped by state the pipeline itself maintained.
  *
  * Stage bodies are the graded components' own (LshIndex single-sources
  * l02/l52's sketch machinery; the gate and packer are l34/l51's factored
  * bodies — the same ones l55 composes), so the streaming tick can never
  * drift from the batch-audited pipeline.
  *
  * The batch also dedups AGAINST ITSELF before probing the index (round
  * 16): two near-identical docs in one micro-batch collide with nothing
  * standing — the within-batch LSH self-join catches them, first-by-id
  * wins, so acceptance is independent of how a crawler happened to chop
  * the feed into batches.
  *
  * Signed-batch contract (the t17c/IndexMaintain convention): arrivals
  * carry text, erasures carry ids. Erasures apply FIRST — they leave both
  * the LSH index (touched-shard rewrite) and the accepted store, so a
  * same-batch erase+re-ingest is an upsert, and an erased document's
  * re-crawl is ACCEPTED again (nothing left in the state to collide
  * with — erasure means gone, the g69 leave-semantics). Replay: the
  * erasure leg is idempotent on its own; the accept leg rides the
  * standard foreachBatch batchId-dedup discipline.
  *
  * Scale: per batch the work is ∝ batch through every stage — the index
  * is scanned, never shuffled (probe = broadcast join of the batch's
  * buckets); the rerank re-reads ONLY colliding accepted docs (left-semi
  * pruning into the sharded store); the gate and packer scan the
  * shrinking survivor set; ingest appends in-shard. The accepted store
  * shards by contiguous doc-id range exactly like the index, so an
  * erasure rewrites only touched shards of BOTH.
  */
object CurationMaintain {

  /** Initialize the standing state: the LSH index and the accepted-doc
    * store over a seed corpus (both sharded by contiguous id range). */
  def init(spark: SparkSession, storeDir: String, seed: DataFrame,
           rowsPerShard: Long = LshIndex.defaultRowsPerShard): Unit = {
    import spark.implicits._
    LshIndex.save(LshIndex.build(seed.select(col("doc_id"), col("text"))),
      s"$storeDir/lsh", rowsPerShard)
    seed.select(col("doc_id"), col("text"))
      .withColumn("shard", (col("doc_id") / lit(rowsPerShard)).cast("long"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$storeDir/accepted")
    Seq(rowsPerShard).toDF("rows_per_shard")
      .coalesce(1).write.mode("overwrite").parquet(s"$storeDir/meta")
  }

  /** The accepted corpus as (doc_id, text) — what the next batch dedups
    * against, and the curated output a training run reads. */
  def accepted(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/accepted").select("doc_id", "text")

  /** Fold one signed micro-batch through the tick. Returns the packed
    * bins of THIS batch's accepted slice — (shard, bin_id, n_docs,
    * bin_tokens), the unit a downstream trainer consumes per batch.
    * Arriving doc ids must be new to the store (the ingest contract all
    * the maintained artifacts share); erased ids may be anything. */
  def applyBatch(spark: SparkSession, storeDir: String, batch: DataFrame,
                 cap: Long = 512L): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val erase = batch.filter(col("erased")).select(col("doc_id"))
    val arrivals = batch.filter(!col("erased")).select(col("doc_id"), col("text"))
      .transform(graft.graph.Materialize.apply)
    if (!erase.isEmpty) {
      LshIndex.removeFrom(spark, s"$storeDir/lsh", erase)
      removeAccepted(spark, storeDir, erase)
    }
    if (arrivals.isEmpty) return LlmQueries.packGreedy(arrivals, cap)
    // stage 1a: WITHIN-BATCH dedup — two near-identical docs arriving in
    // the SAME micro-batch collide with nothing in the standing index
    // (neither is ingested yet), so the batch dedups against itself
    // first: LSH candidate pairs from the batch's own bucket table
    // (ordered doc_id < doc_id so each pair appears once), exact-Jaccard
    // reranked with the l02 threshold, and the HIGHER id of each
    // confirmed pair drops (first-by-id wins — the deterministic greedy
    // a single streaming pass can apply without closing clusters; a dup
    // of a dropped doc still drops, because its smaller-id partner
    // remains a pair witness whether or not that partner survived)
    val idx = LshIndex.load(spark, s"$storeDir/lsh")
    val bb = LshIndex.buckets(arrivals, idx.bandRows)
      .transform(graft.graph.Materialize.apply)
    val selfCand = bb.withColumnRenamed("doc_id", "a")
      .join(bb.withColumnRenamed("doc_id", "b"),
        LshIndex.bandCols(idx.bandRows))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val tg = LshIndex.grams(arrivals)
      .transform(graft.graph.Materialize.apply)
    val sz = tg.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val selfDups = selfCand
      .join(tg.select(col("doc_id").as("a"), col("g")), Seq("a"))
      .join(tg.select(col("doc_id").as("b"), col("g")), Seq("b", "g"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
      .join(sz.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(sz.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .filter(round(lit(1.0) - col("i").cast("double") /
        (col("na") + col("nb") - col("i")), 6) <= 0.8)
      .select(col("b").as("doc_id")).distinct()
    val batchUnique = arrivals.join(selfDups, Seq("doc_id"), "left_anti")
    // stage 1b: dedup against everything accepted so far (post-erasure)
    val corpus = accepted(spark, storeDir)
    val hits = idx.probe(batchUnique, corpus)
      .select(col("batch_id").as("doc_id")).distinct()
    val deduped = batchUnique.join(hits, Seq("doc_id"), "left_anti")
    // stage 2: the l34 gate over the deduped survivors
    val passed = deduped.join(
      LlmQueries.gopherQuality(deduped).filter(col("gopher_pass")).select("doc_id"),
      Seq("doc_id"), "left_semi")
      .transform(graft.graph.Materialize.apply)
    // ingest: the accepted slice joins the standing state the NEXT batch
    // dedups against (in-shard appends on both stores)
    if (!passed.isEmpty) {
      LshIndex.appendTo(spark, s"$storeDir/lsh", passed)
      val rowsPerShard = spark.read.parquet(s"$storeDir/meta")
        .head().getAs[Long]("rows_per_shard")
      passed.withColumn("shard", (col("doc_id") / lit(rowsPerShard)).cast("long"))
        .write.mode("append").partitionBy("shard").parquet(s"$storeDir/accepted")
    }
    // stage 3: pack this batch's accepted slice for the downstream trainer
    LlmQueries.packGreedy(passed, cap)
  }

  /** Erase doc ids from the accepted store: rewrite only the shards that
    * hold them (dynamic overwrite scoped to this write), drop emptied
    * shard directories, no-op on unknown ids — the LshIndex.removeFrom
    * economics applied to the text store. */
  private def removeAccepted(spark: SparkSession, storeDir: String,
                             ids: DataFrame): Unit = {
    import spark.implicits._
    val idFrame = ids.select(col("doc_id")).distinct()
      .transform(graft.graph.Materialize.apply)
    val stored = spark.read.parquet(s"$storeDir/accepted")
    val touched = stored.join(idFrame, Seq("doc_id"), "left_semi")
      .select("shard").distinct().as[Long].collect().sorted.toSeq
    if (touched.isEmpty) return
    val touchedLits = touched.map(java.lang.Long.valueOf)
    val survivors = stored
      .filter(col("shard").isin(touchedLits: _*))
      .join(idFrame, Seq("doc_id"), "left_anti")
      .transform(graft.graph.Materialize.apply)
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(s"$storeDir/accepted")
    val stillPopulated = survivors.select("shard").distinct().as[Long].collect().toSet
    val hconf = spark.sparkContext.hadoopConfiguration
    (touched.toSet -- stillPopulated).foreach { sh =>
      val p = new org.apache.hadoop.fs.Path(s"$storeDir/accepted/shard=$sh")
      val fs = p.getFileSystem(hconf)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}
