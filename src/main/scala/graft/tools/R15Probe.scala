package graft.tools

import graft.Tables
import graft.text.{Bpe, IvfIndex, LshIndex, Retrieval}
import org.apache.spark.sql.functions._

/** Round-15 rehearsal probes (SCALE.md protocol: /tmp/scale/sfN via
  * tools/ScaleUp, SPARK_DRIVER_MEM=32g, SPARK_GRAFT_SHUFFLE_PARTITIONS=128
  * at sf6.4):
  *
  *   ivfremove — the erasure split for the vector store (VERDICT r14 #1
  *     economics): one erasure batch deleted from a persisted IVF index by
  *     [[IvfIndex.removeFrom]] (rewrite only touched buckets) vs the full
  *     refit-and-rewrite a pipeline without the delete path runs, plus the
  *     replayed no-op.
  *   bpelearn — [[Bpe.learn]]'s wall at rehearsal scale: nMerges rounds of
  *     one pair-count groupBy over the distinct-word vocabulary.
  *   bm25q — Q-scaling of the query-table-native [[Retrieval.bm25Batch]]
  *     (VERDICT r14 #2): walls at Q = 1 / 16 / 64 over one corpus, same
  *     session (the claim is sub-linear in Q: the corpus tokenize + dl
  *     state is shared, the per-query add is the term-filtered fan-out).
  */
object R15Probe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def ivfRemove(spark: org.apache.spark.sql.SparkSession, t: Tables): Unit = {
    val emb = t.embeddings
    val n = emb.count()
    val k = 64
    val dir = java.nio.file.Files.createTempDirectory("r15ivf").toString
    val (_, wBuild) = time(IvfIndex.save(IvfIndex.build(emb, k), dir))
    println(f"[r15-ivfrm] corpus=$n%d vectors, k=$k%d, build+save $wBuild%.1f s (the nightly artifact)")
    val erase = emb.filter(col("vec_id") % 17 === 0).select(col("vec_id"))
    val (stats, wRm) = time(IvfIndex.removeFrom(spark, dir, erase))
    println(f"[r15-ivfrm] removeFrom: $wRm%.1f s — erased ${stats.nRemoved}%d vectors, " +
      f"rewrote ${stats.rewrittenClusters.size}%d/$k%d buckets (centroids untouched)")
    val (replay, wReplay) = time(IvfIndex.removeFrom(spark, dir, erase))
    println(f"[r15-ivfrm] replayed batch (idempotent no-op): $wReplay%.1f s, " +
      f"removed ${replay.nRemoved}%d, rewrote ${replay.rewrittenClusters.size}%d")
    val survivors = emb.filter(col("vec_id") % 17 =!= 0)
    val dir2 = java.nio.file.Files.createTempDirectory("r15ivf_reb").toString
    val (_, wRebuild) = time(IvfIndex.save(IvfIndex.build(survivors, k), dir2))
    println(f"[r15-ivfrm] full refit over survivors (the no-delete-path alternative): $wRebuild%.1f s")
    // CLUSTERED batch (the common real shape — one tenant/source erased):
    // a %-sampled batch spreads uniformly and touches every bucket, the
    // worst case for bucket-local rewrites; an erasure that lives in a few
    // buckets must cost ∝ those buckets
    val dir3 = java.nio.file.Files.createTempDirectory("r15ivf_clus").toString
    IvfIndex.save(IvfIndex.build(emb, k), dir3)
    val clustered = IvfIndex.load(spark, dir3).assigned
      .filter(col("cluster") < 4).select(col("vec_id"))
      .transform(graft.graph.Materialize.apply)
    val (cs, wClus) = time(IvfIndex.removeFrom(spark, dir3, clustered))
    println(f"[r15-ivfrm] clustered batch (4 buckets' members, ${cs.nRemoved}%d vectors): " +
      f"$wClus%.1f s, rewrote ${cs.rewrittenClusters.size}%d/$k%d buckets")
  }

  private def bpeLearn(spark: org.apache.spark.sql.SparkSession, t: Tables): Unit = {
    val words = t.documents
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val nWords = words.count()
    val nVocab = words.distinct().count()
    val (learned, wLearn) = time(Bpe.learn(words, nMerges = 12))
    println(f"[r15-bpe] learn 12 merges over $nWords%d word occurrences " +
      f"($nVocab%d distinct): $wLearn%.1f s; table=${learned.take(6).mkString(",")}...")
    val (_, wApply) = time {
      t.documents.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .withColumn("m", Bpe.applyLearned(col("word"), learned))
        .withColumn("n_tok", Bpe.tokenCountCol(col("m")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_bpe_tokens"))
        .write.mode("overwrite").format("noop").save()
    }
    println(f"[r15-bpe] apply learned table + per-doc counts: $wApply%.1f s (one scan)")
  }

  private def bm25Q(spark: org.apache.spark.sql.SparkSession, t: Tables): Unit = {
    import spark.implicits._
    val docs = t.documents
    // query terms drawn from the corpus vocabulary (most frequent 256) so
    // every query genuinely matches — the expensive case
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .orderBy(col("count").desc, col("w")).limit(256)
      .select("w").as[String].collect()
    def qtable(q: Int) = (1 to q).flatMap { i =>
      (0 until 3).map(p => (i.toLong, vocab((i * 7 + p * 3) % vocab.length), p))
    }.toDF("query_id", "token", "pos")
    Seq(1, 16, 64).foreach { q =>
      val (_, w) = time(
        Retrieval.bm25Batch(docs, qtable(q), topK = 20)
          .write.mode("overwrite").format("noop").save())
      println(f"[r15-bm25q] Q=$q%-3d: $w%.1f s (3 terms/query, top-20 each)")
    }
  }

  /** Decomposed walls for the ccDecrement floor (VERDICT r14 #4 done
    * clause): the windowed g68 fixture's decrement ALONE and increment
    * ALONE, vs the raw cc(surviving) the floor routes through — so the
    * residual gap over the bare rebuild is attributable (the contract's
    * singleton stitch + the increment's merge machinery, not the relabel).
    */
  private def decSplit(spark: org.apache.spark.sql.SparkSession, t: Tables): Unit = {
    import graft.graph.{Algorithms, GraphBuilder, Materialize}
    val trans = GraphBuilder.userTransitions(t)
      .select(col("src"), col("dst"), col("ts").cast("timestamp_ntz").as("ts"))
      .transform(Materialize.apply)
    def strongWin(at: String) = {
      val hi = lit(at).cast("timestamp_ntz")
      trans.filter(col("ts") > hi - expr("INTERVAL 7 DAYS") && col("ts") <= hi)
        .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2).select("src", "dst")
    }
    val e1 = strongWin("2024-01-10 00:00:00").transform(Materialize.apply)
    val e2 = strongWin("2024-01-20 00:00:00").transform(Materialize.apply)
    val removed = e1.except(e2).transform(Materialize.apply)
    val added = e2.except(e1).transform(Materialize.apply)
    val surviving = e1.join(e2, Seq("src", "dst"), "left_semi")
      .transform(Materialize.apply)
    val base = Algorithms.cc(e1).transform(Materialize.apply)
    println(f"[r15-decsplit] e1=${e1.count()}%d edges, ${base.count()}%d labels, " +
      f"removed=${removed.count()}%d, added=${added.count()}%d")
    val (afterDec, wDec) = time(
      Algorithms.ccDecrement(base, surviving, removed, baseMaterialized = true)
        .transform(Materialize.apply))
    println(f"[r15-decsplit] ccDecrement alone (floored): $wDec%.1f s")
    val (_, wInc) = time(
      Algorithms.ccIncrement(afterDec, added, baseMaterialized = true)
        .write.mode("overwrite").format("noop").save())
    println(f"[r15-decsplit] ccIncrement alone:           $wInc%.1f s")
    val (_, wRebuild) = time(
      Algorithms.cc(e2).write.mode("overwrite").format("noop").save())
    println(f"[r15-decsplit] raw cc(T2 window) rebuild:   $wRebuild%.1f s (no universe stitch)")
  }

  /** The standing-LSH-index ingest split: per arriving batch, dedup via
    * the persisted index (sketch batch → broadcast band join → pruned
    * rerank) vs the no-index alternative (the l02 full recompute: sketch
    * EVERYTHING, self-join, filter cross pairs). Plus the maintenance
    * walls (appendTo, removeFrom contiguous + replay). */
  private def lshSplit(spark: org.apache.spark.sql.SparkSession, t: Tables): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val docs = t.documents
    val n = docs.count()
    val corpus = docs.filter(col("doc_id") % 25 =!= 0)
      .transform(graft.graph.Materialize.apply)
    val batch = docs.filter(col("doc_id") % 25 === 0)
      .unionByName(corpus.filter(col("doc_id") % 41 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000000L)))
      .transform(graft.graph.Materialize.apply)
    val dir = java.nio.file.Files.createTempDirectory("r15lsh").toString
    val (_, wBuild) = time(LshIndex.save(LshIndex.build(corpus), dir))
    println(f"[r15-lsh] corpus=$n%d docs, build+save index $wBuild%.1f s (the nightly artifact)")
    val idx = LshIndex.load(spark, dir)
    val (hits, wProbe) = time {
      val h = idx.probe(batch, corpus).transform(graft.graph.Materialize.apply)
      h.count()
    }
    println(f"[r15-lsh] probe batch (${batch.count()}%d docs) against the index: " +
      f"$wProbe%.1f s, $hits%d near-dup hits")
    // the no-index alternative: the SAME dedup with no standing artifact —
    // re-sketch the whole corpus, then probe (what l02/l46-style per-run
    // recomputation costs an ingest pipeline per batch)
    val (nFull, wFull) = time {
      LshIndex.build(corpus).probe(batch, corpus)
        .transform(graft.graph.Materialize.apply).count()
    }
    println(f"[r15-lsh] no-index recompute (re-sketch corpus + probe): $wFull%.1f s, $nFull%d hits")
    val (_, wAppend) = time(LshIndex.appendTo(spark, dir,
      batch.withColumn("doc_id", col("doc_id") + lit(2000000000L))))
    println(f"[r15-lsh] appendTo (ingest the deduped batch): $wAppend%.1f s")
    val lo = corpus.agg(min(col("doc_id"))).head().getLong(0)
    val erase = corpus.filter(col("doc_id") < lo + 600000L).select("doc_id")
    val (rs, wRm) = time(LshIndex.removeFrom(spark, dir, erase))
    println(f"[r15-lsh] removeFrom contiguous batch (${rs.nDocsRemoved}%d docs): " +
      f"$wRm%.1f s, rewrote ${rs.rewrittenShards.size}%d shards")
    val (rs2, wRm2) = time(LshIndex.removeFrom(spark, dir, erase))
    println(f"[r15-lsh] replayed erasure (no-op): $wRm2%.1f s, removed ${rs2.nDocsRemoved}%d")
  }

  /** PQ economics at rehearsal scale: codebook fit + encode (the
    * build-once cost), the per-query ADC scan over codes, and the exact
    * brute-force cosine scan it replaces (the 32×-fewer-bytes claim's
    * wall-clock shadow at a size where everything still fits in page
    * cache — the byte ratio, not the wall, is the 100 TB argument). */
  private def pqSplit(spark: org.apache.spark.sql.SparkSession, t: Tables): Unit = {
    import graft.text.Pq
    graft.functions.GraftFunctions.register(spark)
    val emb = t.embeddings
    val n = emb.count()
    val corp = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
      .transform(graft.graph.Materialize.apply)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id"), col("embedding"))
      .transform(graft.graph.Materialize.apply)
    val ((cb, codes0), wFit) = time {
      val r = Pq.model(corp, m = 8, k = 16)
      (r._1.transform(graft.graph.Materialize.apply),
       r._2.transform(graft.graph.Materialize.apply))
    }
    println(f"[r15-pq] corpus=$n%d vectors: codebook fit + encode $wFit%.1f s " +
      f"(${codes0.count()}%d code rows — the build-once artifact)")
    val packed = Pq.pack(codes0, m = 8).transform(graft.graph.Materialize.apply)
    println(f"[r15-pq] packed code rows: ${packed.count()}%d (one per vector)")
    val (_, wAdc) = time(
      Pq.adc(cb, codes0, q, m = 8)
        .orderBy(col("pq_d2"), col("vec_id")).limit(50)
        .write.mode("overwrite").format("noop").save())
    println(f"[r15-pq] ADC top-50, join form over 8x code rows: $wAdc%.1f s")
    val (_, wPacked) = time(
      Pq.adcPacked(cb, packed, q, m = 8)
        .orderBy(col("pq_d2"), col("vec_id")).limit(50)
        .write.mode("overwrite").format("noop").save())
    println(f"[r15-pq] ADC top-50, PACKED serving scan: $wPacked%.1f s (no join, no float read)")
    val (_, wExact) = time(
      corp.crossJoin(broadcast(q.select(col("embedding").as("qv"))))
        .withColumn("cos", expr("cosine_sim(embedding, qv)"))
        .orderBy(col("cos").desc, col("vec_id")).limit(50)
        .write.mode("overwrite").format("noop").save())
    println(f"[r15-pq] exact brute cosine top-50: $wExact%.1f s (reads every float vector)")
    // the byte footprint — the claim that survives to 100 TB
    val d1 = java.nio.file.Files.createTempDirectory("r15pq_codes").toString
    val d2 = java.nio.file.Files.createTempDirectory("r15pq_vecs").toString
    packed.write.mode("overwrite").parquet(d1)
    corp.write.mode("overwrite").parquet(d2)
    def dirBytes(p: String): Long = {
      val f = new java.io.File(p)
      f.listFiles().filter(_.isFile).map(_.length).sum
    }
    println(f"[r15-pq] on-disk: packed codes ${dirBytes(d1) / 1024}%d KiB vs " +
      f"float vectors ${dirBytes(d2) / 1024}%d KiB")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/sf6.4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)
    args.headOption.getOrElse("ivfremove") match {
      case "ivfremove" => ivfRemove(spark, t)
      case "bpelearn" => bpeLearn(spark, t)
      case "bm25q" => bm25Q(spark, t)
      case "decsplit" => decSplit(spark, t)
      case "lshsplit" => lshSplit(spark, t)
      case "pq" => pqSplit(spark, t)
      case other => sys.error(s"unknown probe '$other' (ivfremove|bpelearn|bm25q|decsplit|lshsplit|pq)")
    }
    spark.stop()
  }
}
