package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.LshIndex

/** The standing dedup index's contract (round 15 — the dedup family's
  * maintained artifact, mirroring IvfIndexSpec): the persisted layout
  * round-trips and probes identically to the in-memory build, append
  * equals the rebuild over the union (signatures are per-document),
  * erasure rewrites only the shards holding deleted docs (byte-identity
  * for the rest, replay no-op), and probe semantics match the graded
  * l02 pipeline's collisions exactly.
  */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private lazy val docs = Tables(spark, sfDir).documents
  private lazy val corpus = docs.filter(col("doc_id") % 25 =!= 0)
  private lazy val batch = docs.filter(col("doc_id") % 25 === 0)
    .unionByName(corpus.filter(col("doc_id") % 41 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000000L)))
  private lazy val built = LshIndex.build(corpus)

  private def probeSet(idx: LshIndex): Set[(Long, Long, Double)] =
    idx.probe(batch, corpus).as[(Long, Long, Double)].collect().toSet

  private def shardListing(dir: String): Map[String, Seq[String]] = {
    val root = new java.io.File(dir, "buckets")
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .map(d => d.getName ->
        d.listFiles().map(f => f.getName + ":" + f.length).sorted.toSeq)
      .toMap
  }

  test("re-crawled docs always surface at jaccard_dist 0 against their originals") {
    val hits = probeSet(built)
    assert(hits.nonEmpty)
    val recrawls = corpus.filter(col("doc_id") % 41 === 0)
      .select("doc_id").as[Long].collect().toSet
    // every re-crawl with >= 3 words must hit its original exactly
    val eligible = corpus.filter(col("doc_id") % 41 === 0)
      .filter(size(split(col("text"), " ")) >= 3)
      .select("doc_id").as[Long].collect().toSet
    eligible.foreach { id =>
      assert(hits.contains((id + 1000000000L, id, 0.0)),
        s"re-crawl of $id did not surface as an exact dup")
    }
    assert(recrawls.nonEmpty && eligible.nonEmpty)
  }

  test("probe from the persisted index equals the in-memory probe; save/load round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("lsh").toString
    LshIndex.save(built, dir, rowsPerShard = 64)
    val loaded = LshIndex.load(spark, dir)
    assert(loaded.bandRows === built.bandRows)
    val lb = loaded.buckets.as[(Long, Int, Long)].collect().toSet
    val bb = built.buckets.as[(Long, Int, Long)].collect().toSet
    assert(lb === bb)
    assert(probeSet(loaded) === probeSet(built))
  }

  test("appendTo equals the rebuild over the union (per-document signatures)") {
    val half1 = corpus.filter(col("doc_id") % 2 === 0)
    val half2 = corpus.filter(col("doc_id") % 2 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("lsh").toString
    LshIndex.save(LshIndex.build(half1), dir, rowsPerShard = 64)
    LshIndex.appendTo(spark, dir, half2)
    val appended = LshIndex.load(spark, dir)
    val rebuilt = LshIndex.build(corpus)
    assert(appended.buckets.as[(Long, Int, Long)].collect().toSet ===
           rebuilt.buckets.as[(Long, Int, Long)].collect().toSet)
    assert(probeSet(appended) === probeSet(rebuilt))
  }

  test("removeFrom rewrites only touched shards, drops emptied ones, is replay-idempotent, and erased docs never re-surface") {
    val dir = java.nio.file.Files.createTempDirectory("lsh").toString
    LshIndex.save(built, dir, rowsPerShard = 64)
    val before = shardListing(dir)
    // a CONTIGUOUS erasure batch (one crawl's id range — the layout's
    // designed-for shape): every indexed doc in [64, 128) = shard 1 in
    // full, plus a couple of strays from shard 3
    val eraseIds = corpus.filter(
        (col("doc_id") >= 64 && col("doc_id") < 128) ||
        col("doc_id").isin(200L, 201L))
      .select("doc_id")
    val stats = LshIndex.removeFrom(spark, dir, eraseIds)
    assert(stats.nDocsRemoved === eraseIds.count())
    assert(stats.rewrittenShards.toSet === Set(1L, 3L),
      s"contiguous batch must touch exactly its shards: ${stats.rewrittenShards}")
    val after = shardListing(dir)
    // shard 1 lost every doc -> directory dropped; untouched shards byte-identical
    assert(!after.contains("shard=1"),
      "shard 1 lost every row but its directory survived")
    (before.keySet - "shard=1" - "shard=3").foreach { d =>
      assert(after.get(d) === before.get(d),
        s"$d outside the rewrite set changed on disk")
    }
    // erased docs never surface as candidates again
    val erased = eraseIds.as[Long].collect().toSet
    val hits = LshIndex.load(spark, dir).probe(batch, corpus)
      .as[(Long, Long, Double)].collect()
    assert(!hits.exists(h => erased(h._2)),
      "an erased doc surfaced as a dedup candidate")
    // and equals the in-memory remove
    assert(hits.toSet === probeSet(built.remove(eraseIds)))
    // replay: the same batch again is a no-op on disk
    val replay = LshIndex.removeFrom(spark, dir, eraseIds)
    assert(replay.nDocsRemoved === 0L && replay.rewrittenShards.isEmpty)
    assert(shardListing(dir) === after)
  }

  test("the index buckets ARE the graded l02 pipeline's buckets (single-sourcing)") {
    // l02's self-join collisions restricted to cross-slice = the probe's
    // candidate semantics; spot-check via the graded l52 slice equality
    val graded = SparkEntry.queries("l52_dedup_incremental")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(graded === probeSet(built))
  }
}
