package graft

import org.apache.spark.sql.functions._

/** l51 sequence-packing semantics beyond the oracle hash: the per-bin
  * table cross-checked against an independent driver-side greedy fold,
  * plus the packing invariants (capacity, density, conservation,
  * greedy-tightness).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val C = 512L

  private lazy val bins = SparkEntry.queries("l51_pack_sequences")(spark, sfDir)
    .as[(Long, Long, Long, Long)].collect().toSeq

  private lazy val docs = Tables(spark, sfDir).documents
    .select((col("doc_id") % 8).as("shard"), col("doc_id"),
      size(filter(split(col("text"), " "), w => w =!= "")).cast("long").as("tokens"))
    .as[(Long, Long, Long)].collect().sortBy(d => (d._1, d._2)).toSeq

  test("packing equals an independent driver-side greedy fold, bin for bin") {
    val want = docs.groupBy(_._1).toSeq.flatMap { case (shard, ds) =>
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      var bin = 0L; var tok = 0L; var n = 0L
      ds.sortBy(_._2).foreach { case (_, _, t) =>
        if (n > 0 && tok + t > C) { out += ((shard, bin, n, tok)); bin += 1; tok = 0; n = 0 }
        tok += t; n += 1
      }
      if (n > 0) out += ((shard, bin, n, tok))
      out
    }.sortBy(b => (b._1, b._2))
    assert(bins.nonEmpty && bins === want)
  }

  test("capacity: a bin exceeds C only when it holds a single oversize document") {
    bins.foreach { case (shard, bin, n, tok) =>
      assert(tok <= C || n == 1L,
        s"shard $shard bin $bin holds $n docs at $tok tokens > $C")
    }
  }

  test("density and conservation: bin ids are 0..max per shard; docs and tokens are conserved") {
    bins.groupBy(_._1).foreach { case (shard, bs) =>
      val ids = bs.map(_._2).sorted
      assert(ids === (0L until ids.length).toSeq, s"shard $shard bins not dense: $ids")
      val dShard = docs.filter(_._1 == shard)
      assert(bs.map(_._3).sum === dShard.length.toLong, s"shard $shard lost docs")
      assert(bs.map(_._4).sum === dShard.map(_._3).sum, s"shard $shard lost tokens")
    }
  }

  test("greedy tightness: the first doc of every bin would have overflowed the previous bin") {
    // replay the assignment from the reference fold to get each bin's
    // first doc, then check the greedy invariant that MAKES it greedy
    docs.groupBy(_._1).foreach { case (shard, ds) =>
      var bin = 0L; var tok = 0L; var n = 0L
      var prevBinTokens = -1L
      ds.sortBy(_._2).foreach { case (_, _, t) =>
        if (n > 0 && tok + t > C) {
          prevBinTokens = tok; bin += 1; tok = 0; n = 0
          assert(prevBinTokens + t > C,
            s"shard $shard bin $bin opened without overflow pressure")
        }
        tok += t; n += 1
      }
    }
  }
}
