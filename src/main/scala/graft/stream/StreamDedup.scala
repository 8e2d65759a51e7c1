package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the incremental twin of the batch
  * SimHash band index (text/LlmQueries l04b; Manku et al. 2007): 64-bit
  * simhash per document, 4×16-bit band keys, keep-first dedup state PER
  * BAND BUCKET. A document within hamming ≤ 3 of any retained document
  * shares at least one band with it (pigeonhole), so bucket-local state is
  * a lossless index for the predicate — the same guarantee the batch tier
  * proves by brute force, carried into the incremental path.
  *
  * Scale posture: state is keyed by (band, bandValue) — it shards with the
  * shuffle, each bucket holds only its colliding fingerprints (16 bytes per
  * retained doc), and a real deployment bounds it with a state TTL the same
  * way the T-series ops use watermarks. The fingerprint is computed per-row
  * at ingest (no aggregation), so the map side stays embarrassingly
  * parallel at any rate.
  */
object StreamDedup {
  final case class Doc(doc_id: Long, text: String)
  final case class DupHit(doc_id: Long, dup_of: Long, hamming: Int)

  /** Per-row 64-bit Charikar simhash: per-token 64-bit hash (two seeded
    * 32-bit murmur halves), ±1 bit votes, sign fold. Deterministic.
    */
  def fingerprint64(text: String): Long = {
    val votes = new Array[Int](64)
    text.split(" ").foreach { tok =>
      val lo = scala.util.hashing.MurmurHash3.stringHash(tok, 42).toLong & 0xffffffffL
      val hi = scala.util.hashing.MurmurHash3.stringHash(tok, 43).toLong & 0xffffffffL
      val h = (hi << 32) | lo
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) != 0) 1 else -1); b += 1
      }
    }
    (0 until 64).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
  }

  /** Streamed keep-first near-dup detection: emits a [[DupHit]] for every
    * arriving document within hamming ≤ 3 of an earlier-retained one (a hit
    * can surface from several bands — dedup downstream by doc_id if one row
    * per dup is required). Works identically over `readStream` (StateStore-
    * backed) and batch Datasets.
    */
  def nearDupStream(docs: Dataset[Doc]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .map(d => (d.doc_id, fingerprint64(d.text)))
      .flatMap { case (id, fp) =>
        (0 until 4).map(b => (b, (fp >>> (16 * b)) & 0xffffL, id, fp))
      }
      .groupByKey { case (band, bv, _, _) => (band, bv) }
      .flatMapGroupsWithState[Seq[(Long, Long)], DupHit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long, Long)],
         state: GroupState[Seq[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer[DupHit]()
          // deterministic intra-batch order: by doc id
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, fp) =>
            seen.find { case (pid, pfp) =>
              pid != id && java.lang.Long.bitCount(pfp ^ fp) <= 3
            } match {
              case Some((pid, pfp)) =>
                out += DupHit(id, pid, java.lang.Long.bitCount(pfp ^ fp))
              case None =>
                // keep-first: only originals enter the index
                seen = seen :+ ((id, fp))
            }
          }
          state.update(seen)
          out.iterator
      }.toDF()
  }
}
