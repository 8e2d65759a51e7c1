package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{IvfIndex, LshIndex, Pq}

/** Streaming maintenance of the TEXT indexes (VERDICT r15 #6 — the
  * t18/CcMaintain `foreachBatch` pattern applied to the standing dedup /
  * vector artifacts): a curation pipeline's ingest loop receives SIGNED
  * micro-batches — arrivals carrying payload, erasures carrying ids (the
  * t17c/g69 signed-fold convention) — and folds each into the PERSISTED
  * index directories with the artifacts' own maintenance verbs:
  *
  *   - [[LshIndex.appendTo]] / [[LshIndex.removeFrom]] for the dedup
  *     bucket table (sketch only the batch; erasure rewrites only touched
  *     shards),
  *   - [[IvfIndex.appendTo]] / [[IvfIndex.removeFrom]] for the vector
  *     store (assign against the standing centroids; bucket-local
  *     erasure),
  *   - [[Pq.encodeTo]] / [[Pq.removeFrom]] for the serving code table
  *     (encode against the FIXED codebooks; shard-local erasure).
  *
  * WITHIN-BATCH ORDER: erasures apply FIRST, then arrivals — so a doc id
  * that is erased and re-ingested in the SAME micro-batch lands in its
  * new form (upsert semantics), matching the fold-over-time order of the
  * same events split across batches. Replay posture: the ERASURE leg is
  * idempotent on its own (unknown ids touch nothing — the g69/l47c
  * contract); the APPEND leg, like any file-appending sink, relies on the
  * standard foreachBatch exactly-once discipline — the caller skips
  * batchIds it has already committed.
  *
  * Quantizer/codebook drift from accumulated arrivals stays the periodic
  * refit's job ([[IvfIndex.refreshSampled]] / a PQ refit + save) — the
  * ingest path never refits, which is exactly what makes it cheap:
  * per batch the work is ∝ batch (one sketch/assign/encode pass + an
  * erasure's touched-shard rewrites), never ∝ index.
  *
  * StreamingSpec proves the cross-batch contract end to end: after a feed
  * of arrivals and erasures split across micro-batches, the maintained
  * LshIndex probes IDENTICALLY to a from-scratch build over the surviving
  * docs, and the maintained IvfIndex's assignments equal a one-pass
  * assignment of the surviving vectors against the standing centroids
  * (the append contract — centroid refresh is a refit concern, above).
  */
object IndexMaintain {

  /** Fold one signed micro-batch of documents into a persisted
    * [[LshIndex]] directory. `batch` carries (doc_id, text, erased);
    * erased rows' text is ignored. Erasures first (see object doc). */
  def applyDocBatch(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val erase = batch.filter(col("erased")).select(col("doc_id"))
    val arrivals = batch.filter(!col("erased")).select(col("doc_id"), col("text"))
    if (!erase.isEmpty) LshIndex.removeFrom(spark, dir, erase)
    if (!arrivals.isEmpty) LshIndex.appendTo(spark, dir, arrivals)
  }

  /** Fold one signed micro-batch of vectors into a persisted
    * [[IvfIndex]] directory. `batch` carries (vec_id, embedding, erased);
    * erased rows' embedding is ignored. */
  def applyVecBatch(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val erase = batch.filter(col("erased")).select(col("vec_id"))
    val arrivals = batch.filter(!col("erased")).select(col("vec_id"), col("embedding"))
    if (!erase.isEmpty) IvfIndex.removeFrom(spark, dir, erase)
    if (!arrivals.isEmpty) IvfIndex.appendTo(spark, dir, arrivals)
  }

  /** Fold one signed micro-batch of vectors into a persisted [[Pq]] code
    * table. Same batch shape as [[applyVecBatch]] — a deployment that
    * serves IVF-PQ runs both against the same feed. */
  def applyCodeBatch(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val erase = batch.filter(col("erased")).select(col("vec_id"))
    val arrivals = batch.filter(!col("erased")).select(col("vec_id"), col("embedding"))
    if (!erase.isEmpty) Pq.removeFrom(spark, dir, erase)
    if (!arrivals.isEmpty) Pq.encodeTo(spark, dir, arrivals)
  }
}

/** Signed document event for the ingest feed (erased=true ⇒ text unused). */
case class DocEvent(doc_id: Long, text: String, erased: Boolean)

/** Signed vector event for the ingest feed (erased=true ⇒ embedding unused). */
case class VecEvent(vec_id: Long, embedding: Seq[Double], erased: Boolean)
