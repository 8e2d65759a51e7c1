package graft.stream

import graft.rel.FuzzyJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming watchlist screening — the CONTINUOUS form of the fuzzy
  * entity-resolution family (reference README.md:15 "shared directors,
  * common registered addresses"; README.md:4-6 "untangle complex corporate
  * webs... in seconds"): every incoming record whose `name` is within
  * Levenshtein distance `maxDist` of a watchlist entry is flagged, as it
  * arrives, without ever comparing against the whole list.
  *
  * Shape: the watchlist (small — sanctions/PEP lists are thousands to
  * low millions of rows) is expanded into its symmetric-delete key index
  * ([[graft.rel.FuzzyJoin.deletionKeys]]; losslessness proof there) and
  * BROADCAST; the record stream explodes its own deletion keys and
  * broadcast-hash-joins the index. The stream side therefore NEVER
  * shuffles — on a 1000-executor cluster each executor screens its own
  * partitions against the replicated index, which is the only viable plan
  * when the stream is the 100 TB side.
  *
  * Statelessness: every operator here (explode, broadcast join, filter) is
  * per-row, so the same code runs on a `readStream` DataFrame in append
  * mode with NO StateStore and no watermark requirement — flagging latency
  * is one microbatch, and a watchlist refresh is a new broadcast next
  * batch. The usual candidate dedup (a pair can share several deletion
  * keys) cannot use `distinct`/`groupBy` on a stream (stateful); instead
  * the join keeps exactly the row matched on the lexicographically
  * SMALLEST shared key (`array_min(array_intersect(...))` — deterministic,
  * codegen-resident), which yields one output row per (record, watchlist
  * entry) with no state at all.
  */
object Screening {

  /** Flag records whose `name` is within lev ≤ `maxDist` of a watchlist
    * entry. `records` carries (name, ...passthrough columns) — batch or
    * streaming; `watchlist` is a STATIC (wid, wname) table. Output: every
    * input column of `records` plus (wid, wname, dist), one row per
    * (record, matched entry), dist ≤ maxDist. Tiers as in
    * [[graft.rel.FuzzyJoin.selfJoinLev]]: 1 = linear key fan-out
    * (board-wide), 2 = quadratic (drill-down; also squares the broadcast
    * index — size it before escalating).
    */
  def screen(records: DataFrame, watchlist: DataFrame, maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"unsupported tier: lev<=$maxDist")
    def keys(c: org.apache.spark.sql.Column) =
      if (maxDist == 1) FuzzyJoin.deletionKeys(c) else FuzzyJoin.deletionKeys2(c)
    val wl = broadcast(
      watchlist.withColumn("w_keys", keys(col("wname")))
        .select(col("wid"), col("wname"), col("w_keys"),
                explode(col("w_keys")).as("key")))
    records
      .withColumn("r_keys", keys(col("name")))
      .withColumn("key", explode(col("r_keys")))
      .join(wl, Seq("key"))
      .filter(col("key") === array_min(array_intersect(col("r_keys"), col("w_keys"))))
      .withColumn("dist", levenshtein(col("name"), col("wname")).cast("int"))
      .filter(col("dist") <= maxDist)
      .drop("key", "r_keys", "w_keys")
  }
}
