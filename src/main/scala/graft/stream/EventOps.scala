package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming operators (SURVEY.md §2.4) — the streaming form of
  * the reference's temporal-evolution feature (/root/reference/README.md:17).
  *
  * Design: every transform here takes/returns DataFrames so the SAME code
  * shape runs on `readStream` (incremental, StateStore-backed) and on batch
  * reads — the graded batch twins in StreamQueries assert the semantics via
  * the DuckDB oracle, and StreamingSpec asserts the incremental behaviors
  * (watermark late-drop, session merge, stateful dedup) that batch can't.
  *
  * Scale posture: all stateful ops are keyed (shuffle by key, per-key state
  * in the StateStore); watermarks bound state size — without them the 100 TB
  * stream would accrete unbounded window/dedup state.
  */
object EventOps {

  /** T1 — tumbling 1h counts per event type, watermarked. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))

  /** T2 — sliding 1h/15min counts. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("win_start"), col("cnt"), col("n_users"))

  /** T3 — per-user session windows with a 30-minute gap. */
  def sessionize(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"), col("user_id"), col("n_events"))

  /** T5 — stateful dedup by event_id within the watermark horizon. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** T7 — stream-static enrichment join (static side broadcast by Catalyst). */
  def enrich(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left_outer")

  /** T15 — fan-in alert: targets contacted by ≥ `minDistinct` DISTINCT
    * sources within one tumbling 6 h window (the structuring/funnel signal;
    * g63 is the sliding-precision batch sibling). Streaming aggregation
    * cannot COUNT(DISTINCT), so the op uses the append-legal
    * DEDUP-THEN-COUNT decomposition: dropDuplicates on (window, src, dst)
    * — a chained stateful op whose state the watermark bounds (the window
    * column carries the event-time attribute) — then a plain windowed
    * count, which now counts exactly the distinct sources. The SAME code
    * runs the graded batch twin (watermark added by the streaming caller;
    * in batch, dedup-then-count ≡ countDistinct — StreamingSpec proves
    * streaming ≡ batch on a MemoryStream).
    */
  def faninAlerts(transitions: DataFrame, minDistinct: Long = 3L): DataFrame =
    transitions
      .withColumn("win", window(col("ts"), "6 hours"))
      .dropDuplicates("win", "src", "dst")
      .groupBy(col("win"), col("dst"))
      .agg(count(lit(1)).as("n_distinct_src"))
      .filter(col("n_distinct_src") >= minDistinct)
      .select(unix_timestamp(col("win.start")).as("win_start_s"),
              col("dst").as("user"), col("n_distinct_src"))

  /** T16 — FIRST-CONTACT detection: incremental graph maintenance in
    * streaming form. Per source, the stream of counterparties it has
    * NEVER touched before, each stamped with its running distinct-degree
    * (nth) — "account A just paid someone new, their 47th counterparty"
    * is a screening signal AND the incremental build of the interaction
    * graph: the per-key state IS the adjacency (distinct neighbor ids),
    * so the StateStore maintains the graph edge set as the feed arrives.
    * State is bounded by the DISTINCT edge count (what a batch rebuild
    * would materialize anyway — incremental maintenance always carries
    * the maintained structure); a bounded deployment uses
    * [[firstContactsTtl]], which expires idle sources on an event-time
    * TTL and buffers out-of-order arrivals behind its watermark.
    * Within-batch rows process in (ts, dst) order so emission matches
    * the batch twin's (first_ts, dst) ranking; cross-batch out-of-order
    * arrivals are the documented caveat of THIS unbounded variant (a
    * production feed buffers by watermark upstream). StreamingSpec
    * proves repeat-contact suppression ACROSS batches and nth
    * continuity.
    */
  def firstContacts(transitions: Dataset[Trn]): Dataset[FirstContact] = {
    import transitions.sparkSession.implicits._
    transitions.groupByKey(_.src)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (src: Long, rows: Iterator[Trn], state: GroupState[NeighborState]) => {
          var seen = state.getOption.map(_.neighbors.toSet).getOrElse(Set.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer[FirstContact]()
          // micro-precision sort key (getTime alone truncates to millis —
          // the microTs lesson); ties then break on dst, the twin's rule
          rows.toSeq.sortBy(r =>
              (r.ts.getTime / 1000 * 1000000L + r.ts.getNanos / 1000, r.dst))
            .foreach { r =>
            if (!seen.contains(r.dst)) {
              seen = seen + r.dst
              out += FirstContact(src, r.dst, r.ts, seen.size.toLong)
            }
          }
          state.update(NeighborState(seen.toArray.sorted))
          out.iterator
        })
  }

  /** T16b — TTL-BOUNDED first-contact detection (VERDICT r12 #7): the
    * bounded-deployment form of [[firstContacts]]. The unbounded variant's
    * per-source adjacency grows with distinct edges forever; here the
    * state EXPIRES `ttl` (event time) after the source's LAST activity —
    * the EventTimeTimeout mechanism shared with [[activeUserCounts]], so
    * the StateStore only ever holds sources active within the horizon.
    * Semantics trade-off, explicit in the type: within the horizon,
    * suppression and nth are identical to [[firstContacts]]; after a
    * source's state expires, a re-contact legitimately re-emits as a
    * first contact with nth restarting at 1 ("first contact in the last
    * N days" — the screening question a bounded deployment actually
    * asks). Expiry is OBSERVABLE: a terminal record with `expired=true`
    * carries the dropped adjacency's size. Requires a watermark
    * (`watermarkDelay`) — event-time timeouts fire as the watermark
    * passes them; the watermark is also what buffers cross-batch
    * out-of-order arrivals up to the delay (the [[firstContacts]]
    * caveat, here an enforced parameter instead of a comment).
    */
  def firstContactsTtl(transitions: Dataset[Trn], ttlMs: Long,
                       watermarkDelay: String = "10 minutes"): Dataset[FirstContactTtl] = {
    import transitions.sparkSession.implicits._
    transitions.withWatermark("ts", watermarkDelay)
      .groupByKey(_.src)
      .flatMapGroupsWithState[NeighborState, FirstContactTtl](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (src: Long, rows: Iterator[Trn], state: GroupState[NeighborState]) =>
          if (state.hasTimedOut) {
            val dropped = state.get.neighbors.length.toLong
            state.remove()
            Iterator.single(FirstContactTtl(src, -1L, null, dropped, expired = true))
          } else {
            var seen = state.getOption.map(_.neighbors.toSet).getOrElse(Set.empty[Long])
            val out = scala.collection.mutable.ArrayBuffer[FirstContactTtl]()
            val sorted = rows.toSeq.sortBy(r =>
              (r.ts.getTime / 1000 * 1000000L + r.ts.getNanos / 1000, r.dst))
            sorted.foreach { r =>
              if (!seen.contains(r.dst)) {
                seen = seen + r.dst
                out += FirstContactTtl(src, r.dst, r.ts, seen.size.toLong, expired = false)
              }
            }
            state.update(NeighborState(seen.toArray.sorted))
            // horizon anchored on the key's newest activity: quiet sources
            // age out, active sources keep their adjacency alive
            state.setTimeoutTimestamp(sorted.map(_.ts.getTime).max + ttlMs)
            out.iterator
          }
      }
  }

  /** T9 — stream-stream interval join: each event paired with the same
    * user's follow-up events in (ts, ts + 1h]. Both sides are watermarked
    * and the range predicate is what lets the symmetric hash join EVICT
    * buffered rows once they age past watermark + interval — bounded
    * per-key state, the property that makes a stream-stream join viable on
    * an unbounded feed (an unconstrained equi-join would buffer both
    * streams forever). Batch twin: same code, watermark is a no-op.
    */
  /** `joinType` "inner" emits matches as they arrive; "left_outer" also
    * emits unmatched left rows (with nulls) once the watermark proves no
    * in-interval match can still show up — the streaming form of "which
    * events never got a follow-up".
    */
  def followUps(lhs: DataFrame, rhs: DataFrame, joinType: String = "inner"): DataFrame = {
    val a = lhs.withWatermark("ts", "10 minutes").alias("a")
    val b = rhs.withWatermark("ts", "10 minutes").alias("b")
    a.join(b,
        col("a.user_id") === col("b.user_id") &&
        col("b.ts") > col("a.ts") &&
        col("b.ts") <= col("a.ts") + expr("INTERVAL 1 HOUR"),
        joinType)
      .select(col("a.event_id").as("eid"), col("b.event_id").as("fid"),
              col("a.user_id").as("user_id"),
              col("a.ts").as("ts_a"), col("b.ts").as("ts_b"))
  }

  /** Shared semantics of the two T6 implementations — keeping the fold in
    * one place so the flatMapGroupsWithState and transformWithState paths
    * cannot drift apart.
    * Sort key is micro-precision: getTime alone truncates to millis and can
    * misorder same-millisecond events.
    */
  private[stream] def microTs(e: Ev): (Long, Long) =
    (e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000, e.event_id)

  private[stream] def advance(prev: UserState, evs: Iterator[Ev]): Option[UserState] = {
    val sorted = evs.toSeq.sortBy(microTs)
    if (sorted.isEmpty) None
    else Some(UserState(prev.n + sorted.size, sorted.last.event_type))
  }

  /** T6b — bounded state via EVENT-TIME TIMEOUT: per-user activity counter
    * whose state EXPIRES 30 minutes (event time) after the user's last
    * event. This is the mechanism that keeps arbitrary-state operators from
    * accreting dead keys at 100 TB — the watermark drives expiry, the store
    * only ever holds users active within the horizon. Expiry is observable:
    * a final record with `expired = true` is emitted when the state drops.
    */
  def activeUserCounts(events: Dataset[Ev]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, ActiveUpdate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val prev = state.get
            state.remove()
            Iterator(ActiveUpdate(user, prev.n, expired = true))
          } else {
            val sorted = evs.toSeq.sortBy(microTs)
            val prev = state.getOption.getOrElse(UserState(0L, ""))
            val next = UserState(prev.n + sorted.size, sorted.last.event_type)
            state.update(next)
            val lastMs = sorted.map(_.ts.getTime).max
            state.setTimeoutTimestamp(lastMs + 30L * 60 * 1000)
            Iterator(ActiveUpdate(user, next.n, expired = false))
          }
      }.toDF()
  }

  /** T6 — arbitrary running state per user: event count + last event type,
    * emitted on every update (flatMapGroupsWithState).
    */
  def runningUserState(events: Dataset[Ev]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, ""))
          advance(prev, evs) match {
            case None => Iterator.empty
            case Some(next) =>
              state.update(next)
              Iterator(UserUpdate(user, next.n, next.lastType))
          }
      }.toDF()
  }
}

/** T6, Spark 4 `transformWithState` form: the same running-user-state
  * semantics on the new StatefulProcessor API (versioned per-key state in
  * the RocksDB StateStore — the at-scale provider; ValueState generalizes
  * to List/MapState for richer entity state without re-serializing blobs).
  */
class RunningUserProcessor extends StatefulProcessor[Long, Ev, UserUpdate] {
  @transient private var st: ValueState[UserState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[UserState]("userState", Encoders.product[UserState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Ev],
                               timerValues: TimerValues): Iterator[UserUpdate] = {
    val prev = Option(st.get()).getOrElse(UserState(0L, ""))
    EventOps.advance(prev, rows) match {
      case None => Iterator.empty
      case Some(next) =>
        st.update(next)
        Iterator.single(UserUpdate(key, next.n, next.lastType))
    }
  }
}

object RunningUserStateV2 {
  def apply(events: Dataset[Ev]): Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningUserProcessor, TimeMode.None(), OutputMode.Update())
  }
}

case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double)
/** An interaction/transition record — [[EventOps.faninAlerts]]'s input unit
  * (in production the transition feed arrives as such; the graded batch
  * twin derives it via GraphBuilder.userTransitions). */
case class Trn(src: Long, dst: Long, ts: java.sql.Timestamp)
/** [[EventOps.firstContacts]] per-source state: the maintained adjacency. */
case class NeighborState(neighbors: Array[Long])
case class FirstContact(src: Long, dst: Long, ts: java.sql.Timestamp, nth: Long)
/** [[EventOps.firstContactsTtl]] output: first contacts within the TTL
  * horizon, plus observable expiry markers (dst = -1, ts = null, nth =
  * size of the dropped adjacency, expired = true). */
case class FirstContactTtl(src: Long, dst: Long, ts: java.sql.Timestamp,
                           nth: Long, expired: Boolean)
case class UserState(n: Long, lastType: String)
case class UserUpdate(user_id: Long, n_events: Long, last_type: String)
case class ActiveUpdate(user_id: Long, n_events: Long, expired: Boolean)
