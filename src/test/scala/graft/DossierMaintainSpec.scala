package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The increment≡rebuild algebra behind t17 (VERDICT r12 #3): the graded
  * hash proves one split at sf0.01 against the no-split oracle; this pins
  * the monoid properties that make it hold for ANY split — multi-step
  * folds, the empty delta as identity, merge commutativity, and the
  * never-ordered watched entity surviving from the seed with
  * (0, 0.00, never).
  */
class DossierMaintainSpec extends SparkSpec {
  import spark.implicits._
  import stream.DossierMaintain._

  private def ordersDf(rows: Seq[(Long, Long, String, String)]): DataFrame =
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"),
        col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"))

  private val wl = Seq(1L, 2L, 3L).toDF("wid")

  private val orders = ordersDf(Seq(
    (100L, 1L, "10.50", "1995-03-01 00:00:00"),
    (101L, 1L, "20.25", "1997-07-15 00:00:00"),
    (102L, 1L, "5.00", "1999-01-02 00:00:00"),
    (103L, 2L, "99.99", "1996-06-30 00:00:00"),
    (104L, 9L, "77.00", "1996-01-01 00:00:00"))) // not watched -> pruned

  private def snap(df: DataFrame): Set[(Long, Long, Double, String)] =
    present(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet

  private val rebuilt = merge(seed(wl), orderDelta(wl, orders))

  test("any fold of slices equals the full rebuild row-for-row (incl. the never-ordered entity)") {
    val s1 = orders.filter(col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    val s2 = orders.filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz")
      && col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    val s3 = orders.filter(col("o_orderdate") >= lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    val folded = merge(merge(merge(seed(wl), orderDelta(wl, s1)), orderDelta(wl, s2)),
                       orderDelta(wl, s3))
    assert(snap(folded) === snap(rebuilt))
    // and the values themselves are right, not just self-consistent
    assert(snap(folded) === Set(
      (1L, 3L, 35.75, "1999-01-02"),
      (2L, 1L, 99.99, "1996-06-30"),
      (3L, 0L, 0.0, "never")))
  }

  test("the empty delta is the merge identity") {
    val none = orderDelta(wl, orders.filter(lit(false)))
    assert(snap(merge(rebuilt, none)) === snap(rebuilt))
  }

  test("merge is commutative and the state schema is closed under merge") {
    val a = orderDelta(wl, orders.filter(col("o_custkey") === 1L))
    val b = orderDelta(wl, orders.filter(col("o_custkey") =!= 1L))
    assert(snap(merge(seed(wl), a, b)) === snap(merge(seed(wl), b, a)))
    // closed schema: a merged state re-merges without TYPE drift
    // (nullability legitimately widens — sum() is nullable)
    val m = merge(seed(wl), a)
    assert(m.schema.map(f => (f.name, f.dataType)) ===
           seed(wl).schema.map(f => (f.name, f.dataType)),
      s"state schema drifted after merge: ${m.schema.treeString}")
  }

  test("streaming maintenance: the StateStore-held dossier equals the batch rebuild after every batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import stream.{DossierMaintain, DossierUpdate, OrderEvt}
    val day = 86400000L
    val source = MemoryStream[OrderEvt](spark)
    val out = DossierMaintain.maintainStream(source.toDS(), watch = Set(1L, 2L))
    val q = out.toDF().writeStream.format("memory").queryName("t17stream")
      .outputMode(OutputMode.Update()).start()
    val batch1 = Seq(OrderEvt(100, 1, 1050, 100 * day), OrderEvt(101, 1, 2025, 200 * day),
                     OrderEvt(103, 2, 9999, 150 * day), OrderEvt(104, 9, 7700, 10 * day))
    val batch2 = Seq(OrderEvt(102, 1, 500, 300 * day), OrderEvt(105, 2, 1, 120 * day))
    source.addData(batch1: _*)
    q.processAllAvailable()
    source.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    // latest update per wid = the maintained dossier
    val updates = spark.table("t17stream").as[DossierUpdate].collect()
    val latest = updates.groupBy(_.wid).view
      .mapValues(us => us.maxBy(_.n_orders)).values
      .map(u => (u.wid, u.n_orders, u.total_spent, u.last_order)).toSet
    // unwatched entity 9 never appears
    assert(!updates.exists(_.wid == 9L))
    // batch rebuild over the SAME orders (exact decimal path)
    val ordersDfAll = ordersDf((batch1 ++ batch2).map(o =>
      (o.o_orderkey, o.o_custkey, (BigDecimal(o.cents) / 100).toString(),
       java.time.LocalDate.ofEpochDay(o.dateMs / day).toString + " 00:00:00")))
    val rebuilt2 = merge(seed(Seq(1L, 2L).toDF("wid")), orderDelta(Seq(1L, 2L).toDF("wid"), ordersDfAll))
    assert(latest === snap(rebuilt2),
      s"stream-maintained dossier diverged from the batch rebuild: $latest vs ${snap(rebuilt2)}")
  }

  test("retract: a cancellation that displaces the max recomputes last_order from the surviving history") {
    // cancel entity 1's LATEST order (102 @ 1999-01-02): count/spend
    // subtract exactly, and the max leg must fall back to 1997-07-15 —
    // the displaced-max recompute, not a stale stored date
    val cancels = orders.filter(col("o_orderkey") === 102L)
    val surviving = orders.filter(col("o_orderkey") =!= 102L)
    val got = retract(wl, rebuilt, cancels, surviving)
    assert(snap(got) === Set(
      (1L, 2L, 30.75, "1997-07-15"),
      (2L, 1L, 99.99, "1996-06-30"),
      (3L, 0L, 0.0, "never")))
    // and it equals the rebuild over surviving orders (the t17b oracle form)
    assert(snap(got) === snap(merge(seed(wl), orderDelta(wl, surviving))))
  }

  test("retract: cancelling a non-max order leaves last_order untouched (no recompute path)") {
    val cancels = orders.filter(col("o_orderkey") === 100L) // 1's EARLIEST
    val surviving = orders.filter(col("o_orderkey") =!= 100L)
    val got = retract(wl, rebuilt, cancels, surviving)
    assert(snap(got) === Set(
      (1L, 2L, 25.25, "1999-01-02"),
      (2L, 1L, 99.99, "1996-06-30"),
      (3L, 0L, 0.0, "never")))
    assert(snap(got) === snap(merge(seed(wl), orderDelta(wl, surviving))))
  }

  test("retract: cancelling an entity's full history returns it to the seed state ('never')") {
    val cancels = orders.filter(col("o_custkey") === 2L)
    val surviving = orders.filter(col("o_custkey") =!= 2L)
    val got = retract(wl, rebuilt, cancels, surviving)
    assert(snap(got) === Set(
      (1L, 3L, 35.75, "1999-01-02"),
      (2L, 0L, 0.0, "never"),
      (3L, 0L, 0.0, "never")))
  }

  test("retract: the empty cancellation batch is the identity") {
    val none = orders.filter(lit(false))
    assert(snap(retract(wl, rebuilt, none, orders)) === snap(rebuilt))
  }

  test("retract: ties on the max date — cancelling ONE of two same-date orders keeps the date") {
    val withTie = ordersDf(Seq(
      (200L, 1L, "1.00", "1999-01-02 00:00:00"))).unionByName(orders)
    val st = merge(seed(wl), orderDelta(wl, withTie))
    val cancels = withTie.filter(col("o_orderkey") === 102L) // one of the two 1999-01-02 rows
    val surviving = withTie.filter(col("o_orderkey") =!= 102L)
    val got = retract(wl, st, cancels, surviving)
    // the recompute is ground truth: the surviving same-date order holds the max
    assert(snap(got) === snap(merge(seed(wl), orderDelta(wl, surviving))))
    assert(snap(got).exists { case (w, _, _, d) => w == 1L && d == "1999-01-02" })
  }

  test("graded composition: t17b's retract∘fold equals fold-on-surviving on real data") {
    val t = Tables(spark, sfDir)
    val w = t.customer.filter(col("c_custkey") % 101 === 0)
      .select(col("c_custkey").as("wid"))
    val cancels = t.orders.filter(col("o_orderkey") % 13 === 0)
    val surviving = t.orders.filter(col("o_orderkey") % 13 =!= 0)
    val full = merge(seed(w), orderDelta(w, t.orders))
    val got = retract(w, full, cancels, surviving)
    val want = merge(seed(w), orderDelta(w, surviving))
    assert(snap(got) === snap(want))
    // (the %13 slice displaces maxima at the GRADED sf0.01 — 3 of 15
    // watched entities, checked out-of-band — but not necessarily at this
    // spec's sf0.001; the guaranteed-displacement path is the next test)
  }

  test("real data: cancelling every watched entity's LATEST order displaces every ordered max") {
    val t = Tables(spark, sfDir)
    val w = t.customer.filter(col("c_custkey") % 101 === 0)
      .select(col("c_custkey").as("wid"))
    val watchedOrders = t.orders.join(broadcast(w),
      col("o_custkey") === col("wid")).drop("wid")
    val winLatest = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey"))
    val ranked = watchedOrders.withColumn("rn", row_number().over(winLatest))
    val cancels = ranked.filter(col("rn") === 1).drop("rn")
    val surviving = t.orders.join(
      cancels.select(col("o_orderkey").as("ck")),
      col("o_orderkey") === col("ck"), "left_anti")
    val full = merge(seed(w), orderDelta(w, t.orders))
    val got = retract(w, full, cancels, surviving)
    val want = merge(seed(w), orderDelta(w, surviving))
    assert(snap(got) === snap(want))
    // every ordered entity's stored max WAS displaced (date changed or
    // fell back to 'never') — the recompute path ran for all of them
    val before = snap(full).map(r => r._1 -> r._4).toMap
    val after = snap(got).map(r => r._1 -> r._4).toMap
    val ordered = before.filter(_._2 != "never").keySet
    assert(ordered.nonEmpty)
    ordered.foreach { wid =>
      assert(after(wid) !== before(wid),
        s"entity $wid: latest-order cancellation must displace its max")
    }
  }

  test("graded composition: the t17 split reproduces the unsplit aggregate on real data") {
    val t = Tables(spark, sfDir)
    val w = t.customer.filter(col("c_custkey") % 101 === 0)
      .select(col("c_custkey").as("wid"))
    val split = lit("1997-12-31 23:59:59").cast("timestamp_ntz")
    val inc = merge(
      merge(seed(w), orderDelta(w, t.orders.filter(col("o_orderdate") <= split))),
      orderDelta(w, t.orders.filter(col("o_orderdate") > split)))
    val full = merge(seed(w), orderDelta(w, t.orders))
    assert(snap(inc) === snap(full))
    assert(snap(inc).nonEmpty)
  }

  test("retractLogged: replaying the same cancel batch is a no-op (ADVICE r14 idempotence)") {
    val cancels = orders.filter(col("o_orderkey") === 102L)
    val surviving = orders.filter(col("o_orderkey") =!= 102L)
    val emptyLog = Seq.empty[Long].toDF("o_orderkey")
    val (s1, log1) = retractLogged(wl, rebuilt, cancels, surviving, emptyLog)
    // first apply = the plain retract
    assert(snap(s1) === snap(retract(wl, rebuilt, cancels, surviving)))
    assert(log1.as[Long].collect().toSet === Set(102L))
    // REPLAY the same batch against the already-retracted state: without
    // the log this double-subtracts (1 order, 5.00 off a second time);
    // with it, state is unchanged and the log is stable
    val (s2, log2) = retractLogged(wl, s1, cancels, surviving, log1)
    assert(snap(s2) === snap(s1), "replayed cancel batch must be a no-op")
    assert(log2.as[Long].collect().toSet === Set(102L))
    // and a genuinely new cancel in a mixed (replay + fresh) batch applies
    // exactly once
    val mixed = orders.filter(col("o_orderkey").isin(102L, 100L))
    val surviving2 = orders.filter(!col("o_orderkey").isin(102L, 100L))
    val (s3, log3) = retractLogged(wl, s2, mixed, surviving2, log2)
    assert(snap(s3) === snap(merge(seed(wl), orderDelta(wl, surviving2))))
    assert(log3.as[Long].collect().toSet === Set(100L, 102L))
  }

  test("streaming retraction: signed-fold state equals batch fold-then-retract across microbatches (incl. displaced max and cancel-before-arrival)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import stream.{DossierMaintain, DossierUpdate, SignedOrderEvt}
    val day = 86400000L
    val source = MemoryStream[SignedOrderEvt](spark)
    val out = DossierMaintain.maintainStreamSigned(source.toDS(), watch = Set(1L, 2L))
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Seq[DossierUpdate])]()
    val q = out.writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[DossierUpdate], id: Long) =>
        buf.synchronized { buf += ((id, ds.collect().toSeq)) }; ()
      }.start()
    def run(evs: SignedOrderEvt*): Unit = { source.addData(evs: _*); q.processAllAvailable() }
    // b1: arrivals — wid1 orders 100 (day 100) + 101 (day 200, its max); wid2 order 103
    run(SignedOrderEvt(100, 1, 1050, 100 * day, cancel = false),
        SignedOrderEvt(101, 1, 2025, 200 * day, cancel = false),
        SignedOrderEvt(103, 2, 9999, 150 * day, cancel = false),
        SignedOrderEvt(104, 9, 7700, 10 * day, cancel = false)) // unwatched
    // b2: DISPLACED MAX — cancel wid1's latest (101); the histogram must
    // fall back to day 100 with no recompute scan
    run(SignedOrderEvt(101, 1, 2025, 200 * day, cancel = true),
        SignedOrderEvt(106, 2, 1, 120 * day, cancel = false))
    val afterB2 = buf.synchronized(buf.toSeq).last._2.map(u =>
      (u.wid, u.n_orders, u.total_spent, u.last_order)).toSet
    assert(afterB2.contains((1L, 1L, 10.50,
      java.time.LocalDate.ofEpochDay(100).toString)),
      s"displaced max must fall back in-state: $afterB2")
    // b3: CANCEL-BEFORE-ARRIVAL — order 107's cancel lands a batch early
    run(SignedOrderEvt(107, 1, 500, 300 * day, cancel = true))
    // b4: the arrival heals the parked −1 back to zero
    run(SignedOrderEvt(107, 1, 500, 300 * day, cancel = false))
    q.stop()
    // final streamed state per wid = last emitted update
    val finalState = buf.synchronized(buf.toSeq).flatMap(_._2)
      .groupBy(_.wid).view.mapValues(_.last)
      .values.map(u => (u.wid, u.n_orders, u.total_spent, u.last_order)).toSet
    assert(!finalState.exists(_._1 == 9L))
    // batch twin: fold everything, retract the cancels (survivors =
    // arrivals minus cancelled orderkeys)
    val survivors = ordersDf(Seq(
      (100L, 1L, "10.50", "1970-04-11 00:00:00"),
      (103L, 2L, "99.99", "1970-05-31 00:00:00"),
      (106L, 2L, "0.01", "1970-05-01 00:00:00")))
    val w2 = Seq(1L, 2L).toDF("wid")
    val expect = snap(merge(seed(w2), orderDelta(w2, survivors)))
      // wid 1 & 2 both ordered, so the seed's 'never' rows are overwritten
    assert(finalState === expect,
      s"streaming signed fold diverged from batch fold-then-retract: $finalState vs $expect")
  }

  test("streaming retraction: order of arrival vs cancel within the event multiset does not change the converged state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import stream.{DossierMaintain, DossierUpdate, SignedOrderEvt}
    val day = 86400000L
    val evsA = Seq( // arrival then cancel, same batch
      SignedOrderEvt(200, 1, 1000, 50 * day, cancel = false),
      SignedOrderEvt(201, 1, 2000, 60 * day, cancel = false),
      SignedOrderEvt(201, 1, 2000, 60 * day, cancel = true))
    val evsB = Seq( // cancel first (parked −1), arrival later batch
      SignedOrderEvt(201, 1, 2000, 60 * day, cancel = true),
      SignedOrderEvt(200, 1, 1000, 50 * day, cancel = false),
      SignedOrderEvt(201, 1, 2000, 60 * day, cancel = false))
    def converge(batches: Seq[Seq[SignedOrderEvt]]): (Long, Long, Double, String) = {
      val source = MemoryStream[SignedOrderEvt](spark)
      val out = DossierMaintain.maintainStreamSigned(source.toDS(), watch = Set(1L))
      val buf = scala.collection.mutable.ArrayBuffer[DossierUpdate]()
      val q = out.writeStream.outputMode(OutputMode.Update())
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[DossierUpdate], _: Long) =>
          buf.synchronized { buf ++= ds.collect() }; ()
        }.start()
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val u = buf.synchronized(buf.toSeq).last
      (u.wid, u.n_orders, u.total_spent, u.last_order)
    }
    val a = converge(Seq(evsA))
    val b = converge(Seq(evsB.take(1), evsB.drop(1)))
    assert(a === b, s"interleavings diverged: $a vs $b")
    assert(a === ((1L, 1L, 10.0, java.time.LocalDate.ofEpochDay(50).toString)))
  }
}
