package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Round-13 scale rehearsal probes (SCALE.md evidence, not a driver
  * surface).
  *
  *   runMain graft.tools.R13Probe oneshot <query> [query...]
  *     — single timed pass per query at SPARK_GRAFT_SF_DIR (heavy as-of
  *       compositions at sf6.4 cost hundreds of seconds; a warmup pass
  *       would double the rehearsal for no added adjudication value —
  *       single-shot is documented in the row).
  *
  *   runMain graft.tools.R13Probe t17
  *     — the refresh-∝-delta measurement: wall of the FULL dossier
  *       rebuild (t14's nightly shape) vs wall of one t17 refresh step
  *       (delta slice aggregation + merge against a PERSISTED state
  *       table), plus the row counts that explain the ratio.
  *
  *   runMain graft.tools.R13Probe ivf
  *     — IvfIndex refresh at scale: build+save on the first 75% of the
  *       embeddings, append the rest (+0.5 drift), time refresh; report
  *       walls and IvfRefreshStats.
  */
object R13Probe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/sf6.4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    args.headOption.getOrElse("oneshot") match {
      case "oneshot" =>
        args.tail.foreach { n =>
          val (_, w) = time(SparkEntry.queries(n)(spark, sfDir)
            .write.mode("overwrite").format("noop").save())
          println(f"[r13] $n%-28s $w%.1f s single-shot @ $sfDir")
        }

      case "t17" =>
        import graft.stream.DossierMaintain._
        val t = Tables(spark, sfDir)
        val wl = t.customer.filter(col("c_custkey") % 101 === 0)
          .select(col("c_custkey").as("wid"))
        val nOrders = t.orders.count()
        // nightly full rebuild (the t14 shape): every refresh rescans history
        val (_, rebuildW) = time(
          present(merge(seed(wl), orderDelta(wl, t.orders)))
            .write.mode("overwrite").format("noop").save())
        // persisted state + one-month delta refresh (the t17 shape)
        val split = lit("1997-11-30 23:59:59").cast("timestamp_ntz")
        val hi = lit("1997-12-31 23:59:59").cast("timestamp_ntz")
        val stateDir = "/tmp/graft_t17_state"
        merge(seed(wl), orderDelta(wl, t.orders.filter(col("o_orderdate") <= split)))
          .write.mode("overwrite").parquet(stateDir)
        val deltaRows = t.orders
          .filter(col("o_orderdate") > split && col("o_orderdate") <= hi).count()
        val (_, refreshW) = time {
          val state = spark.read.parquet(stateDir)
          val delta = t.orders.filter(col("o_orderdate") > split && col("o_orderdate") <= hi)
          present(merge(state, orderDelta(wl, delta)))
            .write.mode("overwrite").format("noop").save()
        }
        println(f"[r13] t17: full rebuild $rebuildW%.1f s over $nOrders rows; " +
          f"one-month refresh $refreshW%.1f s over $deltaRows delta rows " +
          f"(${nOrders.toDouble / math.max(deltaRows, 1)}%.0fx smaller slice, " +
          f"${rebuildW / refreshW}%.1fx faster) @ $sfDir")
        // the 100 TB layout: a date-partitioned order feed turns the delta
        // filter into PARTITION PRUNING — the refresh scan touches only the
        // new month's directory instead of row-group-skipping the whole
        // table (the honest gap between the two numbers above)
        val partDir = "/tmp/graft_t17_orders_bymonth_" +
          new java.io.File(sfDir).getName
        if (!new java.io.File(partDir, "_SUCCESS").exists())
          t.orders.withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
            .write.mode("overwrite").partitionBy("o_month").parquet(partDir)
        val po = spark.read.parquet(partDir)
        val (_, refreshPartW) = time {
          val state = spark.read.parquet(stateDir)
          val delta = po.filter(col("o_month") === "1997-12")
          present(merge(state, orderDelta(wl, delta)))
            .write.mode("overwrite").format("noop").save()
        }
        println(f"[r13] t17: one-month refresh on the DATE-PARTITIONED feed " +
          f"$refreshPartW%.1f s (partition pruning; ${rebuildW / refreshPartW}%.1fx " +
          "faster than the rebuild) @ " + sfDir)

      case "ivf" =>
        import graft.text.IvfIndex
        val emb = Tables(spark, sfDir).embeddings
        val n = emb.count()
        val cut = (n * 3) / 4
        val base = emb.filter(col("vec_id") < cut)
        val delta = emb.filter(col("vec_id") >= cut)
          .withColumn("embedding", transform(col("embedding"), v => v + lit(0.5f)))
        val dir = "/tmp/graft_ivf_rehearsal"
        val (_, buildW) = time(IvfIndex.save(IvfIndex.build(base, k = 16), dir))
        val (_, appendW) = time(IvfIndex.appendTo(spark, dir, delta))
        val (stats, refreshW) = time(IvfIndex.refresh(spark, dir, k = 16))
        println(f"[r13] ivf @ $sfDir ($n vectors): build+save $buildW%.1f s, " +
          f"append ${n - cut} drifted $appendW%.1f s, refresh $refreshW%.1f s " +
          f"(moved ${stats.nMoved}/${stats.nTotal}, rewrote " +
          s"${stats.rewrittenClusters.size}/16 buckets)")

      case other => sys.error(s"unknown probe '$other'")
    }
    spark.stop()
  }
}
