package graft.tools

import graft.Tables
import graft.graph.{Algorithms, GraphBuilder, Materialize}
import graft.text.IvfIndex
import org.apache.spark.sql.functions._

/** Round-14 scale rehearsal probe (SCALE.md evidence, not a driver
  * surface): the decremental-CC blast-radius economics and the sampled
  * IVF refit cost, both at rehearsal sf.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/scale/sf6.4 SPARK_DRIVER_MEM=32g \
  *     SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
  *     sbt "runMain graft.tools.R14Probe dec|decgiant|ivf"
  *
  * `dec` — maintenance tick on the FULL property graph with removals
  *   drawn from SMALL components (the favorable regime the operator is
  *   designed for: blast radius ∝ touched components): one
  *   ccDecrement(expired)+ccIncrement(arrived) refresh vs the full cc
  *   rebuild of the post-tick graph, against a MATERIALIZED base.
  * `decgiant` — the documented boundary: the same tick with removals
  *   drawn from the GIANT component, whose induced subgraph is most of
  *   the graph — the decrement honestly degrades toward the rebuild
  *   (component-granularity maintenance cannot beat a rebuild when the
  *   blast radius IS the graph; SCALE.md records this as the contract's
  *   stated limit, not a surprise).
  * `ivf` — refreshSampled(rate=0.1) vs refresh on identical drifted
  *   copies of a persisted index over the rehearsal embeddings: the
  *   refit pass is the 100 TB bottleneck refresh documents; the sampled
  *   fit cuts the Lloyd input 10x while the assignment pass (irreducible
  *   - every vector must land in a bucket) and the moved-bucket write
  *   stay.
  */
object R14Probe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** The graded g68 semantics at rehearsal scale: the 7-day-windowed
    * strong user graph between two horizons — expiry and birth both
    * organic, components plentiful (the 64 ScaleUp copies are id-disjoint,
    * so the favorable many-component regime exists by construction). */
  private def decWindow(spark: org.apache.spark.sql.SparkSession, t: Tables): Unit = {
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
    val (base, wBase) = time(Algorithms.cc(e1).transform(Materialize.apply))
    val touched = removed.select(col("src").as("id"))
      .unionByName(removed.select(col("dst").as("id"))).distinct()
      .join(base, Seq("id")).select("component").distinct()
    val touchedNodes = base.join(touched, Seq("component"))
    println(f"[r14-decwin] e1=${e1.count()}%d edges, removed=${removed.count()}%d, " +
      f"added=${added.count()}%d; base build $wBase%.1f s over ${base.count()}%d labels")
    println(f"[r14-decwin] blast radius: ${touched.count()}%d touched components, " +
      f"${touchedNodes.count()}%d of ${base.count()}%d labels inside")
    val (_, wTick) = time {
      val afterDec = Algorithms.ccDecrement(base, surviving, removed,
        baseMaterialized = true)
      Algorithms.ccIncrement(afterDec, added)
        .write.mode("overwrite").format("noop").save()
    }
    println(f"[r14-decwin] decrement+increment refresh: $wTick%.1f s")
    val (_, wRebuild) = time(
      Algorithms.cc(e2).write.mode("overwrite").format("noop").save())
    println(f"[r14-decwin] full cc rebuild:             $wRebuild%.1f s")
  }

  /** One maintenance tick: removals from components ≤ maxCompSize (or > for
    * the giant-regime probe), additions = one month of arrivals. */
  private def decTick(spark: org.apache.spark.sql.SparkSession, t: Tables,
                      giant: Boolean): Unit = {
    val tag = if (giant) "r14-decgiant" else "r14-dec"
    val g = GraphBuilder(t)
    val edges = g.edges.select(col("src"), col("dst"), col("valid_from"))
      .transform(Materialize.apply)
    val t1 = "1996-12-01 00:00:00"; val t2 = "1997-01-01 00:00:00"
    val e1 = edges
      .filter(col("valid_from").isNull ||
              col("valid_from") <= lit(t1).cast("timestamp_ntz"))
      .select(col("src"), col("dst")).transform(Materialize.apply)
    val additions = edges
      .filter(col("valid_from") > lit(t1).cast("timestamp_ntz") &&
              col("valid_from") <= lit(t2).cast("timestamp_ntz"))
      .select(col("src"), col("dst")).transform(Materialize.apply)
    val (base, wBase) = time(Algorithms.cc(e1).transform(Materialize.apply))
    // component sizes stratify the removal slice: small-component removals
    // are the designed regime (bounded blast radius); giant-component
    // removals are the documented boundary
    val sizes = base.groupBy("component").agg(count(lit(1)).as("csize"))
    val labeled = e1.join(base.withColumnRenamed("id", "src")
        .withColumnRenamed("component", "comp"), Seq("src"))
      .join(sizes.withColumnRenamed("component", "comp"), Seq("comp"))
    val inSlice =
      if (giant) col("csize") > 1000L else col("csize").between(2L, 1000L)
    // ~1% deterministic sample of the stratum's edges
    val removed = labeled.filter(inSlice)
      .filter(pmod(col("src") * 31L + col("dst"), lit(97L)) === 0L)
      .select(col("src"), col("dst")).transform(Materialize.apply)
    val surviving = e1.join(removed, Seq("src", "dst"), "left_anti")
      .transform(Materialize.apply)
    println(f"[$tag] e1=${e1.count()}%d edges, removed=${removed.count()}%d, " +
      f"additions(1 month)=${additions.count()}%d, base build $wBase%.1f s " +
      f"over ${base.count()}%d labels")
    val touched = removed.select(col("src").as("id"))
      .unionByName(removed.select(col("dst").as("id"))).distinct()
      .join(base, Seq("id")).select("component").distinct()
    val touchedNodes = base.join(touched, Seq("component"))
    println(f"[$tag] blast radius: ${touched.count()}%d touched components, " +
      f"${touchedNodes.count()}%d of ${base.count()}%d labels inside")
    val (_, wTick) = time {
      val afterDec = Algorithms.ccDecrement(base, surviving, removed,
        baseMaterialized = true)
      Algorithms.ccIncrement(afterDec, additions)
        .write.mode("overwrite").format("noop").save()
    }
    println(f"[$tag] decrement+increment refresh: $wTick%.1f s")
    val (_, wRebuild) = time(
      Algorithms.cc(surviving.unionByName(additions))
        .write.mode("overwrite").format("noop").save())
    println(f"[$tag] full cc rebuild:             $wRebuild%.1f s")
  }

  /** The deletion-side ER split (g69's deployment economics, the r13b
    * `er` probe's mirror): against a MATERIALIZED standing merge map +
    * pair store (the nightly artifacts), one erasure batch folded in by
    * ccDecrement vs the full re-resolution (re-block + re-close every
    * surviving record from scratch — what a pipeline without the
    * decrement has to run). */
  private def erDecSplit(spark: org.apache.spark.sql.SparkSession, t: Tables): Unit = {
    import graft.rel.FuzzyJoin
    val cust = t.customer.select(col("c_custkey").as("id"),
      col("c_name").as("name"), col("c_nationkey").as("nk"))
    def sameNation(p: org.apache.spark.sql.DataFrame, ca: String, cb: String) = p
      .join(broadcast(cust.select(col("id").as(ca), col("nk").as("nk_a"))), Seq(ca))
      .join(broadcast(cust.select(col("id").as(cb), col("nk").as("nk_b"))), Seq(cb))
      .filter(col("nk_a") === col("nk_b"))
    val (basePairs, wPairs) = time(
      sameNation(FuzzyJoin.selfJoinLev1(cust.select("id", "name")), "id_a", "id_b")
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .transform(Materialize.apply))
    val (base, wBase) = time(Algorithms.cc(basePairs).transform(Materialize.apply))
    println(f"[r14-erdec] standing artifacts: ${basePairs.count()}%d pairs " +
      f"($wPairs%.1f s), ${base.count()}%d labels ($wBase%.1f s) — the nightly build")
    val deleted = cust.filter(col("id") % 17 === 0).select(col("id"))
    val flagged = basePairs
      .join(broadcast(deleted.select(col("id").as("src"), lit(1).as("da"))), Seq("src"), "left")
      .join(broadcast(deleted.select(col("id").as("dst"), lit(1).as("db"))), Seq("dst"), "left")
    val removed = flagged.filter(col("da").isNotNull || col("db").isNotNull)
      .select(col("src"), col("dst")).transform(Materialize.apply)
    val surviving = flagged.filter(col("da").isNull && col("db").isNull)
      .select(col("src"), col("dst")).transform(Materialize.apply)
    println(f"[r14-erdec] erasure batch: ${removed.count()}%d of ${basePairs.count()}%d pairs removed")
    val (_, wDec) = time(
      Algorithms.ccDecrement(base, surviving, removed, baseMaterialized = true)
        .write.mode("overwrite").format("noop").save())
    println(f"[r14-erdec] ccDecrement refresh (erasure folded into the standing map): $wDec%.1f s")
    val survivors = cust.filter(col("id") % 17 =!= 0)
    val (_, wRebuild) = time(
      Algorithms.cc(sameNation(
          FuzzyJoin.selfJoinLev1(survivors.select("id", "name")), "id_a", "id_b")
        .select(col("id_a").as("src"), col("id_b").as("dst")))
        .write.mode("overwrite").format("noop").save())
    println(f"[r14-erdec] full re-resolution of survivors (the rebuild): $wRebuild%.1f s")
  }

  private def ivfSplit(spark: org.apache.spark.sql.SparkSession, t: Tables): Unit = {
    val emb = t.embeddings
    val n = emb.count()
    val k = 64
    // base = 90% of the corpus; delta = the rest, shifted (the IvfIndexSpec
    // drift pattern at rehearsal scale)
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("embedding", transform(col("embedding"), v => v + lit(1.5f)))
    def prep(dir: String): Double = {
      val (_, w) = time {
        IvfIndex.save(IvfIndex.build(base, k), dir)
        IvfIndex.appendTo(spark, dir, delta)
      }
      w
    }
    val d1 = java.nio.file.Files.createTempDirectory("r14ivf_full").toString
    val d2 = java.nio.file.Files.createTempDirectory("r14ivf_samp").toString
    val wPrep = prep(d1); prep(d2)
    println(f"[r14-ivf] corpus=$n%d vectors, k=$k%d, build+append $wPrep%.1f s per copy")
    val (sFull, wFull) = time(IvfIndex.refresh(spark, d1, k))
    println(f"[r14-ivf] refresh (full-corpus Lloyd refit): $wFull%.1f s, " +
      f"moved ${sFull.nMoved}%d/${sFull.nTotal}%d, rewrote ${sFull.rewrittenClusters.size}%d buckets")
    val (sSamp, wSamp) = time(IvfIndex.refreshSampled(spark, d2, k, rate = 0.1))
    println(f"[r14-ivf] refreshSampled rate=0.1 (Lloyd on 10%%): $wSamp%.1f s, " +
      f"moved ${sSamp.nMoved}%d/${sSamp.nTotal}%d, rewrote ${sSamp.rewrittenClusters.size}%d buckets")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/sf6.4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)
    args.headOption.getOrElse("decwin") match {
      case "decwin" => decWindow(spark, t)
      case "dec" => decTick(spark, t, giant = false)
      case "decgiant" => decTick(spark, t, giant = true)
      case "ivf" => ivfSplit(spark, t)
      case "erdec" => erDecSplit(spark, t)
      case other => System.err.println(s"unknown mode $other"); sys.exit(2)
    }
    spark.stop()
  }
}
