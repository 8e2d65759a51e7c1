package graft

import org.apache.spark.sql.functions._
import graft.text.IvfIndex

/** The build-once/persist/query-many IVF contract (VERDICT r5 nit 3):
  * the persisted index round-trips exactly, the query scans only the
  * probed buckets, and on the partitioned layout the probe IS partition
  * pruning (visible in the scan's PartitionFilters).
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sfDir).embeddings
  private lazy val built = IvfIndex.build(emb, k = 16)
  private lazy val qArr = emb.filter(col("vec_id") === 0)
    .head().getSeq[Float](1).map(_.toDouble).toArray

  private def topk(idx: IvfIndex): Seq[(Long, Double)] = {
    graft.functions.GraftFunctions.register(spark)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    idx.candidates(qArr, nprobe = 8)
      .crossJoin(broadcast(q))
      .withColumn("cos", expr("cosine_sim(embedding, qv)"))
      .filter(col("vec_id") =!= 0)
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .as[(Long, Double)].collect().toSeq
  }

  test("save/load round-trips the index exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    IvfIndex.save(built, dir)
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.centroids.map(_._1).toSeq === built.centroids.map(_._1).toSeq)
    loaded.centroids.zip(built.centroids).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq === b.toSeq)
    }
    val la = loaded.assigned.select("vec_id", "cluster")
      .as[(Long, Long)].collect().toMap
    val ba = built.assigned.select("vec_id", "cluster")
      .as[(Long, Long)].collect().toMap
    assert(la === ba)
    // built and loaded must agree on names, types, AND order (nullability may
    // legitimately widen across a parquet round-trip) — partition-column
    // inference would otherwise hand back cluster as INT
    assert(loaded.assigned.schema.map(f => (f.name, f.dataType)) ===
           built.assigned.schema.map(f => (f.name, f.dataType)))
  }

  test("query from the persisted index equals the graded l05_ann_ivf result") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    IvfIndex.save(built, dir)
    val loaded = IvfIndex.load(spark, dir)
    val graded = graft.text.LlmQueries.queries("l05_ann_ivf")(spark, sfDir)
      .as[(Long, Double)].collect().toSeq
    assert(topk(loaded) === graded)
    assert(topk(built) === graded)
  }

  test("probing all k buckets degenerates to exact brute-force top-k") {
    // the IVF correctness envelope: recall loss comes ONLY from unprobed
    // buckets, so nprobe = k must reproduce the oracle-checked exact query
    graft.functions.GraftFunctions.register(spark)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val exhaustive = built.candidates(qArr, nprobe = 16)
      .crossJoin(broadcast(q))
      .withColumn("cos", expr("cosine_sim(embedding, qv)"))
      .filter(col("vec_id") =!= 0)
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .as[(Long, Double)].collect().toSeq
    val brute = graft.text.LlmQueries.queries("l05_cosine_topk_native")(spark, sfDir)
      .as[(Long, Double)].collect().toSeq
    assert(exhaustive === brute)
  }

  test("every vector is assigned to its nearest round-1 centroid") {
    // the quantizer's defining invariant, checked from the outside: for
    // each vector, d2(assigned centroid) <= d2(any centroid) — ties
    // broken toward the lower centroid id, matching the (d2, cid) argmin
    val cents = built.centroids
    val rows = built.assigned.select(col("vec_id"), col("cluster"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
      .as[(Long, Long, Seq[Double])].collect()
    def d2(v: Seq[Double], c: Array[Double]): Double =
      v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    rows.foreach { case (id, cid, v) =>
      val own = d2(v, cents.find(_._1 == cid).get._2)
      cents.foreach { case (other, oc) =>
        val od = d2(v, oc)
        assert(own < od + 1e-9 || (math.abs(own - od) <= 1e-9 && cid <= other),
          s"vec $id assigned to $cid (d2=$own) but $other is nearer (d2=$od)")
      }
    }
  }

  test("append assigns the delta against existing centroids: equals assigning the union") {
    // the incremental-ingest invariant (VERDICT r8 #4): appending a delta
    // to a base index is the SAME function of (vector, centroids) as
    // assigning the union corpus in one pass — no refit happens, so the
    // split point can't leak into assignments or probe results
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val idx = IvfIndex.build(base, k = 16)
    val appended = idx.append(delta)
    val unionOnePass = IvfIndex(idx.centroids, idx.assign(emb))
    val a = appended.assigned.select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val u = unionOnePass.assigned.select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(a.keySet === u.keySet && a.size === emb.count())
    assert(a === u)
    assert(topk(appended) === topk(unionOnePass))
  }

  test("appendTo a persisted index equals the in-memory append; pruning survives the append") {
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    IvfIndex.save(IvfIndex.build(base, k = 16), dir)
    IvfIndex.appendTo(spark, dir, delta)
    val loaded = IvfIndex.load(spark, dir)
    val inMem = IvfIndex.build(base, k = 16).append(delta)
    val l = loaded.assigned.select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val m = inMem.assigned.select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(l === m)
    assert(topk(loaded) === topk(inMem))
    // appended files land INSIDE the cluster= directories, so the probe
    // still reads only the probed buckets' files
    val scan = loaded.candidates(qArr, nprobe = 8).queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cluster"))
  }

  test("candidate set is monotone in nprobe") {
    val ids = (n: Int) => built.candidates(qArr, n)
      .select("vec_id").as[Long].collect().toSet
    val c4 = ids(4); val c8 = ids(8); val c16 = ids(16)
    assert(c4.subsetOf(c8) && c8.subsetOf(c16))
    assert(c16.size === emb.count())
  }

  test("candidates touch only nprobe buckets, via partition pruning on disk") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    IvfIndex.save(built, dir)
    val loaded = IvfIndex.load(spark, dir)
    val cand = loaded.candidates(qArr, nprobe = 8)
    assert(cand.select("cluster").distinct().count() <= 8)
    // the probe reaches the file source as a partition filter, so only
    // nprobe of k bucket directories are ever read — checked on the scan
    // node's own numFiles metric (inputFiles reports pre-pruning)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, s"no file scan in:\n$plan")
      scans.map(_.metrics("numFiles").value).sum
    }
    val scan = cand.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cluster"),
      s"expected a partition-pruned scan, got:\n$scan")
    val full = filesRead(loaded.assigned)
    val pruned = filesRead(cand)
    assert(pruned < full, s"pruned scan reads $pruned of $full files")
  }
}
