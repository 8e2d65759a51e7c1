package graft.tools

import graft.Tables
import graft.graph.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-stage profile of l02_minhash_lsh (build tool): shingle index,
  * minhash sketch, band-bucket join, candidate distinct, exact rerank —
  * which stage owns the wall at rehearsal scale?
  */
object L02Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf0.8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val t = Tables(spark, sfDir)

    def stage(name: String)(df: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = Materialize(df)
      val n = out.count()
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.1f s  $n%,12d rows")
      out
    }

    // same 12 prime multipliers as LlmQueries.minhashMults (private there)
    val mults = Seq(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L, 67L, 71L, 73L, 79L)
    val nHashes = mults.size
    val total0 = System.nanoTime()
    val ws = t.documents
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val tg = stage("shingle index")(ws.select(col("doc_id"),
      explode(expr("transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("g"))
      .distinct())
    val mins = mults.zipWithIndex.map { case (m, h) =>
      min(expr(s"poly_hash(g, 0L, ${m}L)")).as(s"mh$h") }
    val sketch = stage("minhash sketch")(tg.groupBy("doc_id").agg(mins.head, mins.tail: _*))
    val stackExpr = (0 until nHashes).map(h => s"$h, mh$h").mkString(", ")
    val buckets = stage("band buckets")(sketch.select(col("doc_id"),
      expr(s"stack($nHashes, $stackExpr)").as(Seq("h", "mh"))))
    val cand = stage("bucket join + distinct")(
      buckets.select(col("doc_id").as("a"), col("h"), col("mh"))
        .join(buckets.select(col("doc_id").as("b"), col("h"), col("mh")), Seq("h", "mh"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct())
    // r=2 banding comparison (l02b): candidate volume at 6 bands × 2 rows
    val stack2 = (0 until nHashes / 2).map(b =>
      s"$b, mh${2 * b}, mh${2 * b + 1}").mkString(", ")
    val buckets2 = sketch.select(col("doc_id"),
      expr(s"stack(${nHashes / 2}, $stack2)").as(Seq("h", "m1", "m2")))
    stage("r=2 cand join+distinct")(
      buckets2.select(col("doc_id").as("a"), col("h"), col("m1"), col("m2"))
        .join(buckets2.select(col("doc_id").as("b"), col("h"), col("m1"), col("m2")),
          Seq("h", "m1", "m2"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct())
    val sz = stage("sizes")(tg.groupBy("doc_id").agg(count(lit(1)).as("n")))
    val inter = stage("rerank intersection")(cand
      .join(tg.select(col("doc_id").as("a"), col("g")), Seq("a"))
      .join(tg.select(col("doc_id").as("b"), col("g")), Seq("b", "g"))
      .groupBy("a", "b").agg(count(lit(1)).as("i")))
    // v2: inverted order — full trigram self-join (selective: only SHARED
    // trigrams survive) THEN candidate filter, then agg
    stage("v2 invert join order")(
      tg.select(col("doc_id").as("a"), col("g"))
        .join(tg.select(col("doc_id").as("b"), col("g")), Seq("g"))
        .filter(col("a") < col("b"))
        .join(cand, Seq("a", "b"), "left_semi")
        .groupBy("a", "b").agg(count(lit(1)).as("i")))
    // v3: no row explosion at all — attach each side's trigram ARRAY and
    // intersect per candidate row (no aggregation shuffle)
    val docArr = Materialize(tg.groupBy("doc_id").agg(collect_list(col("g")).as("gs")))
    stage("v3 array_intersect")(
      cand.join(docArr.select(col("doc_id").as("a"), col("gs").as("ga")), Seq("a"))
        .join(docArr.select(col("doc_id").as("b"), col("gs").as("gb")), Seq("b"))
        .select(col("a"), col("b"), size(array_intersect(col("ga"), col("gb"))).as("i")))
    val out = stage("jaccard + filter")(inter
      .join(sz.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(sz.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .withColumn("jaccard_dist",
        round(lit(1.0) - col("i").cast("double") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard_dist") <= 0.8)
      .select(col("a"), col("b"), col("jaccard_dist")))
    println(f"TOTAL (staged)          ${(System.nanoTime() - total0) / 1e9}%7.1f s")
    spark.stop()
  }
}
