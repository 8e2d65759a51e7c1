package graft

import org.apache.spark.sql.functions._
import graft.text.Pq

/** Product quantization semantics beyond the l53 oracle hash: the code
  * layout (m codes per vector, ≤k entries per subspace codebook), the
  * encode invariant (stored codes ARE the argmin against the stored
  * codebook), a driver-side ADC recomputation, and the quality claim
  * that makes PQ useful at all — ADC distances track exact distances
  * well enough that the exact nearest neighbors surface in the ADC
  * front (recall floor on the fixture).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val m = 8
  private val k = 16
  private lazy val emb = Tables(spark, sfDir).embeddings
  private lazy val corp = emb.filter(col("vec_id") =!= 0)
    .select(col("vec_id"), col("embedding"))
  private lazy val q = emb.filter(col("vec_id") === 0)
    .select(col("vec_id"), col("embedding"))
  private lazy val (cb, codes) = Pq.model(corp, m, k)

  private lazy val vecs: Map[Long, Array[Double]] = emb
    .select(col("vec_id"), expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
    .as[(Long, Seq[Double])].collect().map { case (i, v) => i -> v.toArray }.toMap

  test("code layout: m codes per vector, one per subspace; codebooks have at most k entries of subDim positions") {
    val byVec = codes.as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(byVec.nonEmpty)
    byVec.foreach { case (id, rows) =>
      assert(rows.length === m, s"vector $id has ${rows.length} codes")
      assert(rows.map(_._2).sorted.toSeq === (0L until m.toLong), s"vector $id subs")
    }
    val book = cb.as[(Long, Long, Long, Double)].collect()
    val bySub = book.groupBy(_._1)
    assert(bySub.keySet === (0L until m.toLong).toSet)
    bySub.foreach { case (sub, rows) =>
      assert(rows.map(_._2).distinct.length <= k, s"subspace $sub codebook > $k entries")
      rows.groupBy(_._2).foreach { case (cid, ps) =>
        assert(ps.map(_._3).sorted.toSeq ===
          (sub * 8 until sub * 8 + 8).map(_.toLong).toSeq,
          s"codebook ($sub, $cid) positions wrong")
      }
    }
  }

  test("stored codes are the argmin against the stored codebook (encode invariant), driver-recomputed") {
    val book = cb.as[(Long, Long, Long, Double)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.sortBy(_._3).map(_._4).toArray).toMap
    val stored = codes.as[(Long, Long, Long)].collect()
      .map { case (v, s, c) => (v, s) -> c }.toMap
    stored.keys.map(_._1).toSeq.distinct.take(50).foreach { id =>
      val v = vecs(id)
      (0 until m).foreach { s =>
        val best = book.keys.filter(_._1 == s).toSeq.map { key =>
          val c = book(key)
          var d = 0.0
          (0 until 8).foreach { j =>
            val diff = v(s * 8 + j) - c(j); d += diff * diff
          }
          (d, key._2)
        }.min
        assert(stored((id, s.toLong)) === best._2,
          s"vector $id subspace $s: stored code ${stored((id, s.toLong))} != argmin ${best._2}")
      }
    }
  }

  test("ADC equals a driver-side recomputation (table lookups in fixed subspace order)") {
    val got = Pq.adc(cb, codes, q, m).as[(Long, Double)].collect().toMap
    val book = cb.as[(Long, Long, Long, Double)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.sortBy(_._3).map(_._4).toArray).toMap
    val stored = codes.as[(Long, Long, Long)].collect()
      .map { case (v, s, c) => (v, s) -> c }.toMap
    val qv = vecs(0L)
    val table = book.map { case ((s, cid), c) =>
      var d = 0.0
      (0 until 8).foreach { j => val diff = qv((s * 8 + j).toInt) - c(j); d += diff * diff }
      (s, cid) -> d
    }
    got.foreach { case (id, pqd2) =>
      var d = 0.0
      (0 until m).foreach { s => d += table((s.toLong, stored((id, s.toLong)))) }
      assert(math.abs(pqd2 - math.rint(d * 1e6) / 1e6) < 2e-6,
        s"vector $id: ADC $pqd2 != recomputed $d")
    }
    assert(got.size === vecs.size - 1)
  }

  test("the packed serving scan computes the join-form ADC bit-for-bit (and l53 grades the packed path)") {
    val joinForm = Pq.adc(cb, codes, q, m)
      .as[(Long, Double)].collect().toMap
    val packedForm = Pq.adcPacked(cb, Pq.pack(codes, m), q, m)
      .as[(Long, Double)].collect().toMap
    assert(packedForm === joinForm,
      "packed CASE-lookup scan diverged from the join-form ADC")
    // packed layout: exactly one row per vector, m codes in sub order
    val packed = Pq.pack(codes, m).as[(Long, Seq[Long])].collect()
    assert(packed.length === packedForm.size)
    val byVec = codes.as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    packed.foreach { case (id, cs) =>
      assert(cs.length === m && cs === byVec(id), s"vector $id packed codes wrong")
    }
  }

  test("ADC front recalls the exact nearest neighbors (the compression is useful, not just fast)") {
    val qv = vecs(0L)
    def d2(a: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - qv(i); s += d * d; i += 1 }
      s
    }
    val exactTop10 = vecs.toSeq.filter(_._1 != 0L)
      .sortBy { case (i, v) => (d2(v), i) }.take(10).map(_._1).toSet
    val adcTop50 = Pq.adc(cb, codes, q, m).as[(Long, Double)].collect()
      .sortBy { case (i, d) => (d, i) }.take(50).map(_._1).toSet
    val recall = (exactTop10 intersect adcTop50).size / 10.0
    assert(recall >= 0.7,
      s"ADC top-50 recalls only ${recall * 100}%% of the exact top-10")
    info(f"ADC@50 recall of exact top-10: ${recall * 100}%.0f%%")
  }
}
