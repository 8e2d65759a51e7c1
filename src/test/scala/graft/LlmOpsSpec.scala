package graft

import graft.text.LlmQueries
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH recalls every exact near-dup pair (planted dups)") {
    val lsh = LlmQueries.queries("l02_minhash_lsh")(spark, sfDir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val exact = LlmQueries.queries("l03_ngram_jaccard")(spark, sfDir)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(exact.subsetOf(lsh), s"LSH missed ${exact -- lsh}")
  }

  test("r=2 banding: results subset of r=1, high-jaccard pairs all survive") {
    // both minhashes of a band equal ⇒ each equal alone, so the r=2
    // candidate set (hence result set) is contained in r=1's; and at
    // J ≥ 0.5 the analytic miss rate (1-J²)^6 ≤ 1.8% — on this fixture's
    // deterministic hashes every such pair must in fact survive.
    val r1 = LlmQueries.queries("l02_minhash_lsh")(spark, sfDir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val r2 = LlmQueries.queries("l02b_minhash_lsh_r2")(spark, sfDir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(r2.nonEmpty && r2.subsetOf(r1), s"r=2 not a subset: ${r2 -- r1}")
    val high = LlmQueries.queries("l02_minhash_lsh")(spark, sfDir)
      .filter(col("jaccard_dist") <= 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(high.nonEmpty && high.subsetOf(r2), s"r=2 dropped high-J pairs: ${high -- r2}")
  }

  test("simhash: identical docs collide, near-dups are hamming-close") {
    val fp = LlmQueries.queries("l04_simhash")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val pair = LlmQueries.queries("l03_ngram_jaccard")(spark, sfDir)
      .orderBy(col("jaccard").desc).select("da", "db").as[(Long, Long)].head()
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(pair._1), fp(pair._2)) <= 4,
      s"near-dup pair $pair should be hamming-close")
    // random non-dup pair should not be close on average — spot-check spread
    val vals = fp.values.toSeq
    assert(vals.distinct.size > 10, "fingerprints should spread")
  }

  test("ann ivf top-k recalls most of brute-force cosine top-k") {
    val brute = LlmQueries.queries("l05_cosine_topk")(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    val ivf = LlmQueries.queries("l05_ann_ivf")(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    assert((brute & ivf).size >= 10,
      s"IVF with 8/16 probes should recall most of top-20, got ${(brute & ivf).size}")
  }

  test("ann lsh top-k overlaps brute-force cosine top-k") {
    val brute = LlmQueries.queries("l05_cosine_topk")(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    val ann = LlmQueries.queries("l05_ann_lsh")(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    // L2-NN vs cosine-NN agree loosely on this data; require non-trivial overlap
    assert((brute & ann).size >= 5, s"overlap too small: ${(brute & ann).size}")
  }

  test("simhash near-dup banding is lossless for hamming <= 3 (pigeonhole)") {
    val got = LlmQueries.queries("l04b_simhash_neardup")(spark, sfDir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // brute-force ground truth from the same 60-bit poly_hash fingerprints
    graft.functions.GraftFunctions.register(spark)
    val tok = Tables(spark, sfDir).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h",
        expr("poly_hash(tok, 0L, 131L) * 1073741824L + poly_hash(tok, 0L, 137L)"))
    val bitSums = (0 until 60).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1)).as(s"s$b") }
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fpc = (0 until 60).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val fps = agg.select(col("doc_id"), fpc.as("fp")).as[(Long, Long)].collect()
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (a, b)).toSet
    assert(got === brute, "band join must find EXACTLY the hamming<=3 pairs")
    assert(brute.nonEmpty, "corpus should contain simhash near-dups")
  }

  test("embedding near-dup: exact tier finds exactly the planted pairs; LSH tier recalls them") {
    val exact = LlmQueries.queries("l14_embedding_neardup")(spark, sfDir)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    val nVecs = Tables(spark, sfDir).embeddings.filter(col("vec_id") < 1000).count()
    val expected = (0L until math.min(20L, nVecs)).map(i => (i, i + 1000000L)).toSet
    assert(exact === expected, "exact tier must find the planted scaled copies and nothing else")
    val lsh = LlmQueries.queries("l14_neardup_lsh")(spark, sfDir)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(lsh), s"LSH tier missed ${exact -- lsh}")
  }

  test("corpus ASCII canary: byte semantics == char semantics for every document") {
    // the l12/l33/l35/l39 oracles mirror Spark's UTF-8 BYTE folds with
    // DuckDB CHARACTER functions (ord/substr/LENGTH), sound only while
    // the corpus is pure ASCII. l12_frame_sample's row COUNT also depends
    // on it (frames = byte_len/64). This canary fails LOUDLY at every sf
    // if a regenerated fixture ever introduces a multi-byte character,
    // instead of letting five oracle parities go silently red.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val nonAscii = Tables(spark, s"/root/testdata/$sf").documents
        .filter(octet_length(col("text")) =!= length(col("text")))
        .count()
      assert(nonAscii === 0, s"$sf has $nonAscii non-ASCII documents — byte/char oracle mirrors are unsound")
    }
  }

  test("multimodal plumbing: schema, determinism, payload round-trip") {
    val q = LlmQueries.queries("l12_multimodal")
    val a = q(spark, sfDir).collect()
    val b = q(spark, sfDir).collect()
    assert(a.sameElements(b), "decode stub must be deterministic")
    val row = a.head
    assert(row.schema.fieldNames.toSeq === Seq("doc_id", "byte_len", "first_byte", "checksum"))
    // byte_len equals the text length (payload is the utf-8 text)
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(a.forall(r => docs(r.getLong(0)) === r.getLong(1)))
  }

  test("multimodal resize yields a fixed-shape contract") {
    val rows = LlmQueries.queries("l12_resize")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) === 128L), "every payload must land on the target shape")
    rows.foreach { r =>
      assert(r.getBoolean(3) === (r.getLong(1) > 128), "truncation flag must match lengths")
    }
  }

  test("exact dedup is idempotent") {
    val once = LlmQueries.queries("l01_exact_dedup")(spark, sfDir)
    assert(once.count() === once.distinct().count())
  }

  test("int8 quantization dequantizes within the absmax error bound") {
    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect().toMap
    val q = LlmQueries.queries("l17_quantize_int8")(spark, sfDir)
      .select(col("vec_id"), col("q")).as[(Long, Option[String])].collect()
    assert(q.nonEmpty)
    q.foreach { case (id, qs) =>
      val x = emb(id).map(_.toDouble)
      val amax = x.map(math.abs).max
      if (amax == 0.0) assert(qs.isEmpty, s"zero vector $id must quantize to null")
      else {
        val ints = qs.get.split(",").map(_.toInt)
        assert(ints.length === x.length)
        assert(ints.forall(v => v >= -127 && v <= 127), s"vec $id out of int8 range")
        // symmetric absmax: |x - q*scale| <= scale/2 where scale = amax/127
        val scale = amax / 127.0
        ints.zip(x).foreach { case (qv, xv) =>
          assert(math.abs(xv - qv * scale) <= scale / 2 + 1e-12,
            s"vec $id: $xv dequantizes to ${qv * scale}, beyond half-step")
        }
      }
    }
  }

  test("dedup clusters: canonical doc is the cluster minimum and members partition the pair graph") {
    val rows = LlmQueries.queries("l16_dedup_clusters")(spark, sfDir)
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    val allMembers = rows.flatMap(_._3.split(",").map(_.toLong))
    assert(allMembers.distinct.length === allMembers.length, "clusters must not overlap")
    rows.foreach { case (canonical, size, members) =>
      val ms = members.split(",").map(_.toLong)
      assert(ms.length.toLong === size)
      assert(ms.min === canonical, "canonical must be the min member")
      assert(size >= 2, "every cluster arises from at least one pair")
    }
    // members cover exactly the docs that appear in some near-dup pair
    val pairDocs = LlmQueries.queries("l03_ngram_jaccard")(spark, sfDir)
      .select("da", "db").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(allMembers.toSet === pairDocs)
  }

  test("span dedup matches a driver-side reimplementation exactly") {
    val got = LlmQueries.queries("l25_span_dedup")(spark, sfDir)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.nonEmpty, "corpus plants duplicated docs — spans must collide")
    // independent recomputation: distinct 12-token spans per doc, df-capped
    val texts = Tables(spark, sfDir).documents
      .select("doc_id", "text").as[(Long, String)].collect()
    val docSpans = texts.map { case (id, t) =>
      id -> t.split(" ", -1).sliding(12).filter(_.length == 12).map(_.mkString(" ")).toSet
    }.toMap
    val df = docSpans.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val kept = docSpans.map { case (id, ss) => id -> ss.filter(s => df(s) >= 2 && df(s) <= 50) }
    val expect = (for {
      (a, sa) <- kept.toSeq; (b, sb) <- kept.toSeq if a < b
      n = (sa & sb).size if n >= 3
    } yield (a, b) -> n.toLong).toMap
    assert(got === expect)
  }

  test("kmeans assignments match a driver-side Lloyd's reimplementation") {
    val got = LlmQueries.queries("l26_kmeans")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val vecs = Tables(spark, sfDir).embeddings
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble) }.sortBy(_._1)
    var cents: Seq[(Long, Array[Double])] = vecs.take(4).toSeq
    def assign() = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, c) =>
        (v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
      }.min._2
    }.toMap
    val a1 = assign()
    cents = a1.groupBy(_._2).toSeq.map { case (cid, m) =>
      val vs = m.keys.toSeq.map(vecs.toMap)
      cid -> Array.tabulate(64)(i => vs.map(_(i)).sum / vs.size)
    }
    assert(assign() === got)
    assert(got.values.toSet.size >= 2, "seeds should not collapse to one cluster")
  }

  test("gopher quality signals match a driver-side reimplementation") {
    val got = LlmQueries.queries("l34_gopher_quality")(spark, sfDir)
      .select("doc_id", "top_bigram_char_frac", "dup3_char_frac", "stop_hits", "gopher_pass")
      .as[(Long, Double, Double, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val stopSet = Set("the", "a", "and", "of", "to", "in")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val texts = Tables(spark, sfDir).documents
      .select("doc_id", "text").as[(Long, String)].collect()
    texts.foreach { case (id, t) =>
      val ws = t.split(" ", -1)
      val nChars = ws.map(_.length).sum
      val bigrams = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val topFrac = if (bigrams.isEmpty) 0.0 else {
        val (g, c) = bigrams.groupBy(identity).view.mapValues(_.size).toSeq
          .minBy { case (g, c) => (-c, g) }
        r6(g.replace(" ", "").length.toDouble * c / nChars)
      }
      val tris = ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val dupSet = tris.groupBy(identity).filter(_._2.size > 1).keySet
      val covered = tris.zipWithIndex.collect {
        case (g, i) if dupSet(g) => Seq(i, i + 1, i + 2)
      }.flatten.toSet
      val dupFrac = r6(covered.toSeq.map(ws(_).length).sum.toDouble / nChars)
      val stops = ws.count(stopSet)
      val (gTop, gDup, gStops, gPass) = got(id)
      assert(gTop === topFrac, s"doc $id top-bigram frac")
      assert(gDup === dupFrac, s"doc $id dup3 coverage frac")
      assert(gStops === stops.toLong, s"doc $id stop hits")
      val mwl = r6(nChars.toDouble / ws.length)
      val expectPass = ws.length >= 10 && ws.length <= 1000 &&
        mwl >= 2.0 && mwl <= 12.0 && topFrac <= 0.10 && dupFrac <= 0.05 && stops >= 2
      assert(gPass === expectPass, s"doc $id gate")
    }
    assert(got.values.exists(_._4) && got.values.exists(!_._4),
      "gate should be non-vacuous: some docs pass, some fail")
  }

  test("dsir importance weights match a driver-side reimplementation") {
    val got = LlmQueries.queries("l33_dsir_importance")(spark, sfDir)
      .select("doc_id", "dsir_logw").as[(Long, Double)].collect().toMap
    val rows = Tables(spark, sfDir).documents
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    def bucket(t: String): Long =
      (t.foldLeft(7L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)) % 64
    val toks = rows.map { case (id, src, t) => (id, src, t.split(" ", -1).map(bucket)) }
    val tgt = toks.filter(r => r._2 == "src0" || r._2 == "src1").flatMap(_._3)
    val raw = toks.flatMap(_._3)
    val ct = tgt.groupBy(identity).view.mapValues(_.size).toMap
    val cr = raw.groupBy(identity).view.mapValues(_.size).toMap
    val (tt, tr) = (tgt.length, raw.length)
    def delta(b: Long) =
      math.log((ct.getOrElse(b, 0) + 1).toDouble / (tt + 64)) -
        math.log((cr(b) + 1).toDouble / (tr + 64))
    toks.foreach { case (id, _, bs) =>
      val lw = bs.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
        .foldLeft(0.0) { case (acc, (b, c)) => acc + c.toDouble * delta(b) }
      assert(got(id) === math.floor(lw * 1e6 + 0.5) / 1e6, s"doc $id")
    }
    // target sources should be favored on average (signal, not noise)
    val bySrc = rows.map(r => (r._1, r._2)).toMap
    val (tgtW, restW) = got.partition { case (id, _) =>
      bySrc(id) == "src0" || bySrc(id) == "src1" }
    assert(tgtW.values.sum / tgtW.size > restW.values.sum / restW.size,
      "mean log-weight of target sources should exceed the rest")
  }

  test("semdedup removes exactly the planted copies, each witnessed by its original") {
    val rows = LlmQueries.queries("l32_semdedup")(spark, sfDir)
      .select("removed", "min_partner").as[(Long, Long)].collect()
    assert(rows.map(_._1).toSet === (0L until 20L).map(_ + 1000000L).toSet,
      "removed set must be the 20 planted scaled copies and nothing else")
    // witness == original also proves the copy co-clustered with its
    // original (pairs only form within a cluster)
    rows.foreach { case (removed, witness) =>
      assert(witness === removed - 1000000L,
        s"planted copy $removed should be witnessed by its own original")
    }
  }

  test("binary dedup finds exactly the planted payload copies (plus any natural text dups)") {
    val got = LlmQueries.queries("l35_binary_dedup")(spark, sfDir)
      .select("canonical", "members").as[(Long, String)].collect()
      .map { case (c, m) => c -> m.split(",").map(_.toLong).toSet }.toMap
    val texts = Tables(spark, sfDir).documents
      .select("doc_id", "text").as[(Long, String)].collect()
    val planted = texts.filter(_._1 < 100).map { case (id, t) => (id + 1000000L, t) }
    val groups = (texts ++ planted).groupBy(_._2).values
      .filter(_.size >= 2).map(g => g.map(_._1).min -> g.map(_._1).toSet).toMap
    assert(got === groups)
  }

  test("zipf fit matches a driver-side OLS over the rank-ordered vocabulary") {
    val got = LlmQueries.queries("l36_zipf_fit")(spark, sfDir)
      .select("source", "zipf_slope").as[(String, Double)].collect().toMap
    val toks = Tables(spark, sfDir).documents
      .select("source", "text").as[(String, String)].collect()
      .flatMap { case (src, t) => t.split(" ", -1).map(src -> _) }
    toks.groupBy(_._1).foreach { case (src, ts) =>
      val ranked = ts.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (tok, c) => (-c, tok) }.zipWithIndex
        .map { case ((_, c), i) => (math.log(i + 1.0), math.log(c.toDouble)) }
      val n = ranked.size.toDouble
      val (sx, sy) = (ranked.foldLeft(0.0)(_ + _._1), ranked.foldLeft(0.0)(_ + _._2))
      val sxy = ranked.foldLeft(0.0)((a, e) => a + e._1 * e._2)
      val sxx = ranked.foldLeft(0.0)((a, e) => a + e._1 * e._1)
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(got(src) - slope) < 1e-6, s"source $src: ${got(src)} vs $slope")
    }
  }

  test("unimax budget: selection respects the per-source cap and is greedily maximal") {
    val sel = LlmQueries.queries("l41_unimax_budget")(spark, sfDir)
      .select("doc_id", "source", "n_tokens", "cum_toks", "budget_toks")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(sel.nonEmpty, "budget of 20000/n_src tokens must select something")
    // (a) the cap holds: selected tokens per source never exceed the budget
    sel.groupBy(_._2).foreach { case (src, rows) =>
      val budget = rows.head._5
      val used = rows.map(_._3).sum
      assert(used <= budget, s"$src: selected $used tokens > budget $budget")
      assert(rows.map(_._4).max === used,
        s"$src: max cum_toks must equal the selected token sum")
    }
    // (b) maximality: re-derive the hash order driver-side; the first doc
    // PAST each source's cutoff must overflow the budget (nothing skippable
    // was skipped — the selection is exactly the greedy prefix)
    val all = LlmQueries.queries("l10_token_count")(spark, sfDir)
      .select("doc_id", "n_ws_tokens").as[(Long, Long)].collect().toMap
    val srcOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val selectedIds = sel.map(_._1).toSet
    sel.groupBy(_._2).foreach { case (src, rows) =>
      val budget = rows.head._5
      val used = rows.map(_._3).sum
      def rank(id: Long) = ((id % 1000000007L) * 2654435761L) % 1000000007L
      val next = srcOf.collect { case (id, s2) if s2 == src && !selectedIds(id) => id }
        .toSeq.sortBy(id => (rank(id), id)).headOption
      next.foreach { id =>
        assert(used + all(id) > budget,
          s"$src: doc $id (rank-next, ${all(id)} toks) would still fit under $budget")
      }
    }
  }

  test("temperature mix: sqrt quotas, hash-prefix selection, sublinear rebalance") {
    val sel = LlmQueries.queries("l42_temperature_mix")(spark, sfDir)
      .select("doc_id", "source", "n_src", "quota", "rk")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(sel.nonEmpty)
    val bySrc = Tables(spark, sfDir).documents
      .select("doc_id", "source").as[(Long, String)].collect()
    val counts = bySrc.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // quotas re-derived: floor(sqrt(n_s) / Σ sqrt * 200)
    val z = counts.keys.toSeq.sorted.map(s => math.sqrt(counts(s).toDouble)).sum
    sel.groupBy(_._2).foreach { case (src, rows) =>
      val quota = rows.head._4
      assert(quota === math.floor(math.sqrt(counts(src).toDouble) / z * 200.0).toLong,
        s"$src quota")
      assert(rows.length.toLong === math.min(quota, counts(src)),
        s"$src must fill its quota (or exhaust the source)")
      // selection is exactly the multiplicative-hash prefix
      def rank(id: Long) = ((id % 1000000007L) * 2654435761L) % 1000000007L
      val expect = bySrc.collect { case (id, s2) if s2 == src => id }
        .sortBy(id => (rank(id), id)).take(rows.length).toSet
      assert(rows.map(_._1).toSet === expect, s"$src prefix")
    }
    // sublinear: a bigger source never gets a LOWER per-doc selection rate
    // inverted — shares flatten toward uniform relative to raw counts
    val quotas = sel.groupBy(_._2).map { case (s, r) => s -> r.head._4 }
    val (big, small) = (counts.maxBy(_._2), counts.minBy(_._2))
    if (big._2 > small._2 * 4)
      assert(quotas(big._1).toDouble / quotas(small._1) <
             big._2.toDouble / small._2,
        "sqrt rebalance must compress the big/small quota ratio below the count ratio")
  }
}
