package graft

import graft.graph.{Algorithms, Traversals, Ubo}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests promised by SURVEY.md §5.4: structural invariants under
  * randomized inputs. Uses raw ScalaCheck generators with fixed seeds (the
  * scalatest bridge artifact isn't on the offline classpath); 5 cases per
  * property — each case spins real Spark jobs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val edgeListGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(10, for {
      a <- Gen.choose(1L, 8L); b <- Gen.choose(1L, 8L) if a != b
    } yield (a, b)).suchThat(_.nonEmpty)

  private def cases[A](g: Gen[A], n: Int = 5): Seq[A] = {
    val cs = (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
    assert(cs.nonEmpty, "generator produced no cases — property would pass vacuously")
    cs
  }

  test("connected components are invariant under edge permutation and duplication") {
    cases(edgeListGen).foreach { es =>
      val base = es.toDF("src", "dst")
      val permutedDup = new scala.util.Random(7).shuffle(es ++ es.take(3)).toDF("src", "dst")
      val a = Algorithms.connectedComponents(base).as[(Long, Long)].collect().toMap
      val b = Algorithms.connectedComponents(permutedDup).as[(Long, Long)].collect().toMap
      assert(a === b, s"edges: $es")
    }
  }

  test("ubo propagation conserves share mass on out-normalized graphs (<= 1 per owner)") {
    cases(edgeListGen).foreach { es =>
      val raw = es.distinct.toDF("src", "dst")
      val norm = raw.withColumn("weight",
        lit(1.0) / count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      val init = norm.select(col("src").as("owner")).distinct()
        .select(col("owner"), col("owner").as("entity"), lit(1.0).as("share"))
      val out = Ubo.propagate(norm, init, 2)
        .groupBy("owner").agg(sum("share").as("s")).as[(Long, Double)].collect()
      // mass can only leak (sinks absorb), never grow
      out.foreach { case (o, s) => assert(s <= 1.0 + 1e-9, s"owner $o overflows: $s (edges $es)") }
    }
  }

  test("kHop depth is monotone in the hop budget") {
    cases(edgeListGen).foreach { es =>
      val e = es.toDF("src", "dst")
      val start = Seq(es.head._1).toDF("id")
      val d2 = Traversals.kHop(e, start, 2).as[(Long, Long)].collect().toMap
      val d3 = Traversals.kHop(e, start, 3).as[(Long, Long)].collect().toMap
      d2.foreach { case (id, depth) =>
        assert(d3(id) === depth, s"deeper budget changed depth of $id (edges $es)") }
      assert(d2.keySet.subsetOf(d3.keySet))
    }
  }

  test("sccTarjan equals GraphX SCC on random directed graphs") {
    cases(edgeListGen).foreach { es =>
      val e = es.toDF("src", "dst")
      val tj = Algorithms.sccTarjan(e).as[(Long, Long)].collect().toMap
      val gx = Algorithms.stronglyConnectedComponents(e).as[(Long, Long)].collect().toMap
      assert(tj === gx, s"edges: $es")
    }
  }

  test("connectedComponentsStar equals GraphX CC on random graphs") {
    cases(edgeListGen).foreach { es =>
      val e = es.toDF("src", "dst")
      val star = Algorithms.connectedComponentsStar(e).as[(Long, Long)].collect().toMap
      val gx = Algorithms.connectedComponents(e).as[(Long, Long)].collect().toMap
      assert(star === gx, s"edges: $es")
    }
  }

  test("as-of join: every match is the max right ts <= left ts within the key (random data)") {
    val pairGen = Gen.listOfN(30, for {
      k <- Gen.choose(1L, 5L); t <- Gen.choose(0L, 50L)
    } yield (k, t))
    cases(pairGen, 3).foreach { ps =>
      val left = ps.toDF("k", "lts")
      val right = ps.map { case (k, t) => (k, t + 1, k * 1000 + t) }
        .groupBy(p => (p._1, p._2)).map(_._2.maxBy(_._3)).toSeq.toDF("rk", "rts", "pay")
      val got = graft.plans.AsOf.join(left, right, "k", "rk", "lts", "rts")
        .select(col("k"), col("lts"), col("pay"))
        .as[(Long, Long, Option[Long])].collect()
      val rs = right.as[(Long, Long, Long)].collect()
      got.foreach { case (k, lts, pay) =>
        val want = rs.filter(r => r._1 == k && r._2 <= lts).sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        assert(pay === want, s"k=$k lts=$lts (pairs $ps)")
      }
    }
  }

  test("k-cores nest: core(k+1) is a subgraph of core(k), survivors keep degree >= k") {
    cases(edgeListGen).foreach { es =>
      val e = es.toDF("src", "dst")
      val byK = (1 to 3).map { k =>
        k -> Algorithms.kCoreBounded(e, k, 8).as[(Long, Long)].collect().toMap
      }.toMap
      byK.foreach { case (k, core) =>
        core.foreach { case (id, deg) =>
          assert(deg >= k, s"k=$k survivor $id has in-core degree $deg; edges: $es")
        }
      }
      (1 to 2).foreach { k =>
        assert(byK(k + 1).keySet.subsetOf(byK(k).keySet),
          s"core(${k + 1}) must nest inside core($k); edges: $es")
      }
    }
  }

  test("exact dedup partitions the corpus: distinct canonicals, counts sum to N") {
    cases(Gen.listOfN(12, Gen.oneOf("aa", "bb", "cc", "dd"))).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rows = docs.groupBy("text")
        .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n"))
        .as[(String, Long, Long)].collect()
      assert(rows.map(_._2).distinct.length === rows.length)
      assert(rows.map(_._3).sum === texts.length)
    }
  }

  test("islands run ids match a sequential fold for random value sequences") {
    // the single-sourced core of r38 (SCD2) and t10 (burst debounce)
    val seqGen: Gen[List[(Long, Int, String)]] =
      Gen.listOfN(16, for {
        k <- Gen.choose(1L, 3L); v <- Gen.oneOf("a", "b", "c")
      } yield (k, 0, v)).map(_.zipWithIndex.map { case ((k, _, v), i) => (k, i, v) })
    cases(seqGen).foreach { rows =>
      val df = rows.toDF("k", "pos", "v")
      val got = graft.rel.Islands.runIds(df, Seq("k"), Seq("pos"), "run")(
          w => lag(col("v"), 1).over(w) =!= col("v"))
        .select("k", "pos", "run").as[(Long, Int, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      rows.groupBy(_._1).foreach { case (k, ks) =>
        var run = 0L; var prev: Option[String] = None
        ks.sortBy(_._2).foreach { case (_, pos, v) =>
          if (!prev.contains(v)) run += 1
          prev = Some(v)
          assert(got((k, pos)) === run, s"key $k pos $pos of $rows")
        }
      }
    }
  }
}
