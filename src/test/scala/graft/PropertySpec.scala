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
}
