package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for supernode-heavy joins (SURVEY.md §7.3.4).
  *
  * AQE's skew-join split handles most runtime skew; salting is the explicit
  * fallback when one build-side key is so hot that even split partitions
  * bottleneck (the "one entity with 10⁴ edges" case). Mechanism:
  *  - fact side: add a random salt in [0, buckets);
  *  - dim side: replicate each row across all buckets (explode);
  *  - join on (key, salt) — the hot key's rows now spread over `buckets`
  *    reducers instead of one.
  *
  * Replication multiplies the dim side by `buckets`, so use it only when
  * |dim| × buckets ≪ |fact| — i.e., exactly the supernode regime.
  * The salt is `pmod(hash(fact row id cols), buckets)` rather than rand():
  * deterministic → retry-safe tasks and reproducible results.
  */
object Skew {

  /** Inner equi-join of `fact` and `dim` on `key`, salted across `buckets`.
    * `saltBy` must be fact-side columns forming a stable per-row identity.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int, saltBy: Seq[String]): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(hash(saltBy.map(col): _*), lit(buckets)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
