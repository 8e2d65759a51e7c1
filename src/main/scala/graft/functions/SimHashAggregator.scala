package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY §2.5 stretch item: SimHash as a typed aggregate — folds a group's
  * 64-bit token hashes into a 16-bit similarity-preserving fingerprint
  * (Charikar 2002) in ONE pass with an array buffer of bit votes, instead of
  * the 16-parallel-aggregates expression form in l04_simhash. Both forms are
  * cross-validated for equality in FunctionsSpec.
  *
  * Buffer is a plain Array[Long] (16 vote counters): commutative/associative
  * merges → partial aggregation (map-side combine) applies, which is what
  * makes per-document fingerprinting a single shuffle at corpus scale.
  */
object SimHashAggregator extends Aggregator[Long, Array[Long], Long] {
  private val Bits = 16

  override def zero: Array[Long] = new Array[Long](Bits)

  override def reduce(votes: Array[Long], h: Long): Array[Long] = {
    var b = 0
    while (b < Bits) {
      votes(b) += (if (((h >> b) & 1L) != 0L) 1L else -1L)
      b += 1
    }
    votes
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Bits) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(votes: Array[Long]): Long = {
    var fp = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.javaSerialization[Array[Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
