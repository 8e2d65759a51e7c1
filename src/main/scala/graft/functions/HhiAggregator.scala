package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.5): Herfindahl–Hirschman concentration
  * index from RAW (unnormalized) quantities: HHI = Σq² / (Σq)² ∈ (0, 1].
  * Demonstrates `Aggregator[IN, BUF, OUT]` + `functions.udaf` registration;
  * the commutative/associative buffer makes it partial-aggregation-friendly
  * (map-side combine, same as built-in sums).
  *
  * Numeric design: inputs are integral-valued doubles (exact), so Σq and Σq²
  * are exact integers in double — the aggregation is ORDER-INDEPENDENT and
  * bit-identical across engines, unlike summing pre-normalized share² floats
  * (which hash-mismatched the oracle at a rounding boundary — the reason this
  * aggregator takes quantities, not shares).
  */
object HhiAggregator extends Aggregator[Double, (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), q: Double): (Double, Double) =
    (b._1 + q * q, b._2 + q)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) 0.0 else b._1 / (b._2 * b._2)
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
