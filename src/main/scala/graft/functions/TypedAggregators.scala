package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface — the Dataset-API custom-UDAF extension point
  * (complements the Catalyst `TypedImperativeAggregate` used by
  * [[graft.functions.expressions.MinHashSignature]]). Registered via
  * `functions.udaf(...)`, these run with full partial aggregation: reduce
  * on the map side, merge after the shuffle — the same two-phase shape as
  * built-in aggregates, so they scale identically.
  *
  * The shipped example is sum-of-squares (the second raw moment, from which
  * variance/RMS derive). Chosen deliberately for the oracle gate: integer-
  * valued inputs keep every partial sum exact in double (no
  * summation-order nondeterminism), so the result hash-matches SQL
  * `SUM(x*x)` bit-for-bit.
  */
object TypedAggregators {

  /** Sum of squares with exact double arithmetic on integer-valued input. */
  object SumOfSquares extends Aggregator[Double, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(acc: Double, x: Double): Double = acc + x * x
    override def merge(a: Double, b: Double): Double = a + b
    override def finish(acc: Double): Double = acc
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
