package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-UDAF surface (the `Aggregator` API): custom aggregates with a
  * map-side-combinable buffer — `reduce` runs per partition, `merge`
  * combines partial buffers, so a custom aggregate shuffles ONE buffer
  * row per group per partition exactly like a built-in (never raw rows).
  *
  * Exact-arithmetic design: inputs are pre-quantized to integer cents by
  * the caller, the buffer holds long sums (overflow headroom ~9e18), and
  * only `finish` divides — so the result is bit-reproducible from SQL
  * (one double division of two exact longs) and independent of row or
  * partition order, unlike a naive double-summing aggregate.
  */
object Aggregators {

  /** Accumulator of `WeightedMean`: weighted sum + total weight. */
  case class WeightedBuf(num: Long, den: Long)

  /** Quantity-weighted mean price: input rows are (price_cents, weight);
    * result = sum(cents * w) / sum(w) / 100 as a double (dollars).
    */
  object WeightedMean extends Aggregator[(Long, Long), WeightedBuf, Double] {
    override def zero: WeightedBuf = WeightedBuf(0L, 0L)
    override def reduce(b: WeightedBuf, a: (Long, Long)): WeightedBuf =
      WeightedBuf(b.num + a._1 * a._2, b.den + a._2)
    override def merge(x: WeightedBuf, y: WeightedBuf): WeightedBuf =
      WeightedBuf(x.num + y.num, x.den + y.den)
    override def finish(b: WeightedBuf): Double =
      if (b.den == 0L) 0.0 else b.num.toDouble / b.den / 100.0
    override def bufferEncoder: Encoder[WeightedBuf] = Encoders.product[WeightedBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
