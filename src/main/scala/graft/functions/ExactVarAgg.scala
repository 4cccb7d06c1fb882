package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (§2.10 beyond the reference's scalar UDFs): an
  * `Aggregator` computing exact population variance over values
  * quantized to integer `scale`-ths. The accumulator is three longs
  * (n, sum, sum-of-squares) — associative, commutative, and EXACT, so
  * the merge order Spark chooses (partial aggregation, AQE coalesced
  * partitions) can never change the result, unlike the built-in
  * var_pop's double accumulator. The one float division happens in
  * `finish`. Register with
  * `spark.udf.register("exact_var", functions.udaf(new ExactVarAgg(s)))`
  * and it is usable from SQL text and DataFrames alike.
  *
  * Quantization contract: inputs must be exact multiples of
  * 1/scale (prices with 2 decimals -> scale=100); sumSq fits 2^63
  * for |x|*scale < ~3e9 at a billion rows per group.
  */
final class ExactVarAgg(scale: Int)
    extends Aggregator[Double, (Long, Long, Long), Double] {

  override def zero: (Long, Long, Long) = (0L, 0L, 0L)

  override def reduce(b: (Long, Long, Long), x: Double): (Long, Long, Long) = {
    val q = math.round(x * scale)
    (b._1 + 1, b._2 + q, b._3 + q * q)
  }

  override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3)

  override def finish(r: (Long, Long, Long)): Double = {
    if (r._1 == 0) return Double.NaN
    val n = r._1.toDouble
    val mean = r._2 / n
    // population variance on the quantized grid, then de-scale once
    (r._3 / n - mean * mean) / (scale.toDouble * scale)
  }

  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
