package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset aggregator: weighted mean over (key, value, weight)
  * tuples — the `Aggregator[IN, BUF, OUT]` API for type-safe aggregation.
  *
  * Exactness: the value is scaled to integral cents and accumulated in
  * Long (associative, overflow-safe to ~9e16 cents), so partial/final
  * merge order cannot change the result and the DuckDB oracle can
  * reproduce it bit-for-bit — a double-sum buffer would drift with
  * partition order.
  */
object WeightedMeanCents
    extends Aggregator[(String, Double, Double), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), a: (String, Double, Double)): (Long, Long) =
    (b._1 + math.round(a._2 * 100) * math.round(a._3), b._2 + math.round(a._3))

  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(b: (Long, Long)): Double =
    b._1.toDouble / 100.0 / b._2.toDouble

  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
