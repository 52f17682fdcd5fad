package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Custom typed UDAF: weight-weighted mean with exact decimal accumulation
  * (SURVEY.md §2.2 `q_udaf_weighted`).
  *
  * Implemented as a public-API [[Aggregator]] (not the internal
  * `TypedImperativeAggregate` — SURVEY.md §4.3): merge-able buffer
  * (num, den) → partial aggregation map-side, so the shuffle carries one
  * buffer per group per partition — the shape that scales.
  *
  * Doubles are converted via `BigDecimal.valueOf` (shortest decimal
  * representation) then scaled — identical to Spark's own double→decimal
  * cast path, so results line up with `CAST(x AS DECIMAL(18,2))` SQL.
  */
object WeightedMean
    extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), JBigDecimal] {

  private def dec2(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  /** in = (weight, value). */
  override def reduce(b: (JBigDecimal, JBigDecimal), in: (Double, Double)):
      (JBigDecimal, JBigDecimal) = {
    val w = dec2(in._1)
    val x = dec2(in._2)
    (b._1.add(w.multiply(x)), b._2.add(w))
  }

  override def merge(a: (JBigDecimal, JBigDecimal), b: (JBigDecimal, JBigDecimal)):
      (JBigDecimal, JBigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(r: (JBigDecimal, JBigDecimal)): JBigDecimal =
    if (r._2.signum() == 0) null
    else r._1.divide(r._2, 6, RoundingMode.HALF_UP)

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
}
