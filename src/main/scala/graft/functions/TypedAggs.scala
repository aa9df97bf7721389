package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (`Aggregator[IN, BUF, OUT]`) — the UDAF rung
  * of the extension ladder (SURVEY §2.3 "UDF/UDAF/UDTF surface"): the
  * reference's `MovingAverage` object (examples/csp/02_intermediate/
  * e2_stats.py:35-65) is exactly a user-defined aggregate — per-group
  * mutable state folded over events. Here that shape is a Spark
  * `Aggregator`: Catalyst runs it as a real two-phase aggregate (partial
  * `reduce` map-side, `merge` after the shuffle), so a 100 TB groupBy
  * ships one small buffer per group per partition, not the rows.
  *
  * Numeric discipline matches the oracle contract: products are rounded
  * to DECIMAL(.,2) per element exactly like Spark's `CAST(x AS
  * DECIMAL(18,2))` (java BigDecimal HALF_UP on the canonical double
  * string), then summed exactly — so the result is bit-identical to the
  * declarative decimal pipeline and to DuckDB, regardless of partial-
  * aggregation fold order.
  */
object TypedAggs {

  /** Accumulator: exact decimal Σvalue·weight and Σweight. */
  final case class WmBuf(vw: JBigDecimal, w: JBigDecimal)

  /** One (value, weight) observation. */
  final case class WmIn(value: Double, weight: Long)

  /** Result: weighted mean + total weight (the e2_stats VWAP pair). */
  final case class WmOut(vwap: Double, total_weight: Long)

  /** Exact-decimal weighted mean: mirrors
    * `CAST(sum(CAST(value*w AS DECIMAL(18,2))) AS DOUBLE) /
    *  CAST(sum(CAST(w AS DECIMAL(18,2))) AS DOUBLE)`. */
  object WeightedMean extends Aggregator[WmIn, WmBuf, WmOut] {
    private def d2(x: Double): JBigDecimal =
      // same rounding as Spark's Cast(double → decimal(18,2)):
      // BigDecimal.valueOf uses the canonical Double.toString value
      JBigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP)

    override def zero: WmBuf = WmBuf(JBigDecimal.ZERO, JBigDecimal.ZERO)
    override def reduce(b: WmBuf, a: WmIn): WmBuf =
      WmBuf(b.vw.add(d2(a.value * a.weight)), b.w.add(JBigDecimal.valueOf(a.weight)))
    override def merge(x: WmBuf, y: WmBuf): WmBuf =
      WmBuf(x.vw.add(y.vw), x.w.add(y.w))
    override def finish(b: WmBuf): WmOut =
      WmOut(b.vw.doubleValue() / b.w.doubleValue(), b.w.longValueExact())
    override def bufferEncoder: Encoder[WmBuf] = Encoders.product[WmBuf]
    override def outputEncoder: Encoder[WmOut] = Encoders.product[WmOut]
  }
}
