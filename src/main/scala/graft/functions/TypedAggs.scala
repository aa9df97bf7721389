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

  /** KMV (k minimum values) distinct-count sketch as a TRUE two-phase
    * aggregate: the buffer is the k smallest DISTINCT portable hashes,
    * `reduce` inserts map-side (so the shuffle carries ≤ k longs per
    * group per partition — never the rows), `merge` is min-k of the
    * union (exact: min-k(A∪B) = min-k(min-k(A) ∪ min-k(B))), and
    * `finish` applies the (k-1)·P/h_k estimator (exact below k). The
    * aggregation-free sibling of the q59/q78 window formulation — the
    * form that drops into any groupBy at 100 TB.
    *
    * Input hashes must already be in the portable domain
    * ([[PortableHash.md5Mod]] — uniform on [0, P)). */
  final case class KmvBuf(hs: Array[Long])

  object KmvSketch extends Aggregator[Long, KmvBuf, Double] {
    val K = 64
    private val P = PortableHash.P

    override def zero: KmvBuf = KmvBuf(Array.empty[Long])

    /** Insert h into the sorted distinct min-k array (skip if present,
      * drop the max when over k) — O(log k) search + O(k) copy on the
      * rare shrinking hit; the common case (h ≥ current max with a full
      * buffer) is O(log k) with no allocation. */
    override def reduce(buf: KmvBuf, h: Long): KmvBuf = {
      val b = buf.hs
      val i = java.util.Arrays.binarySearch(b, h)
      if (i >= 0) buf // already present
      else {
        val ins = -i - 1
        if (b.length >= K && ins >= K) buf // larger than the kept max
        else {
          val n = math.min(b.length + 1, K)
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
          KmvBuf(out)
        }
      }
    }

    override def merge(xb: KmvBuf, yb: KmvBuf): KmvBuf = {
      // merge two sorted distinct arrays, keep the k smallest
      val x = xb.hs; val y = yb.hs
      val out = new Array[Long](math.min(x.length + y.length, K))
      var i = 0; var j = 0; var o = 0
      // dedup via explicit first-element flag — a sentinel value would
      // drop a legitimate hash equal to it (e.g. Long.MinValue)
      var seen = false
      var last = 0L
      while (o < out.length && (i < x.length || j < y.length)) {
        val v =
          if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
          else { val v = y(j); j += 1; v }
        if (!seen || v != last) { out(o) = v; o += 1; last = v; seen = true }
      }
      KmvBuf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }

    override def finish(buf: KmvBuf): Double = {
      val b = buf.hs
      if (b.length < K) b.length.toDouble
      else ((K - 1).toDouble * P.toDouble) / b(K - 1).toDouble
    }

    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
