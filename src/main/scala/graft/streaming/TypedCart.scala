package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._
import graft.streaming.Machines.{CartItem, CartTotal, CartUpdate}

/** The cart workload (W8) on transformWithState's NATIVE typed state —
  * `ListState[CartItem]` for the lots, `ValueState[Double]` for the
  * discount, a state-store timer for the expiry — in contrast to
  * [[AspStream]]'s generic machine-blob runtime.
  *
  * Two tiers, both valid Spark-first designs:
  *  - [[AspStream.Processor]] runs ANY [[KeyedStateMachine]] unchanged
  *    from batch replay (the reference's arbitrary-callback model) —
  *    state is an opaque java-serialized blob.
  *  - This processor is what a workload looks like rebuilt natively:
  *    columnar-encodable state types the store can evolve/inspect,
  *    per-field updates instead of whole-blob rewrites (RocksDB writes
  *    only the touched lots), and timers used directly.
  *
  * Timer semantics match the engine rule (timers precede same-or-later
  * events): the expiry is applied inline when an event at ts ≥ expiry
  * arrives, and by `handleExpiredTimer` when the watermark passes it.
  */
final class TypedCartProcessor(discountExpiryUs: Long)
    extends StatefulProcessor[Long, CartUpdate, CartTotal] {

  @transient private var items: ListState[CartItem] = _
  @transient private var discount: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    items = getHandle.getListState[CartItem]("items", Encoders.product[CartItem], TTLConfig.NONE)
    discount = getHandle.getValueState[Double]("discount", Encoders.scalaDouble, TTLConfig.NONE)
  }

  private def currentDiscount(eventTsUs: Long): Double = {
    if (!discount.exists()) {
      discount.update(0.9)
      // ceil-ms, NEVER floor: the watermark path must fire at-or-after
      // the true µs expiry — a floor-ms registration would flip the
      // discount off up to 999 µs early for an event in
      // [floor-ms(expiry), expiry) delivered in a later micro-batch
      // (the same rule as AspStream.storeMs; events between expiry and
      // ceil-ms stay correct via the event-ts gate below)
      getHandle.registerTimer(Math.floorDiv(discountExpiryUs + 999, 1000))
    }
    if (eventTsUs >= discountExpiryUs) { discount.update(1.0); 1.0 }
    else discount.get()
  }

  override def handleInputRows(key: Long, rows: Iterator[CartUpdate],
                               timerValues: TimerValues): Iterator[CartTotal] = {
    // (ts, seq): ts alone would leave same-µs updates in
    // shuffle-arrival order — the AspStream tie-break rule
    rows.toVector.sortBy(u => (u.ts_us, u.seq)).map { u =>
      val d = currentDiscount(u.ts_us)
      if (u.add) items.appendValue(CartItem(u.name, u.cost * d, u.qty))
      else {
        val kept = Machines.removeFifo(items.get().toVector, u.qty)(
          _.name == u.name, _.qty, (it, q) => it.copy(qty = q))
        items.clear()
        if (kept.nonEmpty) items.appendList(kept.toArray)
      }
      val lots = items.get().toVector
      CartTotal(key, u.ts_us, lots.map(i => i.cost * i.qty).sum, lots.map(_.qty.toLong).sum)
    }.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[CartTotal] = {
    if (discount.exists()) discount.update(1.0)
    Iterator.empty
  }
}
