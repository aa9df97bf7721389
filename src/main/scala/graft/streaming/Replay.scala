package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions.col
import scala.collection.mutable

/** The reference's engine core — a virtual-time event loop with scheduled
  * callbacks (processor.py:64-100: sorted schedule, fast-forward replay,
  * FIFO tie-breaks; call_later/sleep/timer at :41-62, :106-116, :140-150) —
  * re-expressed Spark-first.
  *
  * A [[KeyedStateMachine]] is the Scala equivalent of the reference's
  * stateful callback object (Greeter, CartManager, MyAlgo⇄Exchange): plain
  * mutable fields, an `onEvent` callback receiving `(event_time, value)`,
  * and a timer facility with the reference's semantics — the callee
  * receives the DUE time as its event time (verified, SURVEY §2.1 P3).
  *
  * The SAME machine runs in two execution modes:
  *  - **batch replay** ([[Replay.run]]) = the reference's "travel through
  *    the past at maximum speed": one shuffle to co-locate each key, a
  *    distributed secondary sort (key, ts, tieBreak), then a single
  *    streaming pass per partition. Virtual time per key advances event by
  *    event; due timers fire interleaved, exactly like the reference's
  *    nested loop — but across 1000 executors, one key-group at a time,
  *    with nothing collected to the driver.
  *  - **live streaming** ([[AspStream]]) = `transformWithState` over the
  *    same machine, timers backed by the state store, watermark-driven.
  *
  * Divergence from the reference (documented, SURVEY §7.4): at an exact
  * due-time == event-time collision, timers fire BEFORE the event (the
  * reference resolves by schedule insertion order, which is not
  * reconstructible from data). Equal-due timers fire in scheduling (FIFO)
  * order, matching the reference's stable sort.
  */
trait KeyedStateMachine[K, I, O] extends Serializable {
  /** `on_start` (processor.py:185-186): fires before any event; virtual
    * time is the replay `startMicros` (or the key's first event time when
    * no explicit start is given). Typical use: seed timers
    * (e5_retail_cart.py:106-108). */
  def onStart(key: K, ctx: ReplayCtx[O]): Unit = ()

  /** One `(event_time, value)` delivery (processor.py:187-189). */
  def onEvent(tsMicros: Long, value: I, ctx: ReplayCtx[O]): Unit

  /** A scheduled callback firing at its due time (processor.py:57-60:
    * event_time = due time). `tag` routes multi-purpose timers. */
  def onTimer(tsMicros: Long, tag: String, ctx: ReplayCtx[O]): Unit = ()

  /** After the key's stream is drained AND all timers fired (the
    * reference loop exits only when the schedule is empty,
    * processor.py:67). */
  def onFinish(ctx: ReplayCtx[O]): Unit = ()
}

/** Per-key execution context: emission buffer + timer schedule + virtual
  * clock. Mirrors the reference's `Processor` (one per key here — the
  * reference is single-threaded; per-key contexts are what makes this
  * shard across a cluster). */
final class ReplayCtx[O] private[streaming] (private[streaming] var nowMicros: Long) {
  private[streaming] val out = mutable.ArrayBuffer.empty[O]
  /** (due, fifo, tag) min-ordered by (due, fifo) — the reference's
    * stable-sorted schedule (processor.py:61-62). */
  private[streaming] val timers =
    mutable.PriorityQueue.empty[(Long, Long, String)](Ordering.by[(Long, Long, String), (Long, Long)](t => (t._1, t._2)).reverse)
  private[streaming] var fifo = 0L

  /** Virtual now — `asp.now()` (processor.py:119-124). */
  def now: Long = nowMicros
  def emit(o: O): Unit = out += o
  /** `call_later(delay, …)` — due = now + delay. */
  def callLater(delayMicros: Long, tag: String = ""): Unit =
    callAt(nowMicros + delayMicros, tag)
  /** `call_later` with an absolute due time. */
  def callAt(dueMicros: Long, tag: String = ""): Unit = {
    timers.enqueue((dueMicros, fifo, tag)); fifo += 1
  }
  private[streaming] def drain(): Seq[O] = { val r = out.toVector; out.clear(); r }
}

object Replay {

  /** Batch virtual-time replay of `ds` through per-key state machines.
    *
    * @param ds        input events (a case class with key/ts/tieBreak fields)
    * @param keyCol    grouping column — each key gets its own machine
    * @param tsCol     event-time column (TimestampType or long micros)
    * @param tieBreak  deterministic order for simultaneous events (§1.3.7)
    * @param startMicros replay start time (`asp.run(start_time=…)`); when
    *                  None, each key starts at its first event
    * @param key       key extractor matching keyCol
    * @param ts        event-time extractor (micros) matching tsCol
    * @param factory   machine constructor, called once per key
    *
    * Plan shape: Exchange(hashpartitioning(keyCol)) → Sort(key, ts, tie)
    * → MapPartitions. One shuffle, no driver collection, keys streamed
    * through a partition one group at a time — the 100 TB-safe layout.
    */
  def run[I, K, O: Encoder](ds: Dataset[I], keyCol: String, tsCol: String,
                            tieBreak: String, startMicros: Option[Long] = None)(
      key: I => K, ts: I => Long)(
      factory: K => KeyedStateMachine[K, I, O]): Dataset[O] = {
    val start = startMicros
    ds.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol), col(tieBreak))
      .mapPartitions { it =>
        new Iterator[Seq[O]] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Seq[O] = {
            val k = key(buf.head)
            val ctx = new ReplayCtx[O](start.getOrElse(ts(buf.head)))
            val m = factory(k)
            m.onStart(k, ctx)
            while (buf.hasNext && key(buf.head) == k) {
              val row = buf.next()
              val eventTs = ts(row)
              fireDue(m, ctx, upTo = eventTs)
              ctx.nowMicros = eventTs
              m.onEvent(eventTs, row, ctx)
            }
            fireDue(m, ctx, upTo = Long.MaxValue) // drain: schedule empty = loop exit
            m.onFinish(ctx)
            ctx.drain()
          }
        }.flatten
      }
  }

  /** Fire every timer with due <= upTo, in (due, FIFO) order; firing may
    * schedule further timers (feedback loops, periodic ticks). */
  private def fireDue[K, I, O](m: KeyedStateMachine[K, I, O], ctx: ReplayCtx[O], upTo: Long): Unit =
    while (ctx.timers.nonEmpty && ctx.timers.head._1 <= upTo) {
      val (due, _, tag) = ctx.timers.dequeue()
      ctx.nowMicros = due
      m.onTimer(due, tag, ctx)
    }

}
