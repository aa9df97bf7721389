package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Fixture types for the idle-TTL eviction spec — top-level so the
  * machine closure serializes without an outer test-class reference. */
private[streaming] object TtlFixtures {
  val T0 = 1704067200000000L // 2024-01-01 00:00 UTC in µs
  case class Ev(user_id: Long, ts_us: Long, seq: Long)
  case class CountRow(user_id: Long, ts_us: Long, n: Long)

  /** Running per-key event count — the minimal machine whose output
    * exposes whether state survived (count continues) or was evicted
    * (count restarts at 1, exactly what a brand-new key would emit). */
  class CountMachine(uid: Long) extends KeyedStateMachine[Long, Ev, CountRow] {
    private var n = 0L
    def onEvent(ts: Long, e: Ev, ctx: ReplayCtx[CountRow]): Unit = {
      n += 1; ctx.emit(CountRow(uid, ts, n))
    }
  }
  def factory(uid: Long): KeyedStateMachine[Long, Ev, CountRow] =
    new CountMachine(uid)
}

/** VERDICT r7 #3: state TTL for unbounded key spaces. The reference
  * never forgets (its example key spaces are bounded —
  * e5_retail_cart.py:34-68 has a handful of users); at 100 TB key
  * cardinality with churn, eternal per-key state is an OOM by design.
  * `AspStream.run(idleTtlUs = …)` evicts a key once the WATERMARK has
  * passed `lastActivity + ttl` with no pending machine timers; the
  * divergence contract is pinned here:
  *
  *  - TTL off (default): reference semantics exactly — counts continue
  *    across arbitrarily long idle gaps (batch-replay parity);
  *  - TTL on: an evicted key's next event behaves like a NEW key's
  *    first event (fresh machine via the factory) — the reference's own
  *    late-event stance (deliver late, never resurrect) applied to
  *    state lifetime;
  *  - keys that stay ACTIVE (events inside the TTL window) are
  *    untouched — their counts continue exactly as with TTL off.
  */
class StateTtlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TtlFixtures._

  private def runStream(ttlUs: Long,
                        batches: Seq[Seq[Ev]]): Seq[CountRow] = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[Ev]
    val withWm = mem.toDS()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
      .as[Ev]
    val out = AspStream.run(withWm)(
      _.user_id, _.ts_us, _.seq, idleTtlUs = ttlUs)(factory)
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[CountRow]())
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ttl").toString
    val q = out.writeStream
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[CountRow], _: Long) =>
        ds.collect().foreach(got.add); ()
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq.sortBy(r => (r.user_id, r.ts_us))
  }

  // key 1: two events, a 40 s idle gap, then one more event.
  // key 2: steady heartbeats every ~10 s (never idle past the 10 s TTL).
  // key 3: a late joiner whose events only advance the watermark.
  private val s = 1000000L // µs per second
  private val batches = Seq(
    Seq(Ev(1, T0, 1), Ev(1, T0 + 1 * s, 2), Ev(2, T0 + 1 * s, 3)),
    Seq(Ev(2, T0 + 10 * s, 4), Ev(3, T0 + 12 * s, 5)),
    // watermark after this batch (30 s) passes key 1's eviction due
    // (last activity 1 s + ttl 10 s = 11 s) -> key 1 evicted, key 2
    // was active at 10 s (due 20 s) and stays... evicted at 30s? no:
    // key 2 gets another event at 28 s in THIS batch, re-arming it.
    Seq(Ev(2, T0 + 28 * s, 6), Ev(3, T0 + 30 * s, 7)),
    // an empty batch lets the 30 s watermark fire key 1's pending
    // eviction timer before key 1's late return below
    Seq.empty,
    Seq(Ev(1, T0 + 41 * s, 8), Ev(2, T0 + 41 * s, 9)))
  private val allEvents = batches.flatten

  test("TTL off: reference semantics — counts continue across any idle gap") {
    val sp = spark
    import sp.implicits._
    val batch = Replay.run(sp.createDataset(allEvents),
        "user_id", "ts_us", "seq", Some(T0))(_.user_id, _.ts_us)(factory)
      .collect().toSeq.sortBy(r => (r.user_id, r.ts_us))
    val stream = runStream(0L, batches)
    assert(stream == batch)
    assert(stream.filter(_.user_id == 1).map(_.n) == Seq(1, 2, 3))
  }

  test("TTL on: idle key evicted — its late return counts like a new key; active keys untouched") {
    val stream = runStream(10 * s, batches)
    // key 1 idled 40 s >> ttl 10 s: its return restarts at n=1 — the
    // same row a brand-new key would emit (late-event semantics)
    assert(stream.filter(_.user_id == 1).map(_.n) == Seq(1, 2, 1))
    // key 2's gaps (9 s, 18 s... wait: 1->10->28->41) — 9 s, 18 s, 13 s.
    // Only the 9 s gap is inside the TTL; 18 s and 13 s cross it, BUT
    // eviction also needs the WATERMARK to pass due while idle: due
    // after 10 s activity = 20 s, and the next watermark advance (to
    // 30 s, end of batch 3) happens in the same batch that delivers
    // key 2's 28 s event — the event re-arms the key before the timer
    // fires in batch 4, so the count survives. This pins the contract:
    // eviction is watermark-driven, never a retroactive purge.
    assert(stream.filter(_.user_id == 2).map(_.n) == Seq(1, 2, 3, 4))
    // a fresh machine after eviction is EXACTLY a new key's machine:
    // key 1's post-gap output equals replaying just the suffix
    val sp = spark
    import sp.implicits._
    val suffix = Replay.run(
        sp.createDataset(Seq(Ev(1, T0 + 41 * s, 8))),
        "user_id", "ts_us", "seq", Some(T0))(_.user_id, _.ts_us)(factory)
      .collect().toSeq
    assert(stream.filter(_.user_id == 1).drop(2) == suffix)
  }
}
