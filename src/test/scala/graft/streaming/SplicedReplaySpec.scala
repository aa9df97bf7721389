package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Replay.runSpliced]] — the hot-key-safe parallel prefix scan — must
  * emit row-for-row what [[Replay.run]] emits with the equivalent
  * sequential machine, including on the fixture that motivates it: one
  * key owning 90% of the events. Also pins the slice mechanics: outputs
  * are invariant to the slice count (1 slice ≡ sequential; more slices
  * than distinct timestamps ≡ mostly-empty slices). */
class SplicedReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import graft.queries.AspSemantics.{RunningCents, SpliceIn, SpliceOut}

  private implicit lazy val inEnc: org.apache.spark.sql.Encoder[SpliceIn] =
    org.apache.spark.sql.Encoders.product[SpliceIn]
  private implicit lazy val outEnc: org.apache.spark.sql.Encoder[SpliceOut] =
    org.apache.spark.sql.Encoders.product[SpliceOut]
  private implicit lazy val kEnc: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
  private implicit lazy val sEnc: org.apache.spark.sql.Encoder[(Long, Long)] =
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)

  /** 90%-hot fixture: key 0 owns 9 of every 10 events; a few cold keys
    * share the rest. Timestamps collide across keys (slice boundaries
    * must not depend on key-local ranges) and include duplicates within
    * a key (tie-break order must hold inside a slice). */
  private def hotFixture(n: Int): Seq[SpliceIn] = {
    val rnd = new scala.util.Random(11)
    (0 until n).map { i =>
      val key = if (i % 10 != 0) 0L else 1L + (i % 7)
      val ts = 1000000L * rnd.nextInt(50) // heavy collisions
      SpliceIn(key, ts, i.toLong, rnd.nextInt(2001) - 1000L)
    }
  }

  private def sequential(rows: Seq[SpliceIn]): Seq[SpliceOut] = {
    val ds = spark.createDataset(rows)
    Replay.run(ds, "user_id", "ts_us", "event_id")(_.user_id, _.ts_us) { _ =>
      new KeyedStateMachine[Long, SpliceIn, SpliceOut] {
        private var cents = 0L
        private var n = 0L
        def onEvent(ts: Long, e: SpliceIn, ctx: ReplayCtx[SpliceOut]): Unit = {
          cents += e.cents; n += 1
          ctx.emit(SpliceOut(e.user_id, e.ts_us, e.event_id, cents, n))
        }
      }
    }.collect().toSeq.sortBy(o => (o.user_id, o.ts_us, o.event_id))
  }

  private def spliced(rows: Seq[SpliceIn], slices: Int): Seq[SpliceOut] =
    Replay.runSpliced(spark.createDataset(rows), slices)(
        _.user_id, _.ts_us, _.event_id)(RunningCents)
      .collect().toSeq.sortBy(o => (o.user_id, o.ts_us, o.event_id))

  test("90% hot key: spliced outputs equal the sequential machine's, at several slice counts") {
    val rows = hotFixture(2000)
    val want = sequential(rows)
    assert(want.size == 2000)
    Seq(1, 4, 32, 100).foreach { slices =>
      assert(spliced(rows, slices) == want, s"slices=$slices")
    }
  }

  test("hot-key parallelism: the hot key's events really spread across (key, slice) groups") {
    val rows = hotFixture(2000)
    // count phase-1 summary groups for the hot key by re-deriving the
    // slice assignment: 32 slices over the observed ts range
    val (lo, hi) = (rows.map(_.ts_us).min, rows.map(_.ts_us).max)
    val hotSlices = rows.filter(_.user_id == 0L)
      .map(r => (r.ts_us - lo) * 32 / (hi - lo + 1)).distinct.size
    assert(hotSlices > 8, s"fixture spans only $hotSlices slices")
    // and the operator's output for the hot key is still exact
    val want = sequential(rows).filter(_.user_id == 0L)
    assert(spliced(rows, 32).filter(_.user_id == 0L) == want)
  }

  test("degenerate shapes: single key, single event, all-identical timestamps") {
    val single = Seq(SpliceIn(5L, 42L, 1L, 7L))
    assert(spliced(single, 8) == sequential(single))
    val sameTs = (0 until 50).map(i => SpliceIn(1L, 1000L, i.toLong, i.toLong))
    assert(spliced(sameTs, 8) == sequential(sameTs))
  }
}
