package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.streaming.Machines._

/** W7 golden test: the e4_trade_pnl example — quotes drive the mid,
  * trades drive running per-side positions, PnL recomputed per trade.
  *
  * Delivery-order note (verified against the reference empirically this
  * round): when the reference runs quotes and trades as TWO separate
  * `process_stream`s, its scheduler round-robins the streams one event
  * per turn — observed order (q,0.5),(t,1.0),(q,0.6),(t,2.0),… — so
  * trades at 1.0/2.0/3.0 s compute against a stale mid. The reference's
  * own examples note streams must be merged first "as this is how ASP
  * handles simultaneous events" (e2_ticking.py:34). This engine always
  * delivers in global (ts, tieBreak) order — i.e. the merged-stream
  * semantics, the reference's documented best practice — and the expected
  * values below are derived for THAT order (hence PNL@2 s = 1132.50 here
  * vs 1177.50 in the reference's unmerged two-stream log, where the mid
  * was stale). The t=5 s trade/bid tie keeps the reference's insertion
  * order (trade first) via `seq`. */
class PnlMachineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import Fixtures.{T0, s}

  test("W7 e4_trade_pnl: Mid and PnL sequences match the reference timeline") {
    import spark.implicits._
    def quote(t: Double, seq: Long, isBid: Boolean, p: Double) =
      PnlEvent(1L, s(t), seq, "quote", isBid, p, 0L, buy = false)
    def trade(t: Double, seq: Long, p: Double, q: Long, buy: Boolean) =
      PnlEvent(1L, s(t), seq, "trade", is_bid = false, p, q, buy)

    val events = Seq(
      quote(0.5, 0, isBid = true, 99.0),
      quote(0.6, 1, isBid = false, 99.1),
      trade(1.0, 2, 100.0, 50, buy = true),
      quote(1.3, 3, isBid = false, 99.2),
      quote(1.5, 4, isBid = true, 99.1),
      trade(2.0, 5, 101.5, 500, buy = false),
      trade(3.0, 6, 100.50, 100, buy = true),
      trade(4.0, 7, 101.2, 500, buy = false),
      quote(4.2, 8, isBid = false, 99.25),
      trade(5.0, 9, 101.3, 500, buy = false), // inserted before the 5.0 bid
      quote(5.0, 10, isBid = true, 99.2),
      trade(6.0, 11, 101.4, 500, buy = true))

    val out = Replay.run(spark.createDataset(events), "instrument", "ts_us", "seq", Some(T0))(
        _.instrument, _.ts_us)(id => new PnlMachine(id))
      .collect().toSeq.sortBy(_.ts_us)

    def r2(x: Double) = math.round(x * 100) / 100.0
    // 2-decimal view, matching the reference's printed log format
    val got = out.map(o => (o.kind, r2(o.mid), r2(o.pnl), r2(o.buy_pnl), r2(o.sell_pnl)))
    val want = Seq(
      ("mid", 99.05, 0.0, 0.0, 0.0),            // 0.6 first complete book
      ("pnl", 99.05, -47.5, -47.5, 0.0),        // 1.0 buy 50@100
      ("mid", 99.10, 0.0, 0.0, 0.0),            // 1.3
      ("mid", 99.15, 0.0, 0.0, 0.0),            // 1.5
      ("pnl", 99.15, 1132.5, -42.5, -1175.0),   // 2.0 sell 500@101.5
      ("pnl", 99.15, 997.5, -177.5, -1175.0),   // 3.0 buy 100@100.5
      ("pnl", 99.15, 2022.5, -177.5, -2200.0),  // 4.0 sell 500@101.2
      ("mid", 99.175, 0.0, 0.0, 0.0),           // 4.2 — .175 rounds as-is
      ("pnl", 99.175, 3063.75, -173.75, -3237.5), // 5.0 trade before bid
      ("mid", 99.225, 0.0, 0.0, 0.0),           // 5.0 bid after trade
      ("pnl", 99.225, 1908.75, -1253.75, -3162.5)) // 6.0 buy 500@101.4
      .map(t => (t._1, r2(t._2), r2(t._3), r2(t._4), r2(t._5)))
    assert(got == want)
  }
}
