package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.streaming.Machines._

/** W10 reference-shape parity: the e2_stats MovingAverage workload — two
  * zipped series (prices, volumes), a 2-min trailing window, samples on a
  * 1-min timer from first to last event — replayed through the machine
  * runtime and checked against an independent in-test recomputation of
  * the exact-virtual-time semantics. */
class VwapMachineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import Fixtures.T0

  // reference data (e2_stats.py): minutes offset → (price, volume)
  private val series = Seq(
    1.3 -> (12.653, 100.0), 2.3 -> (14.210, 115.0), 3.8 -> (13.099, 85.0),
    4.1 -> (12.892, 90.0), 4.4 -> (17.328, 95.0), 5.1 -> (18.543, 185.0),
    5.3 -> (17.564, 205.0), 6.3 -> (19.023, 70.0), 8.7 -> (19.763, 65.0))

  private def mUs(m: Double): Long = T0 + (m * 60e6).toLong

  test("W10 e2_stats: timer-sampled sliding VWAP + cumulative volume") {
    import spark.implicits._
    val events = series.zipWithIndex.map { case ((m, (p, v)), i) =>
      PriceVol(1L, mUs(m), i.toLong, p, v)
    }
    val startUs = mUs(1.3); val endUs = mUs(8.7)
    val intervalUs = 2L * 60000000L; val stepUs = 60000000L
    val out = Replay.run(spark.createDataset(events), "series_id", "ts_us", "seq", Some(T0))(
        _.series_id, _.ts_us) { id => new VwapMachine(id, intervalUs, stepUs, startUs, endUs) }
      .collect().toSeq.sortBy(_.ts_us)

    // independent recomputation: ticks at start+step .. ≤ end; at a tick,
    // delivered events are those with ts < tick (timer-first tie rule);
    // window keeps ts ≥ tick − interval
    val expected = Iterator.iterate(startUs + stepUs)(_ + stepUs).takeWhile(_ <= endUs).flatMap { tick =>
      val delivered = series.map { case (m, (p, v)) => (mUs(m), p, v) }.filter(_._1 < tick)
      val inWin = delivered.filter(_._1 >= tick - intervalUs)
      if (delivered.isEmpty || inWin.isEmpty) None
      else Some(VwapSample(1L, tick,
        inWin.map(r => r._2 * r._3).sum / inWin.map(_._3).sum,
        delivered.map(_._3).sum))
    }.toSeq

    assert(out.size == 7) // ticks at 2.3 .. 8.3 min
    assert(out == expected)
    // spot-check the first sample: only the 1.3-min event is in scope
    // ((p·w)/w re-associates in IEEE — compare within an ulp-scale bound)
    assert(math.abs(out.head.vwap - 12.653) < 1e-12 && out.head.cum_volume == 100.0)
  }
}
