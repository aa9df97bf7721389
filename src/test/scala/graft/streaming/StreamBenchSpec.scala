package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The bench's live-path measurement is itself gated: parity between the
  * streaming (GraftFeed → transformWithState/RocksDB) and batch-replay
  * outputs must hold at fixture scale, and a parity failure must zero
  * the reported rate (the driver never reads a wrong-answer number). */
class StreamBenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("StreamBench: W7+W8 live ≡ batch replay at sf0.001, positive rate, batch latencies recorded") {
    val r = graft.StreamBench.run(spark, "/root/testdata/sf0.001")
    assert(r.parity, "streaming output must fingerprint-match batch replay")
    assert(r.eventsPerSec > 0)
    assert(r.events == 2000L) // 1000 ticks (W7) + 1000 cart ops (W8)
    assert(r.batches >= 2 && r.batchMaxMs >= r.batchAvgMs)
  }
}
