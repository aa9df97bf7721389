package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.AsOfJoin

/** Live-stream enrichment via the broadcast as-of join: because
  * `asOfBroadcast` is a stream-static join plus a STATELESS per-row
  * binary search (`asof_pick`), it runs inside a streaming query with
  * ZERO streaming state — no watermark, no state store, no stream-stream
  * join machinery. The shape for enriching a live fact feed against a
  * reference timeline (instrument marks, config history) at any rate. */
class StreamingAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("broadcast as-of enriches a live stream statelessly, batch-parity") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    // reference timeline: per key, marks at t=10, 20, 30 (micros)
    val quotes = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0),
                     (2L, 15L, 9.0)).toDF("key", "ts_us", "mark")

    val mem = MemoryStream[(Long, Long)]
    val trades = mem.toDS().toDF("key", "ts_us")
    val enriched = AsOfJoin.asOfBroadcast(
      trades, quotes, Seq("key"), "ts_us", "ts_us", "mark")

    val q = enriched.writeStream.format("memory").queryName("asof_live")
      .outputMode("append").start()
    try {
      mem.addData((1L, 5L), (1L, 25L), (2L, 99L))
      q.processAllAvailable()
      mem.addData((1L, 30L), (2L, 14L)) // second batch: exact match + miss
      q.processAllAvailable()

      val got = sp.table("asof_live")
        .orderBy($"key", $"ts_us")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getDouble(2)))
      assert(got.toSeq == Seq(
        (1L, 5L, null),     // before the first mark
        (1L, 25L, 2.0),     // between marks: latest at-or-before
        (1L, 30L, 3.0),     // exact-timestamp match
        (2L, 14L, null),    // before key 2's only mark
        (2L, 99L, 9.0)))    // after the last mark

      // parity: identical rows from the batch operator
      val batch = AsOfJoin.asOfBroadcast(
          Seq((1L, 5L), (1L, 25L), (2L, 99L), (1L, 30L), (2L, 14L))
            .toDF("key", "ts_us"),
          quotes, Seq("key"), "ts_us", "ts_us", "mark")
        .orderBy($"key", $"ts_us")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getDouble(2)))
      assert(batch.sameElements(got))

      // stateless: no state store operators in the streaming plan
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
