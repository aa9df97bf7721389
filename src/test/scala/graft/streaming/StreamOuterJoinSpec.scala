package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Stream-stream LEFT OUTER join under watermarks — the attribution
  * shape (impressions ⟕ clicks within an attribution window). The inner
  * rows emit as matches arrive; the null-padded rows for unmatched
  * impressions CANNOT emit until the watermark proves no future click
  * can join them (click.ts ≤ imp.ts + window + delay), so outer results
  * trail the watermark by design. State is bounded by the same bound:
  * both sides evict rows older than watermark − window. Parity: the
  * finalized streaming output equals the batch left join restricted to
  * watermark-passed impressions. */
class StreamOuterJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("left-outer stream-stream join flushes null-padded rows on watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    def impDf(m: MemoryStream[(Long, Long)]) = m.toDS()
      .toDF("imp_id", "sec")
      .select($"imp_id", timestamp_seconds($"sec").as("imp_ts"))
      .withWatermark("imp_ts", "10 seconds")
    def clkDf(m: MemoryStream[(Long, Long)]) = m.toDS()
      .toDF("click_imp", "csec")
      .select($"click_imp", timestamp_seconds($"csec").as("click_ts"))
      .withWatermark("click_ts", "10 seconds")

    val imps = MemoryStream[(Long, Long)]
    val clicks = MemoryStream[(Long, Long)]
    // attribution window: click within [imp_ts, imp_ts + 60s]
    val joined = impDf(imps).join(clkDf(clicks),
      $"click_imp" === $"imp_id" &&
        $"click_ts" >= $"imp_ts" && $"click_ts" <= $"imp_ts" + expr("INTERVAL 60 SECONDS"),
      "left_outer")

    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      // impressions A,B,C at t=100; click for A at t=130 (inside window)
      imps.addData((1L, 100L), (2L, 100L), (3L, 100L))
      clicks.addData((1L, 130L))
      q.processAllAvailable()

      // sentinels at t=1000 advance both watermarks past
      // 100 + 60 + 10 = 170 → B and C finalize as unmatched
      imps.addData((99L, 1000L))
      clicks.addData((999L, 1000L))
      q.processAllAvailable()
      // watermark computed at a batch's END applies to the NEXT batch —
      // one more batch carries the flush
      imps.addData((98L, 1001L))
      clicks.addData((998L, 1001L))
      q.processAllAvailable()

      val got = sp.table("attrib")
        .select($"imp_id", unix_timestamp($"imp_ts").as("isec"),
          $"click_imp", unix_timestamp($"click_ts").as("csec"))
        .orderBy($"imp_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
      assert(got.toSeq == Seq(
        (1L, 100L, 1L, 130L),  // matched within the window
        (2L, 100L, -1L, -1L),  // null-padded only after watermark proof
        (3L, 100L, -1L, -1L)))

      // the sentinels are NOT in the output: their outer verdict is
      // still open (watermark has not passed their window)
      assert(!got.exists(r => r._1 >= 98L))

      // batch parity on the finalized region (imp_ts + 60 + 10 < wm)
      val impB = Seq((1L, 100L), (2L, 100L), (3L, 100L), (99L, 1000L), (98L, 1001L))
        .toDF("imp_id", "sec").select($"imp_id", timestamp_seconds($"sec").as("imp_ts"))
      val clkB = Seq((1L, 130L), (999L, 1000L), (998L, 1001L))
        .toDF("click_imp", "csec").select($"click_imp", timestamp_seconds($"csec").as("click_ts"))
      val batch = impB.join(clkB,
          $"click_imp" === $"imp_id" &&
            $"click_ts" >= $"imp_ts" && $"click_ts" <= $"imp_ts" + expr("INTERVAL 60 SECONDS"),
          "left_outer")
        .filter(unix_timestamp($"imp_ts") + 70 < 1001 - 10)
        .select($"imp_id", unix_timestamp($"imp_ts").as("isec"),
          $"click_imp", unix_timestamp($"click_ts").as("csec"))
        .orderBy($"imp_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
      assert(batch.sameElements(got))

      // stream-stream join state is bounded by eviction: the watermark
      // (991) evicted every t=100 row from both sides, so state holds
      // at most the 4 in-flight sentinels — strictly fewer than the 8
      // rows fed in
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty)
      val stateRows = st.map(_.numRowsTotal).sum
      assert(stateRows > 0 && stateRows <= 4, s"state not evicted: $stateRows rows")
    } finally q.stop()
  }
}
