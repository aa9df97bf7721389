package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Observation, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pipeline observability — the metrics a production corpus pipeline
  * exports without a second scan. `observe` attaches named aggregates to
  * a plan node; they're computed DURING the action (no extra job, no
  * extra pass over 100 TB) and surface through `Observation` (batch) or
  * per-micro-batch `observedMetrics` in the streaming progress (the
  * admission/drop counters an operator watches on a live feed). */
class ObservabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("batch: admission counters ride the action, no second scan") {
    val sp = spark
    import sp.implicits._
    val docs = graft.core.Tables.documents(sp, "/root/testdata/sf0.01")
    val obs = Observation("admission")
    val kept = docs
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when($"n_chars" >= 200, 1L).otherwise(0L)).as("rows_kept"),
        sum($"n_chars").as("chars_in"))
      .filter($"n_chars" >= 200)
      .count()
    val m = obs.get
    assert(m("rows_kept") == kept)
    assert(m("rows_in").asInstanceOf[Long] > kept)
    assert(m("chars_in").asInstanceOf[Long] > 0L)
  }

  test("streaming: per-micro-batch observed metrics in the progress") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[Int]
    val q = mem.toDS().toDF("v")
      .observe("batch_stats", count(lit(1)).as("rows"),
        sum(when($"v" % 2 === 0, 1L).otherwise(0L)).as("evens"))
      .writeStream.format("noop").start()
    try {
      mem.addData(1, 2, 3, 4, 5)
      q.processAllAvailable()
      val m1 = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("batch_stats"))).lastOption
        .getOrElse(fail("no observed metrics in progress"))
      assert(m1.getAs[Long]("rows") == 5L && m1.getAs[Long]("evens") == 2L)

      mem.addData(6, 8)
      q.processAllAvailable()
      val m2 = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("batch_stats"))).last
      assert(m2.getAs[Long]("rows") == 2L && m2.getAs[Long]("evens") == 2L)
    } finally q.stop()
  }
}
