package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.streaming.Machines._

/** The reference's core guarantee restated for Spark: replaying the past
  * (batch) and processing it live (Structured Streaming micro-batches)
  * produce THE SAME results from THE SAME state machine — including a
  * timer that fires between micro-batches (the cart discount expiry at
  * t+60 s, with events at 45 s and 75 s straddling it).
  */
class StreamingParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import Fixtures.{T0, s}

  import Fixtures.{cartUpdates => updates}

  test("W4/W8: streaming (transformWithState) ≡ batch replay, timer across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val batchOut = Replay.run(sp.createDataset(updates), "user_id", "ts_us", "seq", Some(T0))(
        _.user_id, _.ts_us)(Fixtures.cartFactory)
      .collect().toSeq.sortBy(_.ts_us)

    val mem = MemoryStream[CartUpdate]
    val withWm = mem.toDS()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
      .as[CartUpdate]
    val out = AspStream.run(withWm)(_.user_id, _.ts_us)(
      Fixtures.cartFactory)

    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = out.writeStream.format("memory").queryName("cart_stream")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      // batch 1: events before the 60 s discount expiry
      mem.addData(updates(0), updates(1), updates(2))
      q.processAllAvailable()
      // batch 2: the 75 s event — the 60 s timer must fire FIRST (inline
      // path), so Z is added undiscounted
      mem.addData(updates(3))
      q.processAllAvailable()

      val streamOut = sp.sql("SELECT * FROM cart_stream").as[CartTotal]
        .collect().toSeq.sortBy(_.ts_us)
      assert(streamOut == batchOut)
      assert(streamOut.map(t => math.round(t.total * 100) / 100.0)
        == Seq(9.00, 36.00, 22.50, 42.50))
    } finally q.stop()
  }
}
