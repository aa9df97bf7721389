package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark
import Machines.{AttrChange, AttrEvent, ChangeMachine}

/** CDC compaction three equal ways: the q118 SCD2 lag-window filter
  * (declarative batch), [[Machines.ChangeMachine]] under batch replay,
  * and the SAME machine live — with a no-op change crossing a
  * micro-batch boundary, where suppression depends on the persisted
  * per-key state rather than anything visible in the batch. */
class CdcParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val events = Seq(
    AttrEvent(1L, 10L, 0L, "A"), AttrEvent(1L, 20L, 1L, "A"), // no-op
    AttrEvent(1L, 30L, 2L, "B"), AttrEvent(1L, 40L, 3L, "B"), // no-op
    AttrEvent(1L, 50L, 4L, "A"),                              // A again = change
    AttrEvent(2L, 10L, 5L, "X"), AttrEvent(2L, 60L, 6L, "X")) // no-op, 2nd batch
  private val want = Seq(
    AttrChange(1L, 10L, "A"), AttrChange(1L, 30L, "B"), AttrChange(1L, 50L, "A"),
    AttrChange(2L, 10L, "X"))

  test("lag-window filter, batch replay, and live machine agree") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    // 1. the declarative q118 compaction stage
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"seq")
    val sqlForm = sp.createDataset(events).toDF()
      .withColumn("prev", lag($"attr", 1).over(w))
      .filter($"prev".isNull || $"attr" =!= $"prev")
      .select($"user_id", $"ts_us", $"attr").as[AttrChange]
      .collect().toSeq.sortBy(c => (c.user_id, c.ts_us))
    assert(sqlForm == want)

    // 2. the machine under batch replay
    val replayed = Replay.run(sp.createDataset(events),
        "user_id", "ts_us", "seq")(_.user_id, _.ts_us)(new ChangeMachine(_))
      .collect().toSeq.sortBy(c => (c.user_id, c.ts_us))
    assert(replayed == want)

    // 3. the same machine live, split so user 1's (40,"B") no-op and
    // user 2's (60,"X") no-op arrive in a LATER batch than the values
    // that suppress them
    val mem = MemoryStream[AttrEvent]
    val withWm = mem.toDS()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
      .as[AttrEvent]
    val out = AspStream.run(withWm)(_.user_id, _.ts_us)(new ChangeMachine(_))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = out.writeStream.format("memory").queryName("cdc_live")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      mem.addData(events.filter(_.ts_us <= 30L): _*)
      q.processAllAvailable()
      mem.addData(events.filter(_.ts_us > 30L): _*)
      q.processAllAvailable()
      val live = sp.table("cdc_live").as[AttrChange]
        .collect().toSeq.sortBy(c => (c.user_id, c.ts_us))
      assert(live == want)
    } finally q.stop()
  }

  test("null attributes: machine matches the lag-window form's semantics") {
    val sp = spark
    import sp.implicits._
    // A, null, null, A: the window form drops the first null (NULL <>
    // 'A' is not TRUE), KEEPS the second null (prev IS NULL — lag reads
    // the previous ROW, dropped or not), and keeps the A after it; the
    // machine must reproduce exactly that, including updating state on
    // suppressed rows
    val evs = Seq(
      AttrEvent(1L, 10L, 0L, "A"), AttrEvent(1L, 20L, 1L, null),
      AttrEvent(1L, 30L, 2L, null), AttrEvent(1L, 40L, 3L, "A"))
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"seq")
    val sqlForm = sp.createDataset(evs).toDF()
      .withColumn("prev", lag($"attr", 1).over(w))
      .filter($"prev".isNull || $"attr" =!= $"prev")
      .select($"user_id", $"ts_us", $"attr").as[AttrChange]
      .collect().toSeq.sortBy(_.ts_us)
    val replayed = Replay.run(sp.createDataset(evs),
        "user_id", "ts_us", "seq")(_.user_id, _.ts_us)(new ChangeMachine(_))
      .collect().toSeq.sortBy(_.ts_us)
    assert(sqlForm == Seq(AttrChange(1L, 10L, "A"),
      AttrChange(1L, 30L, null), AttrChange(1L, 40L, "A")))
    assert(replayed == sqlForm)
  }
}
