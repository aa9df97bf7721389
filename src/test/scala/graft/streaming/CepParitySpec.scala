package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.streaming.Machines._

/** CEP parity: the consecutive-pattern matcher produces identical
  * matches three ways —
  *   (a) live Structured Streaming (transformWithState), including a
  *       pattern that STRADDLES a micro-batch boundary (the state carry
  *       the batch window query gets for free from sorting);
  *   (b) batch replay of the same machine;
  *   (c) the declarative q112_seq_pattern lead()-window query over the
  *       real events fixture.
  * (a) ≡ (b) proves past/live parity for CEP; (b) ≡ (c) proves the
  * machine and the relational form are the same operator.
  */
class CepParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import Fixtures.{T0, s}

  private def factory: Long => SeqPatternMachine = {
    val pattern = Seq("view", "click", "purchase") // local: the lambda
    uid => new SeqPatternMachine(uid, pattern)     // must not capture `this`
  }

  // user 1: two overlapping candidate runs — view,click,view,click,purchase
  // matches ONCE (consecutive semantics: the second view breaks the first
  // run); user 2: an exact match plus a trailing purchase that must not
  // re-match.
  private val events = Seq(
    PatternEvent(1L, s(1), 1, "view"), PatternEvent(1L, s(2), 2, "click"),
    PatternEvent(1L, s(3), 3, "view"), PatternEvent(1L, s(4), 4, "click"),
    PatternEvent(1L, s(5), 5, "purchase"),
    PatternEvent(2L, s(1), 6, "view"), PatternEvent(2L, s(2), 7, "click"),
    PatternEvent(2L, s(3), 8, "purchase"), PatternEvent(2L, s(4), 9, "purchase"))

  test("streaming pattern match ≡ batch replay, pattern straddling micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val batchOut = Replay.run(sp.createDataset(events), "user_id", "ts_us",
        "seq", Some(T0))(_.user_id, _.ts_us)(factory)
      .collect().toSeq.sortBy(m => (m.user_id, m.end_us))
    assert(batchOut == Seq(
      PatternMatch(1L, s(3), s(5)), PatternMatch(2L, s(1), s(3))))

    val mem = MemoryStream[PatternEvent]
    val withWm = mem.toDS()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
      .as[PatternEvent]
    val out = AspStream.run(withWm)(_.user_id, _.ts_us, _.seq)(factory)

    val ckpt = java.nio.file.Files.createTempDirectory("graft-cep").toString
    val q = out.writeStream.format("memory").queryName("cep_stream")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      // user 1's match is split view,click | view,click | purchase across
      // three micro-batches — the k−1 window must survive in state
      mem.addData(events(0), events(1), events(5), events(6))
      q.processAllAvailable()
      mem.addData(events(2), events(3), events(7))
      q.processAllAvailable()
      mem.addData(events(4), events(8))
      q.processAllAvailable()
      val streamOut = sp.sql("SELECT * FROM cep_stream").as[PatternMatch]
        .collect().toSeq.sortBy(m => (m.user_id, m.end_us))
      assert(streamOut == batchOut)
    } finally q.stop()
  }

  test("machine replay over the events fixture ≡ q112_seq_pattern window query") {
    val sp = spark
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"

    val ev = graft.core.Tables.events(sp, dir)
      .select($"user_id", unix_micros($"ts").as("ts_us"),
        $"event_id".as("seq"), $"event_type")
      .as[PatternEvent]
    val machineAgg = Replay.run(ev, "user_id", "ts_us", "seq")(
        _.user_id, _.ts_us)(factory)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_matches"), min($"start_us").as("first_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val queryOut = graft.SparkEntry.queries("q112_seq_pattern")(sp, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(queryOut.nonEmpty)
    assert(machineAgg == queryOut)
  }
}
