package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.streaming.Crossover

/** W11: the custom DataSource V2 live adapter — producer pushes into the
  * feed, Spark consumes micro-batches; backlog → live handover via
  * Crossover works on it like on any replayable source. */
class GraftFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val T0 = java.time.Instant.parse("2020-01-01T00:00:00Z").toEpochMilli * 1000L

  test("graft-feed: backlog drains, live pushes continue, offsets are exact") {
    import spark.implicits._
    val feed = "quotes-" + System.nanoTime()
    // past backlog from the "exchange connection"
    GraftFeed.push(feed, T0 + 1000000L, "bid 100.0")
    GraftFeed.push(feed, T0 + 2000000L, "ask 100.5")
    GraftFeed.push(feed, T0 + 3000000L, "bid 100.1")

    val got = java.util.Collections.synchronizedList(new java.util.ArrayList[(Long, String, Long)]())
    val phases = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-feed-ckpt").toString

    def start(t: Trigger) =
      spark.readStream.format("graft-feed").option("feed", feed).load()
        .selectExpr("unix_micros(ts) AS ts_us", "value", "seq")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(Long, String, Long)].collect().foreach(got.add)
        }
        .option("checkpointLocation", ckpt)
        .trigger(t)
        .start()

    val live = Crossover.run(start, Crossover.Hooks(
        onLiveStart = () => { phases.add(s"live_start:${got.size()}"); () }),
      liveTrigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      GraftFeed.push(feed, T0 + 4000000L, "trade 100.2") // live arrival
      live.processAllAvailable()

      import scala.jdk.CollectionConverters._
      val rows = got.asScala.toVector.sortBy(_._3)
      assert(rows.map(_._2) == Vector("bid 100.0", "ask 100.5", "bid 100.1", "trade 100.2"))
      assert(rows.map(_._1) == Vector(1, 2, 3, 4).map(k => T0 + k * 1000000L))
      assert(rows.map(_._3) == Vector(0L, 1L, 2L, 3L)) // exact offsets, no dup/loss
      assert(phases.asScala.toVector == Vector("live_start:3")) // backlog fully drained at boundary
    } finally { live.stop(); GraftFeed.clear(feed) }
  }

  test("graft-feed sharded: N feeds = one table, vector offsets, per-shard partitions") {
    import spark.implicits._
    val a = "sharda-" + System.nanoTime()
    val b = "shardb-" + System.nanoTime()
    GraftFeed.push(a, T0 + 1000000L, "a0")
    GraftFeed.push(a, T0 + 2000000L, "a1")
    GraftFeed.push(b, T0 + 1500000L, "b0")

    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, String, Long, String)]())
    val ckpt = java.nio.file.Files.createTempDirectory("graft-shard-ckpt").toString
    val q = spark.readStream.format("graft-feed").option("shards", s"$a, $b").load()
      .selectExpr("unix_micros(ts) AS ts_us", "value", "seq", "shard")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // each micro-batch must carry one RDD partition per advanced shard
        assert(df.rdd.getNumPartitions <= 2)
        df.as[(Long, String, Long, String)].collect().foreach(got.add)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      GraftFeed.push(b, T0 + 3000000L, "b1") // only shard b advances
      q.processAllAvailable()

      import scala.jdk.CollectionConverters._
      val rows = got.asScala.toVector.sortBy(r => (r._4, r._3))
      assert(rows.map(r => (r._2, r._4)) ==
        Vector(("a0", a), ("a1", a), ("b0", b), ("b1", b)))
      assert(rows.collect { case (_, _, seq, s) if s == b => seq } == Vector(0L, 1L))
      // the checkpointed offset is a per-shard count vector
      import java.nio.file.{Files, Paths}
      val offDir = Paths.get(s"$ckpt/offsets")
      val newest = Files.list(offDir).iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.forall(_.isDigit)).maxBy(_.getFileName.toString.toInt)
      val lastLine = Files.readAllLines(newest).asScala.last
      assert(lastLine == "[2,2]", s"offset line was $lastLine")
    } finally { q.stop(); GraftFeed.clear(a); GraftFeed.clear(b) }
  }

  test("sharded feed composes with Crossover: both backlogs drain before on_live_start") {
    import spark.implicits._
    val a = "xa-" + System.nanoTime()
    val b = "xb-" + System.nanoTime()
    GraftFeed.push(a, T0 + 1000000L, "a0")
    GraftFeed.push(b, T0 + 2000000L, "b0")
    GraftFeed.push(b, T0 + 3000000L, "b1")

    val got = java.util.Collections.synchronizedList(new java.util.ArrayList[(String, String)]())
    val phases = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-xshard-ckpt").toString
    def start(t: Trigger) =
      spark.readStream.format("graft-feed").option("shards", s"$a,$b").load()
        .selectExpr("value", "shard")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(String, String)].collect().foreach(got.add)
        }
        .option("checkpointLocation", ckpt)
        .trigger(t)
        .start()
    val live = Crossover.run(start, Crossover.Hooks(
        onLiveStart = () => { phases.add(s"live_start:${got.size()}"); () }),
      liveTrigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      GraftFeed.push(a, T0 + 4000000L, "a1") // live arrival on shard a only
      live.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val rows = got.asScala.toVector.sorted
      assert(rows == Vector(("a0", a), ("a1", a), ("b0", b), ("b1", b)))
      assert(phases.asScala.toVector == Vector("live_start:3")) // ALL shards drained at handover
    } finally { live.stop(); GraftFeed.clear(a); GraftFeed.clear(b) }
  }
}
