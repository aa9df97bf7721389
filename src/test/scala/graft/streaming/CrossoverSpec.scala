package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.TestSpark

/** W4: backlog drains at maximum speed (AvailableNow), `on_live_start`
  * fires exactly at the boundary, live rows continue from the recorded
  * offsets with nothing lost or duplicated. */
class CrossoverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("past→live handover over a replayable file source") {
    val sp = spark
    import sp.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString

    // past backlog: two files
    Seq((1L, "past-a"), (2L, "past-b")).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(src)
    Seq((3L, "past-c")).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(src)

    val got = java.util.Collections.synchronizedList(new java.util.ArrayList[(Long, String)]())
    val phases = new java.util.concurrent.CopyOnWriteArrayList[String]()

    val schema = StructType(Seq(StructField("id", LongType), StructField("tag", StringType)))
    def start(t: Trigger) =
      sp.readStream.schema(schema).parquet(src)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(Long, String)].collect().foreach(got.add)
        }
        .option("checkpointLocation", ckpt)
        .trigger(t)
        .start()

    val live = Crossover.run(start, Crossover.Hooks(
      onStart = () => phases.add("on_start"),
      onLiveStart = () => { phases.add(s"on_live_start:${got.size()}"); () }))
    try {
      // live phase: new file arrives after handover
      Seq((4L, "live-d")).toDF("id", "tag").coalesce(1).write.mode("append").parquet(src)
      live.processAllAvailable()

      import scala.jdk.CollectionConverters._
      val rows = got.asScala.toVector.sortBy(_._1)
      assert(rows == Vector((1L, "past-a"), (2L, "past-b"), (3L, "past-c"), (4L, "live-d")))
      // hooks fired in order; the boundary saw the FULL backlog, nothing live
      assert(phases.asScala.toVector == Vector("on_start", "on_live_start:3"))
    } finally live.stop()
  }

  test("continuous handover: on_live_start fires inside ONE query, no restart") {
    val sp = spark
    import sp.implicits._
    import graft.sources.GraftFeed
    val feed = "cont-" + System.nanoTime()
    val T0 = java.time.Instant.parse("2020-01-01T00:00:00Z").toEpochMilli * 1000L
    (0 until 3).foreach(k => GraftFeed.push(feed, T0 + k * 1000000L, s"past-$k"))

    val got = java.util.Collections.synchronizedList(new java.util.ArrayList[(String, Long)]())
    val phases = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val liveStarted = new java.util.concurrent.CountDownLatch(1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cont-ckpt").toString

    def start(t: Trigger) =
      sp.readStream.format("graft-feed").option("feed", feed).load()
        .selectExpr("value", "seq")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(String, Long)].collect().foreach(got.add)
        }
        .option("checkpointLocation", ckpt)
        .trigger(t)
        .start()

    // ONE StreamingQuery: backlog and live phases share it; the hook
    // fires when consumed offsets catch the latest available — no
    // stop/start seam (reference processor.py:185-194 in-run handover)
    val q = Crossover.runContinuous(start, Crossover.Hooks(
        onStart = () => phases.add("on_start"),
        onLiveStart = () => {
          phases.add(s"on_live_start:${got.size()}"); liveStarted.countDown()
        }),
      liveTrigger = Trigger.ProcessingTime("50 milliseconds"))
    try {
      assert(liveStarted.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "on_live_start never fired")
      GraftFeed.push(feed, T0 + 9000000L, "live-3") // strictly after handover
      q.processAllAvailable()

      import scala.jdk.CollectionConverters._
      val rows = got.asScala.toVector.sortBy(_._2)
      assert(rows.map(_._1) == Vector("past-0", "past-1", "past-2", "live-3"))
      // the hook saw exactly the drained backlog, and fired exactly once
      assert(phases.asScala.toVector == Vector("on_start", "on_live_start:3"))
      assert(q.isActive) // the same query object is still the live query
    } finally { q.stop(); GraftFeed.clear(feed) }
  }
}
