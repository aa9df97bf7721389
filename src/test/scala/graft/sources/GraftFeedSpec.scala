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
      // the checkpointed offset carries shard IDENTITY, not position
      import java.nio.file.{Files, Paths}
      val offDir = Paths.get(s"$ckpt/offsets")
      val newest = Files.list(offDir).iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.forall(_.isDigit)).maxBy(_.getFileName.toString.toInt)
      val lastLine = Files.readAllLines(newest).asScala.last
      assert(lastLine == s"""{"$a":2,"$b":2}""", s"offset line was $lastLine")
    } finally { q.stop(); GraftFeed.clear(a); GraftFeed.clear(b) }
  }

  test("offset restore: names are validated; legacy forms stay readable") {
    val s = new GraftFeedStream(Seq("x", "y"), sharded = true, retention = Long.MaxValue)
    // round-trip of the named form, independent of option order
    assert(s.deserializeOffset("""{"y":3,"x":2}""").asInstanceOf[GraftFeedOffset]
      .counts == Seq("x" -> 2L, "y" -> 3L))
    // renamed/resized shard set fails fast instead of misassigning counts
    val e1 = intercept[IllegalStateException](s.deserializeOffset("""{"x":2,"z":3}"""))
    assert(e1.getMessage.contains("do not match configured shards"))
    // legacy positional vector: readable at matching arity, rejected otherwise
    assert(s.deserializeOffset("[4,5]").asInstanceOf[GraftFeedOffset]
      .counts == Seq("x" -> 4L, "y" -> 5L))
    val e2 = intercept[IllegalStateException](s.deserializeOffset("[4,5,6]"))
    assert(e2.getMessage.contains("cannot be assigned by position"))
    // single-feed scalar form
    val s1 = new GraftFeedStream(Seq("f"), sharded = false, retention = Long.MaxValue)
    assert(s1.deserializeOffset("7").asInstanceOf[GraftFeedOffset].counts == Seq("f" -> 7L))
  }

  test("retention bounds the buffer: commits trim behind the offset") {
    import spark.implicits._
    val feed = "bounded-" + System.nanoTime()
    val total = 500
    val retention = 20
    (0 until 100).foreach(k => GraftFeed.push(feed, T0 + k * 1000L, s"m$k"))

    val got = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ret-ckpt").toString
    val q = spark.readStream.format("graft-feed")
      .option("feed", feed).option("retention", retention.toString).load()
      .selectExpr("seq")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.as[Long].collect().foreach(v => got.add(v))
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("20 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      (100 until total).foreach { k => // keep producing far past retention
        GraftFeed.push(feed, T0 + k * 1000L, s"m$k")
        if (k % 100 == 0) q.processAllAvailable()
      }
      q.processAllAvailable()
      // source.commit lags one micro-batch (it fires when the NEXT batch
      // is constructed): push a sentinel so the tail batch commits too
      GraftFeed.push(feed, T0 + total * 1000L, "sentinel")
      q.processAllAvailable()

      import scala.jdk.CollectionConverters._
      // no record lost or duplicated even as the tail is trimmed…
      assert(got.asScala.toVector.sorted == (0L to total.toLong).toVector)
      // …and the in-memory window stayed bounded: retention + the final
      // not-yet-committed batch (1 sentinel record here) — NOT the 501
      // records pushed
      assert(GraftFeed.retained(feed) <= retention + 1,
        s"retained ${GraftFeed.retained(feed)} > $retention + 1")
      // reading below the trim point is a loud error, not silence
      val e = intercept[IllegalStateException](GraftFeed.range(feed, 0L, 5L))
      assert(e.getMessage.contains("trimmed"))
    } finally { q.stop(); GraftFeed.clear(feed) }
  }

  test("maxPerTrigger: AvailableNow drains the backlog in bounded micro-batches") {
    import spark.implicits._
    val feed = "paced-" + System.nanoTime()
    (0 until 10).foreach(k => GraftFeed.push(feed, T0 + k * 1000L, s"m$k"))

    val batches = java.util.Collections.synchronizedList(new java.util.ArrayList[Int]())
    val got = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    val ckpt = java.nio.file.Files.createTempDirectory("graft-paced-ckpt").toString
    val q = spark.readStream.format("graft-feed")
      .option("feed", feed).option("maxPerTrigger", "3").load()
      .selectExpr("seq")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.as[Long].collect()
        batches.add(rows.length)
        rows.foreach(got.add)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(60000), "AvailableNow drain did not terminate")
      import scala.jdk.CollectionConverters._
      // every record exactly once, no batch over the cap, and the drain
      // really was incremental (ceil(10/3) = 4 non-empty batches) — not
      // the single-giant-batch fallback
      assert(got.asScala.toVector.sorted == (0L until 10L).toVector)
      assert(batches.asScala.forall(_ <= 3), s"batch sizes ${batches.asScala}")
      assert(batches.asScala.count(_ > 0) == 4, s"batch sizes ${batches.asScala}")
    } finally { GraftFeed.clear(feed) }
  }

  test("admission control spreads the cap across shards; reported head stays honest") {
    val a = "cap-a-" + System.nanoTime()
    val b = "cap-b-" + System.nanoTime()
    try {
      (0 until 5).foreach(k => GraftFeed.push(a, T0 + k, s"a$k"))
      (0 until 4).foreach(k => GraftFeed.push(b, T0 + k, s"b$k"))
      val s = new GraftFeedStream(Seq(a, b), sharded = true,
        retention = Long.MaxValue, maxPerTrigger = 4)
      def next(o: org.apache.spark.sql.connector.read.streaming.Offset) =
        s.latestOffset(o, s.getDefaultReadLimit).asInstanceOf[GraftFeedOffset]
      // proportional to lag (the Kafka split): lags (5,4), cap 4 →
      // floors (⌊20/9⌋,⌊16/9⌋) = (2,1), remainder 1 → first shard
      val o1 = next(s.initialOffset())
      assert(o1.counts == Seq(a -> 3L, b -> 1L))
      // lags now (2,3) → floors (⌊8/5⌋,⌊12/5⌋) = (1,2), remainder 1 → a
      val o2 = next(o1)
      assert(o2.counts == Seq(a -> 5L, b -> 3L))
      val o3 = next(o2)
      assert(o3.counts == Seq(a -> 5L, b -> 4L)) // drained within finitely many batches
      // the capped plan never hides the true backlog from progress metrics
      assert(s.reportLatestOffset().asInstanceOf[GraftFeedOffset].counts ==
        Seq(a -> 5L, b -> 4L))
    } finally { GraftFeed.clear(a); GraftFeed.clear(b) }
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

  test("external socket producer → bridge → streaming query, with crossover handover") {
    import spark.implicits._
    val feed = "sock-" + System.nanoTime()

    // the external process of the reference demo (websocket_server.py:5-9):
    // a line-oriented socket server emitting a backlog, then a live message
    val server = new java.net.ServerSocket(0)
    val goLive = new java.util.concurrent.Semaphore(0)
    val serverThread = new Thread(() => {
      val s = server.accept()
      val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
        s.getOutputStream, java.nio.charset.StandardCharsets.UTF_8), true)
      (0 until 3).foreach(k => out.println(s"tick $k"))
      goLive.acquire() // hold the live message until the handover completed
      out.println("tick 3")
      out.flush()
      s.close()
    }, "socket-producer")
    serverThread.setDaemon(true)
    serverThread.start()

    def await(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (!cond) {
        if (System.nanoTime() > deadline) fail(s"timed out waiting for $what")
        Thread.sleep(20)
      }
    }

    val t0Us = System.currentTimeMillis() * 1000L
    // the reference client (e1_websocket_client.py:10-18): connect, stamp
    // each message with its arrival time, feed the engine
    val bridge = SocketBridge.connect("127.0.0.1", server.getLocalPort, feed)
    try {
      await("socket backlog")(GraftFeed.size(feed) == 3L)

      val got = java.util.Collections.synchronizedList(new java.util.ArrayList[(Long, String)]())
      val phases = new java.util.concurrent.CopyOnWriteArrayList[String]()
      val ckpt = java.nio.file.Files.createTempDirectory("graft-sock-ckpt").toString
      def start(t: Trigger) =
        spark.readStream.format("graft-feed").option("feed", feed).load()
          .selectExpr("unix_micros(ts) AS ts_us", "value")
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.as[(Long, String)].collect().foreach(got.add)
          }
          .option("checkpointLocation", ckpt)
          .trigger(t)
          .start()

      val live = Crossover.run(start, Crossover.Hooks(
          onLiveStart = () => { phases.add(s"live_start:${got.size()}"); () }),
        liveTrigger = Trigger.ProcessingTime("50 milliseconds"))
      try {
        goLive.release() // external producer emits the live message
        await("live row")(GraftFeed.size(feed) == 4L)
        live.processAllAvailable()

        import scala.jdk.CollectionConverters._
        val rows = got.asScala.toVector.sortBy(_._1)
        assert(rows.map(_._2) == Vector("tick 0", "tick 1", "tick 2", "tick 3"))
        assert(rows.forall(_._1 >= t0Us), "arrival timestamps must be live")
        assert(phases.asScala.toVector == Vector("live_start:3"))
      } finally live.stop()
    } finally { bridge.close(); server.close(); GraftFeed.clear(feed) }
  }
}
