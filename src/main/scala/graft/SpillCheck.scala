package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Memory-pressure / SPILL gate (VERDICT r7 #2): every other gate runs
  * executors that never spill — 4 GiB heaps over ≤11 MB tables — so the
  * 100 TB posture claimed sort/shuffle/join/window spill paths that had
  * never executed. This main runs the heaviest queries, the replay
  * path, and a RocksDB streaming drain on the 10× ScaleUp fixture TWICE
  * in one JVM:
  *
  *  1. **reference pass** — a plain roomy session (`local[cpus]`,
  *     default thresholds): per-query order-insensitive fingerprints
  *     (the [[StreamBench.fingerprint]] aggregate — count + summed row
  *     hashes — so executor count and row order can't alias a diff);
  *  2. **constrained pass** — small separate executor JVMs
  *     (`local-cluster[2,4,1408]`, 1 GiB executors) WITH force-spill
  *     thresholds driven to a few hundred-k elements
  *     (`spark.shuffle.spill.numElementsForceSpillThreshold` for every
  *     UnsafeExternalSorter: sorts, aggregates, shuffle writes; the
  *     SQLConf buffer thresholds for window / sort-merge-join /
  *     session-window / cartesian buffers). Per-task
  *     memory/diskBytesSpilled are summed per query via a listener.
  *
  * The gate asserts BOTH halves: hashes unchanged (spilling changed
  * where bytes live, never results) AND total disk bytes spilled > 0
  * (the spill paths actually ran — a zero here means the gate measured
  * nothing and FAILS). RocksDB's native memory is bounded separately
  * (`boundedMemoryUsage` + 64 MiB cap) for the streaming point, whose
  * parity is fingerprint-checked against batch replay in-session.
  *
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   SPARK_GRAFT_SPILL_OUT=SPILL_r08.json \
  *     sbt "runMain graft.SpillCheck /tmp/sfx10"
  */
object SpillCheck {

  /** Heaviest queries by the committed bench lines + the two SQL-TVF
    * gates (index builds ride the query). Env-overridable. */
  private val DefaultQueries = Seq(
    "q115_pagerank", "q134_ivfpq_trained", "q127_triangles",
    "q91_sketch_error", "q149_sql_dedup_probe", "q105_cross_corpus_dedup",
    "q139_star_banding", "q144_semdedup_survivors", "q61_neardup_banded",
    // token-scale (pos, hash) materialization + window-hash shuffles —
    // the substring-dedup family is the heaviest per-token memory user
    "q157_substring_spans", "q159_substring_survivors",
    // r9 additions: the SQL rewrite pass (corpus join + splice through
    // the TVF surface) and the classifier's score/intercept diamond
    "q168_sql_dup_cuts", "q163_quality_classifier",
    "q1_pricing_summary")

  private final class SpillListener extends SparkListener {
    val mem = new AtomicLong(0L)
    val disk = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        mem.addAndGet(m.memoryBytesSpilled)
        disk.addAndGet(m.diskBytesSpilled)
      }
    }
    def reset(): (Long, Long) = (mem.getAndSet(0L), disk.getAndSet(0L))
  }

  private def fingerprint(df: DataFrame): (Long, Long) = StreamBench.fingerprint(df)

  private def replayFingerprint(spark: SparkSession, sfDir: String): (Long, Long) = {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) as ts_us", "event_id", "value")
      .as[BenchReplayEvent]
    fingerprint(
      graft.streaming.Replay.run(ev, "user_id", "ts_us", "event_id")(
          _.user_id, _.ts_us) { _ =>
          new graft.streaming.KeyedStateMachine[Long, BenchReplayEvent, Long] {
            private var seen = 0L
            def onEvent(ts: Long, e: BenchReplayEvent,
                        ctx: graft.streaming.ReplayCtx[Long]): Unit = {
              seen += 1; ctx.emit(seen)
            }
          }
        }.toDF())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfx10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val names = sys.env.get("SPARK_GRAFT_SPILL_QUERIES")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(DefaultQueries)
    val forceThreshold =
      sys.env.getOrElse("SPARK_GRAFT_SPILL_FORCE_ELEMENTS", "131072")

    // ---- pass 1: reference fingerprints, roomy local session ----
    val ref = {
      val spark = graft.core.Tables.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val fps = names.map { n =>
        val fp = fingerprint(SparkEntry.queries(n)(spark, sfDir))
        System.err.println(s"[spill] reference $n -> $fp")
        n -> fp
      }.toMap
      val rfp = replayFingerprint(spark, sfDir)
      spark.stop()
      (fps, rfp)
    }

    // ---- pass 2: constrained executors + forced spill thresholds ----
    val master = sys.env.getOrElse("SPARK_GRAFT_SPILL_MASTER", "local-cluster[2,4,1408]")
    val spark = graft.core.Tables.configure(
        SparkSession.builder().master(master)
          .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
          .config("spark.executor.memory",
            sys.env.getOrElse("SPARK_GRAFT_SPILL_EXECUTOR_MEM", "1g"))
          // every UnsafeExternalSorter (sort, agg fallback, shuffle
          // write) force-spills past this many rows — deterministic
          // spill exercise independent of heap luck
          .config("spark.shuffle.spill.numElementsForceSpillThreshold", forceThreshold),
        cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // operator-buffer spill thresholds (SQLConf, session-settable)
    Seq("spark.sql.windowExec.buffer.spill.threshold",
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold",
        "spark.sql.sessionWindow.buffer.spill.threshold",
        "spark.sql.cartesianProductExec.buffer.spill.threshold")
      .foreach(k => spark.conf.set(k, forceThreshold))
    val listener = new SpillListener
    spark.sparkContext.addSparkListener(listener)

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", v)
    var failures = List.empty[String]
    val rows = names.map { n =>
      listener.reset()
      val t0 = System.nanoTime()
      val (fp, err) =
        try (fingerprint(SparkEntry.queries(n)(spark, sfDir)), "")
        catch { case e: Throwable => ((-1L, -1L), String.valueOf(e.getMessage).take(120)) }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are posted async; let the bus drain before reading
      Thread.sleep(300)
      val (m, d) = listener.reset()
      val ok = fp == ref._1(n)
      if (!ok) failures ::= s"$n: $fp vs ${ref._1(n)} $err"
      System.err.println(s"[spill] $n ok=$ok mem=$m disk=$d sec=${fmt(sec)}")
      s"""{"query":"$n","hash_ok":$ok,"memory_bytes_spilled":$m,""" +
        s""""disk_bytes_spilled":$d,"sec":${fmt(sec)}}"""
    }

    // replay path under the same pressure
    listener.reset()
    val tR = System.nanoTime()
    val (replayFp, replayErr) =
      try (replayFingerprint(spark, sfDir), "")
      catch { case e: Throwable => ((-1L, -1L), String.valueOf(e.getMessage).take(120)) }
    val replaySec = (System.nanoTime() - tR) / 1e9
    Thread.sleep(300)
    val (rm, rd) = listener.reset()
    val replayOk = replayFp == ref._2
    if (!replayOk) failures ::= s"replay: $replayFp vs ${ref._2} $replayErr"
    System.err.println(s"[spill] replay ok=$replayOk mem=$rm disk=$rd sec=${fmt(replaySec)}")

    // streaming point: RocksDB under a bounded native-memory cap, with
    // batch-replay parity in-session (the ClusterCheck workload shape)
    val streamOk = try {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val feeds = (0 until 8).map(i => s"spill-stream-$i")
      feeds.foreach(graft.sources.GraftFeed.clear)
      val total = 400000L
      var i = 0L
      while (i < total) {
        val t = StreamSoak.tickOf(i)
        graft.sources.GraftFeed.push(feeds((t.user_id % 8).toInt), t.ts_us,
          s"${t.user_id},${t.seq},${t.kind},${t.value}")
        i += 1
      }
      val touched = Seq(
        "spark.sql.streaming.stateStore.providerClass",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage",
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB",
        "spark.sql.shuffle.partitions")
      val saved = touched.map(k => k -> spark.conf.getOption(k))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "64")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val outN = new AtomicLong(0L); val outH = new AtomicLong(0L)
        val src = spark.readStream.format("graft-feed")
          .option("shards", feeds.mkString(","))
          .option("maxPerTrigger", "50000")
          .load()
          .withWatermark("ts", "1 hour")
        val parsed = src
          .select(split(col("value"), ",").as("f"), unix_micros(col("ts")).as("ts_us"))
          .select(col("f")(0).cast("long").as("user_id"), col("ts_us"),
            col("f")(1).cast("long").as("seq"), col("f")(2).as("kind"),
            col("f")(3).cast("double").as("value"))
          .as[streaming.Machines.MarketTick]
        val out = streaming.AspStream.run(parsed)(_.user_id, _.ts_us, _.seq)(
          uid => new streaming.Machines.AsOfMachine(uid))
        val ckpt = java.nio.file.Files.createTempDirectory("graft-spill-stream").toString
        val q = out.writeStream
          .foreachBatch {
            (ds: org.apache.spark.sql.Dataset[streaming.Machines.AsOfRow], _: Long) =>
              val (bn, bh) = StreamBench.fingerprint(ds.toDF())
              outN.addAndGet(bn); outH.addAndGet(bh); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        require(q.awaitTermination(300000L), "spill-stream drain timed out")
        val expected = StreamBench.fingerprint(
          streaming.Replay.run(
              spark.range(0L, total).map(i => StreamSoak.tickOf(i)),
              "user_id", "ts_us", "seq")(_.user_id, _.ts_us)(
              uid => new streaming.Machines.AsOfMachine(uid))
            .toDF())
        val p = (outN.get(), outH.get()) == expected
        feeds.foreach(graft.sources.GraftFeed.clear)
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        def rmr(f: java.io.File): Unit = {
          val k = f.listFiles(); if (k != null) k.foreach(rmr); f.delete(); ()
        }
        rmr(new java.io.File(ckpt))
        if (!p) failures ::= s"stream: (${outN.get()},${outH.get()}) vs $expected"
        p
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    } catch { case e: Throwable =>
      failures ::= s"stream: ${String.valueOf(e.getMessage).take(160)}"; false }

    val totalDisk = rows.map(_.split("\"disk_bytes_spilled\":")(1).split(",")(0).toLong).sum + rd
    val spilled = totalDisk > 0
    if (!spilled) failures ::= "no disk bytes spilled anywhere — the gate measured nothing"
    val ok = failures.isEmpty
    val line =
      s"""{"sf":"$sfDir","master":"$master","executor_mem":"${
        sys.env.getOrElse("SPARK_GRAFT_SPILL_EXECUTOR_MEM", "1g")}",""" +
      s""""force_spill_elements":$forceThreshold,"queries":[${rows.mkString(",")}],""" +
      s""""replay":{"hash_ok":$replayOk,"memory_bytes_spilled":$rm,""" +
      s""""disk_bytes_spilled":$rd,"sec":${fmt(replaySec)}},""" +
      s""""stream_bounded_rocksdb_64mb_parity":$streamOk,""" +
      s""""total_disk_bytes_spilled":$totalDisk,"ok":$ok}"""
    sys.env.get("SPARK_GRAFT_SPILL_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
    println(line)
    if (!ok) {
      failures.foreach(f => System.err.println(s"[spill] FAIL $f"))
      sys.exit(1)
    }
  }
}
