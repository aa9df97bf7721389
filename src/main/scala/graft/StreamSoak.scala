package graft

import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import graft.streaming.{AspStream, Machines, Replay}

/** SUSTAINED-RATE soak of the live path — [[StreamBench]] measures a
  * backlog DRAIN (AvailableNow over a pre-pushed fixture); this pins a
  * producer at a rate and watches the engine keep up, fall behind, and
  * recover, for dozens of micro-batches — the admission-control story
  * under sustained load (VERDICT r6 #3: four drain batches cannot
  * support a latency claim).
  *
  * One run = three pinned-rate phases against a ProcessingTime trigger:
  *  1. `below`  — producer below capacity: steady state, lag ≈ one
  *     admission window;
  *  2. `burst`  — producer above capacity: admission caps each batch at
  *     `maxPerTrigger`, backlog (and cross-batch lag) builds — bounded
  *     batches are the POINT (an outage-sized batch is what admission
  *     control exists to prevent);
  *  3. `recover`— producer back below capacity: the backlog drains at
  *     (capacity − rate); the artifact reports the measured
  *     recovery time back to a one-window lag.
  * After the phases the producer stops, the query drains to lag 0, and
  * the WHOLE soak output is fingerprint-compared against batch replay
  * of the exact produced prefix — the soak is parity-gated, not just
  * throughput-measured.
  *
  * The run repeats per `maxPerTrigger` value (default 25k and 100k) so
  * the knob's effect — per-trigger latency vs recovery speed — is
  * measured under load, not asserted. Per-batch rows, trigger latency,
  * lag (produced − consumed at progress time), state rows and RocksDB
  * SST bytes come from a StreamingQueryListener (recentProgress's ring
  * buffer would drop early batches of a 100-batch soak).
  *
  *   SPARK_GRAFT_STREAM_OUT=STREAM_r07.json sbt "runMain graft.StreamSoak"
  *   knobs: SPARK_GRAFT_SOAK_LOW / _HIGH (ev/s), _PHASE_SEC, _TRIGGERS
  */
object StreamSoak {
  private val Shards = 8
  private val Keys = 20003L // prime: uniform key spread
  private val BaseUs = 1704067200000000L

  /** Deterministic event i — the producer pushes the prefix 0..P-1 and
    * batch replay regenerates the SAME prefix for the parity gate.
    * Integral doubles: the value string round-trips exactly. */
  private[graft] def tickOf(i: Long): Machines.MarketTick =
    Machines.MarketTick(
      user_id = (i * 2654435761L) % Keys,
      ts_us = BaseUs + i * 250L,
      seq = i,
      kind = if (i % 5 == 0) "trade" else "quote",
      value = (i % 1000).toDouble)

  final case class PhaseStat(name: String, targetRate: Long, produced: Long,
                             wallSec: Double, batches: Int, avgBatchMs: Long,
                             maxBatchMs: Long, endLag: Long, maxLag: Long)

  private final case class Obs(atMs: Long, rows: Long, trigMs: Long,
                               lag: Long, stateRows: Long, sstBytes: Long)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val low = sys.env.getOrElse("SPARK_GRAFT_SOAK_LOW", "10000").toLong
    val high = sys.env.getOrElse("SPARK_GRAFT_SOAK_HIGH", "60000").toLong
    val phaseSec = sys.env.getOrElse("SPARK_GRAFT_SOAK_PHASE_SEC", "25").toInt
    val triggers = sys.env.getOrElse("SPARK_GRAFT_SOAK_TRIGGERS", "25000,100000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = graft.core.Tables.sessionBuilder(cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the state-partition sizing rule from StreamBench: each partition
    // is a RocksDB instance with a fixed per-batch commit cost
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"))

    val runs = triggers.map(mpt => runSoak(spark, mpt, low, high, phaseSec))
    val body = s"""{"workload":"W7 as-of book: GraftFeed(8 shards) -> transformWithState/RocksDB",""" +
      s""""trigger":"ProcessingTime 500ms","low_rate":$low,"high_rate":$high,""" +
      s""""phase_sec":$phaseSec,"keys":$Keys,""" +
      s""""runs":[${runs.mkString(",")}]}"""
    sys.env.get("SPARK_GRAFT_STREAM_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
    println(body)
  }

  private def runSoak(spark: SparkSession, maxPerTrigger: Long, low: Long,
                      high: Long, phaseSec: Int): String = {
    import spark.implicits._
    val feeds = (0 until Shards).map(i => s"soak-$i")
    feeds.foreach(graft.sources.GraftFeed.clear)

    val produced = new AtomicLong(0L)
    // consumed/output are per-BATCH-ID maps, not counters: the
    // driver-restart phase re-executes the WAL-planned uncommitted batch
    // after the kill, and an idempotent sink (upsert by batchId — what a
    // partitioned-overwrite parquet sink is in production) is precisely
    // what turns at-least-once batch delivery into exactly-once results.
    // A counter would double-count the replayed batch and the parity
    // gate could never hold across a restart.
    val consumedByBatch = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    def consumedTotal(): Long = {
      var s = 0L
      val it = consumedByBatch.values().iterator()
      while (it.hasNext) s += it.next()
      s
    }
    // batchId -> (rows, hash, output-event ts list for latency)
    val outByBatch =
      new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long, Seq[Long])]()
    // batchId -> sink-commit wall time (last write wins = replay wins)
    val commitMsByBatch = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val obs = mutable.ArrayBuffer.empty[Obs]
    val obsListener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0) {
          consumedByBatch.put(p.batchId, p.numInputRows)
          var stateRows = 0L
          var sstBytes = 0L
          p.stateOperators.foreach { o =>
            stateRows += o.numRowsTotal
            val it = o.customMetrics.entrySet().iterator()
            while (it.hasNext) {
              val kv = it.next()
              if (kv.getKey.toLowerCase.contains("sstfilessize") ||
                  kv.getKey.toLowerCase.contains("sstfilesize"))
                sstBytes += kv.getValue.longValue()
            }
          }
          obs.synchronized {
            obs += Obs(System.currentTimeMillis(), p.numInputRows,
              p.durationMs.getOrDefault("triggerExecution", 0L),
              math.max(0L, produced.get() - consumedTotal()), stateRows, sstBytes)
          }
        }
      }
    }
    spark.streams.addListener(obsListener)

    val ckpt = java.nio.file.Files.createTempDirectory("graft-soak").toString
    def startQuery(): org.apache.spark.sql.streaming.StreamingQuery = {
      val src = spark.readStream.format("graft-feed")
        .option("shards", feeds.mkString(","))
        .option("maxPerTrigger", maxPerTrigger.toString)
        .option("retention", "2000000")
        .load()
        .withWatermark("ts", "1 hour")
      val parsed = src
        .select(split($"value", ",").as("f"), unix_micros($"ts").as("ts_us"))
        .select($"f"(0).cast("long").as("user_id"), $"ts_us",
          $"f"(1).cast("long").as("seq"), $"f"(2).as("kind"),
          $"f"(3).cast("double").as("value")).as[Machines.MarketTick]
      AspStream.run(parsed)(_.user_id, _.ts_us, _.seq)(
          uid => new Machines.AsOfMachine(uid))
        .writeStream
        .foreachBatch { (ds: Dataset[Machines.AsOfRow], batchId: Long) =>
          // ONE action per batch: the StreamBench fingerprint aggregate
          // widened with collect_list(ts_us) — each output event's ts
          // inverts to its seq (ts = BaseUs + seq*250), which keys the
          // producer's ingest timestamp for end-to-end latency
          val df = ds.toDF()
          val cols = df.columns.map(org.apache.spark.sql.functions.col).toSeq
          val r = df.agg(count(lit(1)),
            coalesce(sum(pmod(xxhash64(cols: _*), lit(1000000007L))), lit(0L)),
            collect_list(col("ts_us"))).head
          outByBatch.put(batchId, (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
          commitMsByBatch.put(batchId, System.currentTimeMillis())
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("500 milliseconds"))
        .start()
    }
    var q = startQuery()

    // pinned-rate producer: pushes tickOf(0..) in chunks every 10 ms.
    // The leading "warmup" phase isolates first-run JIT/codegen cost in
    // its own row so the "below" row is the warm steady state. Each
    // chunk's first seq + ingest wall time feed the latency percentiles
    // (all events in a ~10 ms chunk share one ingest stamp).
    val phases = Seq(("warmup", low), ("below", low), ("burst", high),
      ("recover", low))
    val chunkMarks = mutable.ArrayBuffer.empty[(Long, Long)] // startSeq, ingestMs
    @volatile var currentPhase = "init"
    val marks = mutable.ArrayBuffer.empty[(String, Long, Long, Long)] // name, startMs, endMs, producedAtEnd
    val producer = new Thread(() => {
      var i = 0L
      phases.foreach { case (name, rate) =>
        currentPhase = name
        val startMs = System.currentTimeMillis()
        val endAt = System.nanoTime() + phaseSec * 1000000000L
        val chunk = math.max(1L, rate / 100)
        while (System.nanoTime() < endAt) {
          chunkMarks.synchronized { chunkMarks += ((i, System.currentTimeMillis())) }
          var c = 0L
          while (c < chunk) {
            val t = tickOf(i)
            graft.sources.GraftFeed.push(feeds((t.user_id % Shards).toInt),
              t.ts_us, s"${t.user_id},${t.seq},${t.kind},${t.value}")
            i += 1; c += 1
          }
          produced.set(i)
          Thread.sleep(10)
        }
        produced.set(i)
        marks.synchronized { marks += ((name, startMs, System.currentTimeMillis(), i)) }
      }
      currentPhase = "done"
    }, "graft-soak-producer")
    producer.start()

    // ---- driver-restart fault injection (VERDICT r7 #4) ----
    // Mid-burst — the adversarial moment: large lag, RocksDB state hot,
    // an admission-capped batch in flight — the query is stopped HARD
    // (in-flight batch aborted, not drained) and a NEW query resumes
    // from the same checkpoint against the same idempotent sink. The
    // parity gate at the end then proves no-loss/no-dup across the
    // whole produced prefix, kill included.
    while (currentPhase != "burst" && currentPhase != "done") Thread.sleep(50)
    Thread.sleep(phaseSec * 1000L / 2)
    val killAtProduced = produced.get()
    val tKill = System.currentTimeMillis()
    q.stop(); q.awaitTermination(30000L)
    val tDown = System.currentTimeMillis()
    q = startQuery()
    val tUp = System.currentTimeMillis()
    // resume time: first batch COMMITTED by the restarted query
    val resumeDeadline = System.currentTimeMillis() + 60000L
    while (commitMsByBatch.values().stream().noneMatch(t => t > tUp) &&
           System.currentTimeMillis() < resumeDeadline)
      Thread.sleep(50)
    val tFirstCommit = {
      var best = Long.MaxValue
      val it = commitMsByBatch.values().iterator()
      while (it.hasNext) { val v = it.next(); if (v > tUp && v < best) best = v }
      if (best == Long.MaxValue) -1L else best
    }

    producer.join()
    val producedTotal = produced.get()

    // drain: wait until the query has consumed everything, then stop
    val drainDeadline = System.currentTimeMillis() + 120000L
    while (consumedTotal() < producedTotal && System.currentTimeMillis() < drainDeadline)
      Thread.sleep(250)
    Thread.sleep(1500) // let the final foreachBatch commit
    q.stop(); q.awaitTermination(30000L)
    spark.streams.removeListener(obsListener)
    val drained = consumedTotal() == producedTotal

    // fold the idempotent sink: one (rows, hash) contribution per batchId
    var outN = 0L; var outH = 0L
    outByBatch.values().forEach { case (bn, bh, _) => outN += bn; outH += bh }

    // parity: batch replay of the exact produced prefix
    val batchDs = spark.range(0L, producedTotal).map(i => tickOf(i))
    val batchOut = Replay.run(batchDs, "user_id", "ts_us", "seq")(
      _.user_id, _.ts_us)(uid => new Machines.AsOfMachine(uid))
    val expected = StreamBench.fingerprint(batchOut.toDF())
    val parity = drained && (outN, outH) == expected
    if (!parity)
      System.err.println(s"[soak] parity FAILED (drained=$drained): " +
        s"stream ($outN, $outH) vs batch $expected")

    feeds.foreach(graft.sources.GraftFeed.clear)
    // unload cached RocksDB providers before deleting their files (the
    // StateScaleProbe teardown race — delete-under-live-RocksDB SIGSEGVs
    // in the JNI logger)
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    def rmr(f: java.io.File): Unit = {
      val k = f.listFiles(); if (k != null) k.foreach(rmr); f.delete(); ()
    }
    rmr(new java.io.File(ckpt))

    // carve observations into phases by wall time
    val snap = obs.synchronized(obs.toVector)
    def phaseStat(name: String): PhaseStat = {
      val (_, s0, s1, pAtEnd) = marks.find(_._1 == name).get
      val prev = marks.takeWhile(_._1 != name).lastOption.map(_._4).getOrElse(0L)
      val in = snap.filter(o => o.atMs >= s0 && o.atMs < s1)
      PhaseStat(name, phases.find(_._1 == name).get._2, pAtEnd - prev,
        (s1 - s0) / 1000.0, in.size,
        if (in.nonEmpty) in.map(_.trigMs).sum / in.size else 0L,
        if (in.nonEmpty) in.map(_.trigMs).max else 0L,
        in.lastOption.map(_.lag).getOrElse(0L),
        if (in.nonEmpty) in.map(_.lag).max else 0L)
    }
    val stats = phases.map(p => phaseStat(p._1))

    // ---- per-event end-to-end latency (VERDICT r7 #5) ----
    // latency(event) = sink-commit wall time of its batch − ingest wall
    // time of its producer chunk (events share a ~10 ms chunk stamp).
    // Computed over OUTPUT events (trades — the rows the sink actually
    // commits; quotes mutate state only), bucketed by the PHASE the
    // event was produced in, so "below" is the steady-state claim.
    val chunkSnap = chunkMarks.synchronized(chunkMarks.toVector) // sorted by seq
    val chunkSeqs = chunkSnap.map(_._1).toArray
    def ingestMsOf(seq: Long): Long = {
      var lo = 0; var hi = chunkSeqs.length - 1
      while (lo < hi) { // greatest startSeq <= seq
        val mid = (lo + hi + 1) >>> 1
        if (chunkSeqs(mid) <= seq) lo = mid else hi = mid - 1
      }
      chunkSnap(lo)._2
    }
    val phaseBounds = marks.map(m => (m._1, m._4)) // name, producedAtEnd
    def phaseOf(seq: Long): String = {
      var prev = 0L
      phaseBounds.foreach { case (name, end) =>
        if (seq >= prev && seq < end) return name
        prev = end
      }
      "tail"
    }
    val latByPhase = mutable.Map.empty[String, mutable.ArrayBuffer[Long]]
    outByBatch.forEach { (batchId, v) =>
      val commit = commitMsByBatch.getOrDefault(batchId, -1L)
      if (commit > 0) v._3.foreach { tsUs =>
        val seq = (tsUs - BaseUs) / 250L
        latByPhase.getOrElseUpdate(phaseOf(seq), mutable.ArrayBuffer.empty) +=
          math.max(0L, commit - ingestMsOf(seq))
      }
    }
    def pct(sorted: IndexedSeq[Long], p: Double): Long =
      if (sorted.isEmpty) -1L
      else sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))
    val latencyJson = phases.map(_._1).map { name =>
      val ls = latByPhase.getOrElse(name, mutable.ArrayBuffer.empty).sorted.toIndexedSeq
      s""""$name":{"events":${ls.size},"p50_ms":${pct(ls, 0.50)},""" +
        s""""p95_ms":${pct(ls, 0.95)},"p99_ms":${pct(ls, 0.99)}}"""
    }.mkString("{", ",", "}")

    // recovery: first observation after burst end with lag <= one
    // admission window
    val burstEnd = marks.find(_._1 == "burst").get._3
    val recoveredAt = snap.find(o => o.atMs >= burstEnd && o.lag <= maxPerTrigger)
      .map(_.atMs)
    val recoverySec = recoveredAt.map(t => (t - burstEnd) / 1000.0)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", v)
    val phaseJson = stats.map { s =>
      s"""{"phase":"${s.name}","target_rate":${s.targetRate},""" +
      s""""produced":${s.produced},"wall_sec":${fmt(s.wallSec)},""" +
      s""""effective_rate":${(s.produced / s.wallSec).round},""" +
      s""""batches":${s.batches},"avg_batch_ms":${s.avgBatchMs},""" +
      s""""max_batch_ms":${s.maxBatchMs},"end_lag":${s.endLag},""" +
      s""""max_lag":${s.maxLag}}"""
    }.mkString("[", ",", "]")
    val restartJson =
      s"""{"phase":"burst","at_produced":$killAtProduced,""" +
      s""""stop_ms":${tDown - tKill},"down_ms":${tUp - tKill},""" +
      s""""restart_to_first_commit_ms":${if (tFirstCommit > 0) tFirstCommit - tUp else -1}}"""
    val line =
      s"""{"max_per_trigger":$maxPerTrigger,"batches":${snap.size},""" +
      s""""events":$producedTotal,"parity":$parity,"phases":$phaseJson,""" +
      s""""driver_restart":$restartJson,""" +
      s""""event_latency_ms":$latencyJson,""" +
      s""""recovery_sec":${recoverySec.map(fmt).getOrElse("null")},""" +
      s""""state_rows_max":${if (snap.nonEmpty) snap.map(_.stateRows).max else 0},""" +
      s""""rocksdb_sst_bytes_max":${if (snap.nonEmpty) snap.map(_.sstBytes).max else 0}}"""
    System.err.println(s"[soak] $line")
    line
  }
}
