package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.AspSemantics.{RunningCents, SpliceIn, SpliceOut}
import graft.streaming.{KeyedStateMachine, Replay, ReplayCtx}

/** Hot-key replay measurement (SCALING.md "Hot-key replay"): quantifies
  * the skew cliff of [[Replay.run]]'s one-task-per-key model and the
  * bound [[Replay.runSpliced]] restores, on fixtures derived from the
  * driver's events table (replicated with shifted ids to make the
  * per-task cost measurable, then re-keyed):
  *
  *  - `uniform`: replica-shifted user_ids — keys ~ REP × fixture keys,
  *    largest key holds ~1/keys of the events;
  *  - `hot`: same rows, but 90% of them re-keyed to user_id 0 — the one
  *    key whose machine serializes into a single task.
  *
  * Both paths run the same running-(cents, count) aggregation; outputs
  * of run vs runSpliced on the SAME fixture are count-checked before a
  * wall time is trusted. One JSON line per (path, fixture) with min-of-2
  * wall seconds.
  */
object HotKeyProbe {
  private final class SeqCents
      extends KeyedStateMachine[Long, SpliceIn, SpliceOut] {
    private var cents = 0L
    private var n = 0L
    def onEvent(ts: Long, e: SpliceIn, ctx: ReplayCtx[SpliceOut]): Unit = {
      cents += e.cents; n += 1
      ctx.emit(SpliceOut(e.user_id, e.ts_us, e.event_id, cents, n))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(20)
    val slices = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = graft.core.Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
        ($"value" * 100).cast("long").as("cents"))
    val reps = (0 until rep).map { i =>
      base.select(($"user_id" + lit(1000000L * i)).as("user_id"), $"ts_us",
        ($"event_id" + lit(10000000L * i)).as("event_id"), $"cents")
    }.reduce(_ unionAll _)
    val uniform = reps.as[SpliceIn].localCheckpoint()
    val hot = reps.select(
        when($"event_id" % 10 =!= 0, 0L).otherwise($"user_id").as("user_id"),
        $"ts_us", $"event_id", $"cents")
      .as[SpliceIn].localCheckpoint()
    val n = uniform.count()

    def time(body: => Long): (Double, Long) = {
      def one(): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = body
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (a, r1) = one(); val (b, r2) = one()
      require(r1 == r2); (math.min(a, b), r1)
    }
    def runSeq(ds: Dataset[SpliceIn]): Long =
      Replay.run(ds, "user_id", "ts_us", "event_id")(_.user_id, _.ts_us)(
        _ => new SeqCents).count()
    def runSpl(ds: Dataset[SpliceIn]): Long =
      Replay.runSpliced(ds, slices)(_.user_id, _.ts_us, _.event_id)(
        RunningCents).count()

    val out = Seq(
      ("run", "uniform", time(runSeq(uniform))),
      ("run", "hot90", time(runSeq(hot))),
      ("runSpliced", "uniform", time(runSpl(uniform))),
      ("runSpliced", "hot90", time(runSpl(hot)))
    )
    require(out.forall(_._3._2 == n), s"row-count mismatch: $out vs $n")
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", v)
    out.foreach { case (path, fix, (secs, rows)) =>
      println(s"""{"path":"$path","fixture":"$fix","events":$rows,""" +
        s""""secs":${fmt(secs)},"events_per_sec":${(rows / secs).round},""" +
        s""""rep":$rep,"slices":$slices}""")
    }
    spark.stop()
  }
}
