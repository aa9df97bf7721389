package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, StreamingQueryProgress, Trigger}

/** Past→live crossover — the reference's signature move ("traveling
  * through time", README.md:105-135, examples/crossing.py; W4 in SURVEY):
  * replay a historical backlog at maximum speed, fire `on_live_start` at
  * the boundary, then continue processing live — one logical stream.
  *
  * Spark-first realization over any REPLAYABLE source (file directory,
  * Kafka with earliest offsets, …):
  *   1. `on_start` hook (reference processor.py:185-186);
  *   2. the SAME query runs with `Trigger.AvailableNow` — Spark's native
  *      "drain the backlog at max speed then stop", which IS the virtual-
  *      time fast-forward (no waits between historical micro-batches);
  *   3. at termination the checkpoint holds the exact backlog boundary
  *      offsets — `on_live_start` fires here (processor.py:190-191);
  *   4. the query restarts from the SAME checkpoint with a live trigger
  *      and continues from the boundary: no event lost, none reprocessed
  *      (exactly-once via checkpoint offsets + idempotent/transactional
  *      sink).
  *
  * The caller supplies a factory that starts the query for a given
  * trigger; it MUST use one fixed checkpoint location — that checkpoint
  * is the handover token. Stateful operators (e.g. [[AspStream]]
  * machines) carry their state store across the boundary, so keyed state
  * built during replay is live immediately — the reference's seamless
  * handover, with durability the reference doesn't have.
  */
object Crossover {

  final case class Hooks(onStart: () => Unit = () => (),
                         onLiveStart: () => Unit = () => ())

  /** Drain the backlog, fire hooks, hand over to live processing.
    * Returns the live query (caller manages its lifecycle). */
  def run(start: Trigger => StreamingQuery,
          hooks: Hooks = Hooks(),
          liveTrigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    hooks.onStart()
    val backfill = start(Trigger.AvailableNow())
    backfill.awaitTermination() // fast-forward: replay ends when backlog drained
    hooks.onLiveStart()
    start(liveTrigger)
  }

  /** Continuous handover — the reference's exact shape (`on_live_start`
    * fires BETWEEN the past and live phases of ONE run,
    * processor.py:185-194; flagship demo examples/crossing.py): a single
    * `StreamingQuery` starts over the backlog and never stops; a
    * `StreamingQueryListener` watches each progress report and fires
    * `onLiveStart` the first time every source's consumed offset has
    * caught its latest available offset — the backlog-drained boundary —
    * with no stop/start seam and no second query.
    *
    * Trade against [[run]]: the restart-based form gets
    * `Trigger.AvailableNow`'s purpose-built backfill (and survives a
    * driver crash mid-handover, since the checkpoint IS the boundary);
    * this form is seamless but replays the backlog at `liveTrigger`
    * cadence — pass `ProcessingTime(0)` to run backfill batches
    * back-to-back. Both are exactly-once; keep [[run]] as the durable
    * fallback.
    *
    * The hook fires on the listener bus thread, after the catching-up
    * micro-batch has fully committed (so everything the hook can observe
    * through the sink is exactly the drained backlog). */
  def runContinuous(start: Trigger => StreamingQuery,
                    hooks: Hooks = Hooks(),
                    liveTrigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    hooks.onStart()
    val q = start(liveTrigger)
    val lock = new Object
    var fired = false

    // a source that reports NO latestOffset is treated as NOT caught up
    // (counting it would fire onLiveStart after the first micro-batch
    // with the whole backlog unread); sources used with runContinuous
    // must report latestOffset in progress — GraftFeed does
    def caughtUp(p: StreamingQueryProgress): Boolean =
      p.id == q.id && p.sources.nonEmpty && p.sources.forall(s =>
        s.latestOffset != null && s.endOffset == s.latestOffset)

    lazy val listener: StreamingQueryListener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        maybeFire(e.progress)
      // the query can stop/fail before ever catching up; without this the
      // listener (and the hooks closure it captures) would stay registered
      // on the session-wide manager for the life of the session
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == q.id) q.sparkSession.streams.removeListener(listener)
    }
    def maybeFire(p: StreamingQueryProgress): Unit = lock.synchronized {
      if (!fired && caughtUp(p)) {
        fired = true
        hooks.onLiveStart()
        q.sparkSession.streams.removeListener(listener)
      }
    }
    q.sparkSession.streams.addListener(listener)
    // a fast backlog may have caught up before the listener was attached:
    // replay the progress history through the same idempotent check
    q.recentProgress.foreach(maybeFire)
    q
  }
}
