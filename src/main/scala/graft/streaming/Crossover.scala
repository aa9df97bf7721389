package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
}
