package graft.streaming

import org.apache.spark.TaskContext
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Task-RETRY determinism of the distributed replay: on a 1000-executor
  * cluster task failures are routine (preemption, OOM-kill, node loss),
  * and Spark's recovery model is re-running the whole task from its
  * shuffle input. [[Replay.run]] is safe under that model precisely
  * because each per-key machine lives entirely inside one task and its
  * input arrives deterministically ordered (key, ts, tieBreak) — a
  * retried task replays its machines from scratch over identical input,
  * so the recomputed output is bit-identical and the failed attempt's
  * partial output is discarded by Spark, never observed twice.
  *
  * The spec injects a REAL mid-replay failure (a machine throws after
  * 50 events on attempt 0 of one partition; the shared session permits
  * one retry — `local[4, 2]`, or maxFailures=2 under the local-cluster
  * test master), asserts the failure actually fired, the job still
  * succeeded, and the output equals the no-failure baseline exactly.
  * Injection evidence must cross PROCESS boundaries (under
  * SPARK_GRAFT_TEST_MASTER=local-cluster the machine runs in an
  * executor JVM where a driver-side static would silently stay 0 — the
  * bug class this gate exists for, caught in its own harness): the
  * machine drops a same-host marker FILE, and the driver's TaskEnd
  * listener independently counts the failed attempt. This is the
  * exactly-once-equivalence argument for the batch path; the streaming
  * path's equivalent (checkpoint restart) is covered by
  * StreamingParitySpec.
  */
class ReplayRetrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import ReplayRetrySpec._

  private def events: Seq[RetryEvent] =
    (0 until 20000).map { i =>
      RetryEvent(i % 64, (i.toLong * 7919) % 1000000, i.toLong, (i % 13).toLong)
    }

  test("a mid-replay task failure retries to a bit-identical output (exactly-once equivalence)") {
    import spark.implicits._
    val ds = spark.createDataset(events)
    def run(marker: Option[String]): Seq[RetryOut] =
      Replay.run(ds, "user_id", "ts_us", "seq")(_.user_id, _.ts_us)(machine(marker))
        .collect().toSeq.sortBy(o => (o.user_id, o.ts_us, o.running))

    val failuresBefore = graft.TestSpark.taskFailures.get
    val baseline = run(marker = None)
    assert(graft.TestSpark.taskFailures.get == failuresBefore,
      "the baseline run must not need a retry")
    assert(baseline.size == events.size) // one emit per event

    val marker = java.nio.file.Files.createTempDirectory("graft-retry")
      .resolve("injected").toString
    val withFailure = run(Some(marker)) // collect succeeding IS the retry working
    assert(new java.io.File(marker).exists(),
      "the injected failure must actually have fired (marker file)")
    // the listener bus is async: give the TaskEnd event a moment to land
    var spins = 0
    while (graft.TestSpark.taskFailures.get < failuresBefore + 1 && spins < 100) {
      Thread.sleep(50); spins += 1
    }
    assert(graft.TestSpark.taskFailures.get == failuresBefore + 1,
      "exactly the one injected attempt may fail")
    assert(withFailure == baseline,
      "retried replay must be bit-identical to the unfailed run")
  }
}

object ReplayRetrySpec {
  final case class RetryEvent(user_id: Long, ts_us: Long, seq: Long, v: Long)
  final case class RetryOut(user_id: Long, ts_us: Long, running: Long)

  // factory lives on the companion so the Spark closure captures no
  // scalatest state (the suite instance is not serializable)
  def machine(marker: Option[String])(uid: Long): KeyedStateMachine[Long, RetryEvent, RetryOut] =
    new KeyedStateMachine[Long, RetryEvent, RetryOut] {
      private var sum = 0L
      private var seen = 0
      def onEvent(ts: Long, e: RetryEvent, ctx: ReplayCtx[RetryOut]): Unit = {
        seen += 1
        if (marker.isDefined && TaskContext.get().attemptNumber() == 0 &&
            TaskContext.getPartitionId() == 0 && seen == 50) {
          // same-host marker file: injection evidence that crosses the
          // executor/driver process boundary (the attempt-0 +
          // partition-0 guard bounds it to at most one firing)
          java.nio.file.Files.write(java.nio.file.Paths.get(marker.get),
            "injected".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          throw new RuntimeException("injected task failure (attempt 0)")
        }
        sum += e.v
        ctx.emit(RetryOut(uid, ts, sum))
      }
    }
}
