package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (Spark sessions are expensive;
  * scalatest runs suites in one JVM under `Test / fork`). RocksDB state
  * store provider is required by transformWithState. */
object TestSpark {

  /** Every failed task attempt in the whole test JVM. With maxFailures 2
    * a flaky task could otherwise retry to green SILENTLY — any spec
    * whose workload is supposed to be deterministic can assert this
    * counter did not move across its run (ReplayRetrySpec asserts the
    * exact delta of its injected failure), and every failure is also
    * logged loudly so an unexpected retry is visible in the suite
    * output even without an assertion. */
  val taskFailures = new AtomicInteger(0)

  lazy val spark: SparkSession = {
    val s = graft.core.Tables.configure(
        // local[4, 2]: 4 threads, maxFailures 2 — lets ReplayRetrySpec
        // prove task-retry determinism (deterministic specs never need
        // the second attempt otherwise; the taskFailures listener keeps
        // an accidental retry from hiding)
        SparkSession.builder().master("local[4, 2]").appName("graft-test"), "4")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.reason != org.apache.spark.Success) {
          taskFailures.incrementAndGet()
          System.err.println(
            s"[test-spark] TASK FAILURE (will retry once): ${e.reason}")
        }
    })
    s
  }
}
