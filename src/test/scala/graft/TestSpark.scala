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
    // SPARK_GRAFT_TEST_MASTER=local-cluster[2,4,3072] runs the WHOLE
    // spec suite across separate executor JVMs (the cluster standing
    // gate's spec half; needs SPARK_HOME + SPARK_SCALA_VERSION in the
    // env). Default stays local[4, 2]: 4 threads, maxFailures 2 — lets
    // ReplayRetrySpec prove task-retry determinism (deterministic specs
    // never need the second attempt otherwise; the taskFailures
    // listener keeps an accidental retry from hiding). Under
    // local-cluster, maxFailures is pinned to 2 by conf for the same
    // semantics, and executors get this JVM's full classpath.
    val master = sys.env.getOrElse("SPARK_GRAFT_TEST_MASTER", "local[4, 2]")
    val b0 = SparkSession.builder().master(master).appName("graft-test")
    val b =
      if (master.startsWith("local-cluster"))
        b0.config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
          .config("spark.executor.memory", "2g")
          .config("spark.task.maxFailures", "2")
      else b0
    val s = graft.core.Tables.configure(b, "4")
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
