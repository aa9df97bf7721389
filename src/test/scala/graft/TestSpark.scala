package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (Spark sessions are expensive;
  * scalatest runs suites in one JVM under `Test / fork`). RocksDB state
  * store provider is required by transformWithState. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.core.Tables.configure(
        // local[4, 2]: 4 threads, maxFailures 2 — lets ReplayRetrySpec
        // prove task-retry determinism (deterministic specs never need
        // the second attempt otherwise)
        SparkSession.builder().master("local[4, 2]").appName("graft-test"), "4")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
