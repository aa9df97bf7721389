package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (Spark sessions are expensive;
  * scalatest runs suites in one JVM under `Test / fork`). RocksDB state
  * store provider is required by transformWithState. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.core.Tables.configure(
        SparkSession.builder().master("local[4]").appName("graft-test"), "4")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
