package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Runtime skew handling — the OTHER half of the skew story next to
  * `Skew.saltedAgg`/`saltedJoin` (which restructure the plan up front):
  * AQE detects an oversized post-shuffle partition at runtime and splits
  * it across tasks (`SortMergeJoin(skew=true)`), no salting required.
  * Salting remains for the shapes AQE can't fix (skewed AGGREGATION
  * keys, and replicating a build side for a salted join). This spec pins
  * that a hot join key actually triggers the split under our session
  * config, so the capability doesn't silently regress. */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a hot join key triggers an AQE skew-split sort-merge join") {
    val sp = spark
    import sp.implicits._
    val c = sp.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 99% of rows share key 0; payload pads partition size past the
      // skew threshold. The small side is uniform.
      val big = sp.range(0, 60000)
        .select(when($"id" % 100 === 0, $"id" % 7 + 1).otherwise(0L).as("k"),
          concat(lit("x"), lpad($"id".cast("string"), 100, "0")).as("pad"))
      val small = sp.range(0, 8).select($"id".as("k"), ($"id" * 10).as("v"))

      val joined = big.join(small, "k")
      // collect() drives joined.queryExecution itself — count() would
      // execute a DIFFERENT QueryExecution and leave this one un-run
      val n = joined.collect().length
      assert(n == 60000, s"unexpected join cardinality $n")

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not skew-split the hot partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }
}
