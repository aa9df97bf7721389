package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.Tables

/** Salted aggregation must equal plain aggregation (same values, any
  * skew); bucketed tables must join without an Exchange. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedAgg == plain groupBy aggregation") {
    import spark.implicits._
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val plain = ev.groupBy($"user_id")
      .agg(sum($"value".cast("decimal(18,2)")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2))).sortBy(_._1)
    val salted = Skew.saltedAgg(ev, Seq("user_id"), 16, Map(
        "total" -> (sum($"value".cast("decimal(18,2)")), (s: org.apache.spark.sql.Column) => sum(s)),
        "n" -> (count(lit(1)), (s: org.apache.spark.sql.Column) => sum(s))))
      .collect().map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2))).sortBy(_._1)
    assert(salted.map(t => (t._1, t._2.stripTrailingZeros, t._3)).toSeq
      == plain.map(t => (t._1, t._2.stripTrailingZeros, t._3)).toSeq)
  }

  test("co-bucketed tables join with no Exchange in the plan") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Skew.writeBucketed(o, "b_orders", "o_orderkey", 8, s"$wh/b_orders")
    Skew.writeBucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8, s"$wh/b_lineitem")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // the fixture is broadcast-small; force the shuffle-join path the
      // bucketing is designed to eliminate at fact-fact scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() == li.count()) // every lineitem matches its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
