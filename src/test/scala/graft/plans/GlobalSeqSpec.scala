package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The extension path end-to-end: a user-written global row_number()
  * window plans as DistributedSeqExec (no single-task WindowExec), and
  * the numbers are exactly the stock semantics. */
class GlobalSeqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    val sp = spark
    import sp.implicits._
    // keys deliberately interleaved across partitions
    sp.createDataset((1 to 5000).map(i => ((i * 2654435761L) % 100003, i.toLong)))
      .toDF("k", "payload")
      .repartition(16)
  }

  test("global row_number window plans as DistributedSeqExec, correct values") {
    val sp = spark
    import sp.implicits._
    val df = fixture.withColumn("rn",
      row_number().over(Window.orderBy($"k", $"payload")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DistributedSeq"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"stock WindowExec still present:\n$plan")

    val got = df.orderBy($"rn").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val want = fixture.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._1, t._2)).zipWithIndex
      .map { case ((k, p), i) => (k, p, i + 1) }
    assert(got.toSeq == want.toSeq)
  }

  test("partitioned and non-row_number windows are NOT rewritten") {
    val sp = spark
    import sp.implicits._
    val partitioned = fixture.withColumn("rn",
      row_number().over(Window.partitionBy($"k" % 7).orderBy($"payload")))
    assert(!partitioned.queryExecution.executedPlan.toString.contains("DistributedSeq"))
    val ranked = fixture.withColumn("rk",
      rank().over(Window.orderBy($"k", $"payload")))
    assert(!ranked.queryExecution.executedPlan.toString.contains("DistributedSeq"))
  }

  test("downstream operators compose (filter + projection over the seq)") {
    val sp = spark
    import sp.implicits._
    val out = fixture.withColumn("rn",
        row_number().over(Window.orderBy($"k", $"payload")))
      .filter($"rn" <= 10)
      .select($"rn", $"k")
      .orderBy($"rn")
      .collect()
    assert(out.length == 10 && out.map(_.getInt(0)).toSeq == (1 to 10))
  }
}
