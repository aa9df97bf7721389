package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The injected `graft_timestamps(start, step, n)` table function
  * (reference testing.py:6-10 via [[TimestampsTvf]]): SQL-only access,
  * generator semantics (first element IS start), distributed Range plan,
  * and analysis-time errors for bad arity / non-constant n. */
class TimestampsTvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("generates start, start+step, ... from pure SQL") {
    val got = spark.sql(
      "SELECT ts_us FROM graft_timestamps(1000, 250, 5) ORDER BY ts_us")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1000L, 1250L, 1500L, 1750L, 2000L))
  }

  test("start/step may be expressions; n sizes a distributed Range scan") {
    val df = spark.sql(
      "SELECT ts_us FROM graft_timestamps(500 * 2, 100 + 150, 3)")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1000L, 1250L, 1500L))
    // the physical plan is Spark's splittable Range, not a driver-side
    // local relation — a billion-tick grid scales across executors
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("Range"), s"expected Range scan:\n$phys")
  }

  test("wrong arity and non-foldable n fail at analysis, not at runtime") {
    val e1 = intercept[Exception](spark.sql("SELECT * FROM graft_timestamps(1, 2)"))
    assert(e1.getMessage.contains("3 arguments"))
    // Range's own analysis contract: NON_FOLDABLE_ARGUMENT, not a
    // runtime NPE out of plan construction
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT * FROM graft_timestamps(0, 1, rand())").collect())
    assert(e2.getMessage.contains("NON_FOLDABLE_ARGUMENT"), e2.getMessage)
  }
}
