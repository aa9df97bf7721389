package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[Prefix]] (two-phase distributed global prefix) must equal the
  * single-task `Window.orderBy` forms row-for-row — same totals, computed
  * without collapsing to one partition. Random data spans many range
  * partitions (ids 0..n over multiple shuffle partitions); null runs in
  * the carry columns exercise cross-partition carry-in. */
object PrefixSpec {
  final case class Row3(ts: Long, event_id: Long, v: Long, a: java.lang.Double, b: java.lang.Double)
}

class PrefixSpec extends AnyFunSuite {
  import PrefixSpec.Row3
  private lazy val spark = TestSpark.spark

  private def data(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    List.tabulate(n) { i =>
      Row3(rnd.nextInt(200).toLong, i.toLong, (rnd.nextInt(21) - 10).toLong,
        if (rnd.nextInt(4) == 0) null else java.lang.Double.valueOf(rnd.nextInt(100).toDouble),
        if (rnd.nextInt(4) == 0) null else java.lang.Double.valueOf(rnd.nextInt(100).toDouble))
    }
  }

  private val wGlobal = Window.orderBy(col("ts"), col("event_id"))
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  test("Prefix.seq == global row_number, with many range partitions") {
    import spark.implicits._
    val df = spark.createDataset(data(1, 500)).toDF().repartition(8)
    val want = df.withColumn("seq", row_number().over(wGlobal).cast("long"))
      .select("event_id", "seq").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Prefix.seq(df).select("event_id", "seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("Prefix.runningSum == global running sum window") {
    import spark.implicits._
    val df = spark.createDataset(data(2, 500)).toDF().repartition(8)
    val want = df.withColumn("rt", sum(col("v")).over(wGlobal))
      .select("event_id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Prefix.runningSum(df, col("v"), "rt").select("event_id", "rt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("Prefix.seq scale smoke: 2M rows, distributed, exact total order") {
    val df = spark.range(2000000L).select(
      col("id").as("event_id"),
      (col("id") * 7 % 1000003L).as("ts")) // duplicate ts values; (ts, id) unique
    val seqd = Prefix.seq(df, "seq", "ts", "event_id")
    val agg = seqd.agg(count(lit(1)), min(col("seq")), max(col("seq")),
      countDistinct(col("seq"))).collect()(0)
    // a bijection onto 1..n — no gaps, no dups, computed with no
    // single-task stage over the 2M rows
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3)) ==
      (2000000L, 1L, 2000000L, 2000000L))
    // order correctness: the rows numbered 1..1000 are exactly the 1000
    // smallest (ts, event_id) pairs, in that order
    val head = seqd.filter(col("seq") <= 1000)
      .select("seq", "ts", "event_id").collect()
      .sortBy(_.getLong(0)).map(r => (r.getLong(1), r.getLong(2))).toSeq
    val want = df.orderBy(col("ts"), col("event_id")).limit(1000)
      .select("ts", "event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(head == want)
  }

  test("Prefix.seq plan: one full-data exchange, no single-partition window") {
    import spark.implicits._
    val df = spark.createDataset(data(4, 500)).toDF()
    val plan = Prefix.seq(df).queryExecution.executedPlan.toString
    // the main branch shuffles the data exactly once (hash on the slice
    // id); the summary branch aggregates map-side, so its exchange moves
    // only #slices rows; no range exchange (boundaries are a literal,
    // computed once — slicing is shared by construction, not by
    // exchange-reuse luck) and no WindowExec without partitioning
    assert(!plan.contains("rangepartitioning"),
      s"unexpected range exchange (per-branch sampling is back):\n$plan")
    val dataExchanges = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning"))
      .filter(l => l.contains("__graft_pid")).toSeq
    assert(dataExchanges.nonEmpty, s"expected a hash exchange on the slice id:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"single-partition stage over the data:\n$plan")
  }

  test("Prefix.runningSum null semantics == global window (leading-null slices)") {
    import spark.implicits._
    // value null for the first ~40% of the global order: whole leading
    // slices hold no values, so their carry-in is "no earlier value" —
    // rows there must be NULL (not 0), and the first non-null slice must
    // pick up a null-free carry-in; values are decimal to cover the
    // decimal combine
    val df = spark.range(1000L).select(
        col("id").as("ts"), col("id").as("event_id"),
        when(col("id") < 400, lit(null))
          .otherwise(col("id") % 7).cast("decimal(10,2)").as("v"))
      .repartition(8)
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDecimal(1))
    val want = df.withColumn("rt", sum(col("v")).over(wGlobal))
      .select("event_id", "rt").collect().map(key).toMap
    val got = Prefix.runningSum(df, col("v"), "rt", ts = "ts")
      .select("event_id", "rt").collect().map(key).toMap
    assert(got == want)
    assert(want(0L) == null) // the leading run really is null, not 0
  }

  test("Prefix rejects non-orderable slice-key types instead of mis-slicing") {
    import spark.implicits._
    val df = Seq(("9", 1L, 1L), ("10", 2L, 1L)).toDF("ts", "event_id", "v")
    val e = intercept[IllegalArgumentException](Prefix.seq(df, ts = "ts"))
    assert(e.getMessage.contains("timestamp, date, or numeric"))
  }

  test("Prefix.runningSum decimal carry-in overflow fails loudly, not as 0") {
    import spark.implicits._
    // sum type of decimal(38,0) is capped at decimal(38,0) — per-slice
    // local sums (~31 rows × 9e36) fit, but the cross-slice carry-in
    // crosses 1e38 partway through; the plan-side cast would null it and
    // the old coalesce would have substituted 0 silently
    val df = spark.range(1000L).select(
      col("id").as("ts"), col("id").as("event_id"),
      lit(new java.math.BigDecimal("9" + "0" * 36)).cast("decimal(38,0)").as("v"))
    val e = intercept[ArithmeticException](
      Prefix.runningSum(df, col("v"), "rt", ts = "ts").collect())
    assert(e.getMessage.contains("overflows"))
  }

  test("Prefix.lastCarry == global last(ignoreNulls) carry-forward, multi-column") {
    import spark.implicits._
    val df = spark.createDataset(data(3, 500)).toDF().repartition(8)
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getDouble(1))),
                       (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val want = Seq("a", "b").foldLeft(df) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(wGlobal))
    }.select("event_id", "a", "b").collect().map(key).toMap
    val got = Prefix.lastCarry(df, Seq("a", "b")).select("event_id", "a", "b")
      .collect().map(key).toMap
    assert(got == want)
  }
}
