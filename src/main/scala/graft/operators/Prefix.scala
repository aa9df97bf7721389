package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix operators — the 100 TB form of a total-order
  * scan (the reference's single-threaded scheduler order,
  * processor.py:64-100, re-expressed without a single-task sort).
  *
  * A plain `Window.orderBy(ts)` with no partition key collapses the whole
  * dataset into ONE task (Spark warns `WindowExec: No Partition Defined`).
  * These operators compute the same totals in two distributed phases:
  *
  *  1. `repartitionByRange(ts, tie)` — a range shuffle; each partition
  *     holds a contiguous, disjoint slice of the global (ts, tie) order.
  *     A per-partition window (partitioned by `spark_partition_id()`)
  *     computes the LOCAL prefix in parallel.
  *  2. a per-partition summary (one row per partition — tiny regardless
  *     of data size) is prefix-combined and broadcast-joined back, turning
  *     local prefixes into global ones.
  *
  * Cost: one range shuffle + one hash shuffle of the same data + an
  * O(#partitions) side plan — vs. the single-task sort whose wall-clock
  * is unbounded in data size. Both phases scale linearly with executors.
  * The range boundaries come from Spark's deterministic reservoir sample,
  * and any boundary placement yields the same result (the combine step
  * only needs partition-contiguity, not balance).
  *
  * Measured alternative (rejected): assigning the slice id from an
  * `approx_percentile` boundary chain would drop the range shuffle
  * (one shuffle total), but the boundary aggregate is a second full scan
  * that Catalyst re-computes per consuming branch (no exchange to reuse),
  * and it benched 2-3x slower at sf0.1 than this form, whose range
  * exchange IS reused across the local-prefix and offsets branches.
  *
  * (ts, tie) must be a unique composite key (the engine's standard
  * delivery order — SURVEY §1.3); null ordering keys are not expected.
  */
object Prefix {

  private val PID = "__graft_pid"

  /** Range-partition by the global order key and tag each row with its
    * slice id. The tag is computed BEFORE any later hash shuffle, so it
    * identifies the range slice, not the physical window partition. */
  private def ranged(df: DataFrame, ts: String, tie: String): DataFrame =
    df.repartitionByRange(col(ts), col(tie)).withColumn(PID, spark_partition_id())

  private def localW(ts: String, tie: String) =
    Window.partitionBy(col(PID)).orderBy(col(ts), col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Exclusive prefix-combine over the tiny per-partition summary frame
    * (one row per shuffle partition): expressed as a broadcast theta-join
    * `b.pid < a.pid` + re-aggregate — O(#partitions²) pairs, which is
    * trivial at any data scale (32² here; 4M pairs even at 2000
    * partitions) and, unlike an un-partitioned window, never emits a
    * single-task WindowExec. `aggs` maps each summary column to the
    * combine expression over the matching rows of the b side. */
  private def prevCombine(summary: DataFrame,
                          aggs: Seq[(String, Column => Column)]): DataFrame = {
    val a = summary.select(col(PID))
    val b = aggs.foldLeft(summary.withColumnRenamed(PID, "__bpid")) {
      case (acc, (c, _)) => acc.withColumnRenamed(c, s"__b_$c")
    }
    a.join(broadcast(b), col("__bpid") < col(PID), "left")
      .groupBy(col(PID))
      .agg(aggs.head._2(col(s"__b_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (c, f) => f(col(s"__b_$c")).as(c) }: _*)
  }

  /** Global delivery sequence 1..n in (ts, tie) order — the scalable form
    * of `row_number() OVER (ORDER BY ts, tie)`. Output column is LongType. */
  def seq(df: DataFrame, seqCol: String = "seq",
          ts: String = "ts", tie: String = "event_id"): DataFrame = {
    val local = ranged(df, ts, tie)
      .withColumn("__lseq", row_number().over(localW(ts, tie)).cast("long"))
    val counts = local.groupBy(col(PID)).agg(count(lit(1)).as("__off"))
    val offsets = prevCombine(counts, Seq("__off" -> (c => coalesce(sum(c), lit(0L)))))
    local.join(broadcast(offsets), PID)
      .withColumn(seqCol, col("__off") + col("__lseq"))
      .drop(PID, "__lseq", "__off")
  }

  /** Global running (cumulative) aggregate of `value` in (ts, tie) order —
    * the scalable form of `sum(value) OVER (ORDER BY ts, tie ROWS
    * UNBOUNDED PRECEDING)`. `value` should be an exactly-summable type
    * (integer/decimal) so the two-phase combine is order-free. */
  def runningSum(df: DataFrame, value: Column, outCol: String,
                 ts: String = "ts", tie: String = "event_id"): DataFrame = {
    val local = ranged(df, ts, tie)
      .withColumn("__lsum", sum(value).over(localW(ts, tie)))
    val totals = local.groupBy(col(PID)).agg(sum(value).as("__off"))
    val offsets = prevCombine(totals, Seq("__off" -> (c => sum(c))))
    local.join(broadcast(offsets), PID)
      .withColumn(outCol, col("__lsum") + coalesce(col("__off"), lit(0)))
      .drop(PID, "__lsum", "__off")
  }

  /** Global last-non-null carry-forward of `cols` in (ts, tie) order — the
    * scalable form of `last(c, ignoreNulls=true) OVER (ORDER BY ts, tie
    * ROWS UNBOUNDED PRECEDING)` (the reference's last-value combine, W5).
    * Each partition carries locally; the carry-in for partition p is the
    * last non-null among partitions < p, combined over the tiny frame. */
  def lastCarry(df: DataFrame, cols: Seq[String],
                ts: String = "ts", tie: String = "event_id"): DataFrame = {
    val w = localW(ts, tie)
    val local = cols.foldLeft(ranged(df, ts, tie)) { (acc, c) =>
      acc.withColumn(s"__lc_$c", last(col(c), ignoreNulls = true).over(w))
    }
    // per-partition last non-null of each col = its locally-carried value
    // at the partition's max (ts, tie) row
    val perPart = local.groupBy(col(PID)).agg(
      max_by(col(s"__lc_${cols.head}"), struct(col(ts), col(tie))).as(s"__pl_${cols.head}"),
      cols.tail.map(c =>
        max_by(col(s"__lc_$c"), struct(col(ts), col(tie))).as(s"__pl_$c")): _*)
    // carry-in for partition p = each col's value at the max previous
    // partition that has one (max_by skips null ordering keys)
    val carryIn = prevCombine(perPart,
        cols.map(c => s"__pl_$c" -> ((v: Column) =>
          max_by(v, when(v.isNotNull, col("__bpid"))))))
      .select(col(PID) +: cols.map(c => col(s"__pl_$c").as(s"__ci_$c")): _*)
    val joined = local.join(broadcast(carryIn), PID)
    cols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, coalesce(col(s"__lc_$c"), col(s"__ci_$c")))
        .drop(s"__lc_$c", s"__ci_$c")
    }.drop(PID)
  }
}
