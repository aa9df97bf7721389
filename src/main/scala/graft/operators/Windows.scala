package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Event-time windowing operators mirroring the reference's workload
  * patterns: running (cumulative) aggregation (W6, examples/csp/01_basics/
  * e2_ticking.py:10-27), sliding VWAP (W10, examples/csp/02_intermediate/
  * e2_stats.py:35-65), first-seen dedup (W1, examples/common.py:25-34).
  *
  * All are declarative window/groupBy plans: Catalyst handles partial
  * aggregation, AQE handles skewed windows, and the same `window()`
  * grouping runs under Structured Streaming with a watermark for the live
  * phase (SURVEY §1.4).
  */
object Windows {

  /** Running frame partitioned by `keys`: unbounded-preceding → current.
    * Per-key cumulative state is the reference's dominant pattern; the
    * partition key is what shards it across executors.
    */
  def runningFrame(keys: Seq[String], ts: String, tieBreak: String): WindowSpec =
    (if (keys.isEmpty) Window.orderBy(col(ts), col(tieBreak))
     else Window.partitionBy(keys.map(col): _*).orderBy(col(ts), col(tieBreak)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Cumulative aggregate column (W6: `accum += x + y` per tick). The
    * un-keyed (global-timeline) form routes through the two-phase
    * distributed [[Prefix.runningSum]] instead of a single-task window. */
  def runningSum(df: DataFrame, valueCol: Column, as: String,
                 keys: Seq[String] = Nil, ts: String = "ts",
                 tieBreak: String = "event_id"): DataFrame =
    if (keys.isEmpty) Prefix.runningSum(df, valueCol, as, ts, tieBreak)
    else df.withColumn(as, sum(valueCol).over(runningFrame(keys, ts, tieBreak)))

  /** Hopping/tumbling event-time window aggregate (W10 VWAP). `exprs` are
    * agg columns over each (window, keys...) group. Uses the built-in
    * `window()` generator: width==slide is tumbling (1 group per row),
    * width=k·slide assigns each row to k groups — Spark expands this
    * map-side and partial-aggregates before the shuffle, so the shuffle
    * volume is per-(window,key) groups, not per event. Streaming: same
    * expression after `withWatermark`.
    */
  def hoppingAgg(df: DataFrame, width: String, slide: String,
                 keys: Seq[Column], exprs: Seq[Column],
                 ts: String = "ts"): DataFrame =
    df.groupBy(window(col(ts), width, slide) +: keys: _*)
      .agg(exprs.head, exprs.tail: _*)

  /** VWAP over a sliding window: Σ(value·weight)/Σ(weight) — the
    * reference's MovingAverage (e2_stats.py:35-54) without the hand-rolled
    * row buffer; the window grouping replaces eviction.
    */
  def vwap(df: DataFrame, width: String, slide: String,
           value: Column, weight: Column, keys: Seq[Column] = Nil,
           ts: String = "ts"): DataFrame =
    hoppingAgg(df, width, slide, keys,
      Seq((sum(value * weight) / sum(weight)).as("vwap"),
          sum(weight).as("total_weight"),
          count(lit(1)).as("n_events")), ts)

  /** First-seen detection (W1 Greeter): keeps the first event per key in
    * event-time order; `row_number()=1` rather than `dropDuplicates` so the
    * WHICH-row-survives semantics is deterministic (ts, tieBreak), matching
    * the reference's ordered delivery. One shuffle on the key.
    */
  def firstSeen(df: DataFrame, keys: Seq[String], ts: String = "ts",
                tieBreak: String = "event_id"): DataFrame =
    df.withColumn("_rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(col(ts), col(tieBreak))))
      .filter(col("_rn") === 1).drop("_rn")

  /** Top-k rows per group by `order` — ranking window + filter; Spark
    * plans this as a partial top-k (WindowGroupLimit) before the shuffle
    * in recent versions, so it scales as k·groups, not input size.
    */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame =
    df.withColumn("rnk", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col("rnk") <= k)
}
