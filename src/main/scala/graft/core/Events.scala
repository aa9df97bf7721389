package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's single data abstraction is a timestamped event stream —
  * `Iterable[(datetime, value)]` replayed under a virtual clock
  * (reference: src/async_stream_processing/processor.py:169-194). Here a
  * stream is any DataFrame with a `TimestampType` column (default `ts`);
  * batch execution IS the fast-forward replay (processor.py:71-74): Spark
  * evaluates the whole history at maximum speed with event-time semantics,
  * and Structured Streaming over the same plan is the live phase.
  *
  * Determinism of simultaneous events (processor.py:61-62,96-97 — stable
  * FIFO order for equal due times) is reproduced by the explicit secondary
  * sort key `(ts, streamId, seq)` that every operator here threads through.
  * Spark's sort is not stable across equal keys, so the tie-break must be
  * in the key — schema discipline, not an engine change (SURVEY §4).
  *
  * Scale note: none of these operators collect to the driver; ordering is
  * expressed as window specs / sort keys that Spark executes as distributed
  * range-partitioned sorts, and per-key patterns partition by the key so a
  * 1000-executor cluster shards naturally.
  */
object Events {

  /** Global replay sequence: the order in which the reference's scheduler
    * would deliver the events (processor.py:64-100 — due-time order, FIFO
    * tie-break on event_id as insertion order).
    *
    * Scale note: a total order is inherently global, but it does NOT need
    * a single-task sort — this delegates to [[graft.operators.Prefix.seq]]
    * (range-partitioned two-phase prefix), so the sequence of a 100 TB
    * stream is computed by every executor in parallel. Prefer [[keyedSeq]]
    * when a per-key order is all the workload actually needs.
    */
  def replaySeq(events: DataFrame, ts: String = "ts", tieBreak: String = "event_id"): DataFrame =
    graft.operators.Prefix.seq(events, "seq", ts, tieBreak)

  /** Per-key delivery sequence — the scalable form: partitions by key, so
    * the sort is a distributed shuffle+sort, not a single task. */
  def keyedSeq(events: DataFrame, key: String, ts: String = "ts", tieBreak: String = "event_id"): DataFrame =
    // long, matching replaySeq/Prefix.seq: the two interchangeable forms
    // must produce one schema (row_number alone is int — and int caps a
    // key at 2^31 rows, wrong for the scale the global form targets)
    events.withColumn("seq", row_number()
      .over(Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak)))
      .cast("long"))

  /** `call_later(delay, f)` in batch replay (processor.py:41-62): a
    * scheduled callback is just a synthetic event at `ts + delay` whose
    * event_time is the DUE time (verified in SURVEY §2.1 P3). Union the
    * derived rows back into the stream; downstream time-ordered operators
    * then see them interleaved exactly as the reference scheduler would.
    */
  def callLater(events: DataFrame, delay: Column, kind: String,
                ts: String = "ts", kindCol: String = "kind"): DataFrame = {
    val base = events.withColumn(kindCol, lit("event"))
    val derived = events
      .withColumn(ts, col(ts) + delay)
      .withColumn(kindCol, lit(kind))
    base.unionByName(derived)
  }

  /** `timer(step, cb, start, end)` in batch replay (processor.py:140-150):
    * first tick at `start + step`, then every `step`, while tick <= end —
    * exactly 10 ticks over 10 s at 1 s step (tests/test_past.py:104-119).
    * Generated with `sequence` + `explode`: a single generator row per
    * (start,end) pair, so a timer over years of history is one array expand,
    * distributed if seeded from a distributed frame.
    */
  def timerTicks(spark: org.apache.spark.sql.SparkSession,
                 start: Column, end: Column, step: Column): DataFrame =
    spark.range(1).select(
      // guarded: Spark's sequence THROWS on start > stop with a positive
      // step, but a window shorter than one step must yield zero ticks
      // (the reference's `while tick <= end` loop simply never enters);
      // `when` without otherwise gives NULL and explode drops NULL rows
      explode(when(start + step <= end, sequence(start + step, end, step)))
        .as("tick_ts"))

  /** Positional zip-merge — faithful to the reference's
    * `merge_timeseries` (examples/common.py:18-22): takes the k-th element
    * of every stream together, stamps the FIRST stream's timestamp, and
    * truncates to the shortest stream (verified empirically, SURVEY P11).
    * Implemented as a distributed-sequence equi-join: each stream is
    * numbered by the two-phase [[graft.operators.Prefix.seq]] (no
    * single-task sort), then joined on the synthetic row index.
    */
  def zipMerge(streams: Seq[(String, DataFrame)], ts: String = "ts",
               tieBreak: String = "event_id"): DataFrame = {
    val indexed = streams.map { case (name, df) =>
      graft.operators.Prefix.seq(
          df.select(col(ts), col(tieBreak), col("value")), "k", ts, tieBreak)
        .select(col("k"), col(ts).as(s"${name}_ts"), col("value").as(name))
    }
    val joined = indexed.reduce((a, b) => a.join(b, "k"))
    val firstName = streams.head._1
    joined.withColumnRenamed(s"${firstName}_ts", ts)
      .drop(streams.tail.map(s => s"${s._1}_ts"): _*)
  }

  /** Time-ordered merge — the INTENDED semantics of merge_timeseries per
    * its call sites ("merging the time series as this is how ASP handles
    * simultaneous events", examples/csp/01_basics/e2_ticking.py:34): a
    * plain union, with each source's payload in its own nullable column,
    * ordered by (ts, tieBreak). No shuffle beyond the final sort; at scale
    * this is the cheap one — prefer it.
    */
  def timeMerge(streams: Seq[(String, DataFrame)], ts: String = "ts",
                tieBreak: String = "event_id"): DataFrame = {
    val names = streams.map(_._1)
    // each absent column is null of THAT stream's own value type (struct/
    // decimal/… merge without silently collapsing to double)
    val types = streams.map { case (n, df) => n -> df.schema("value").dataType }.toMap
    val widened = streams.map { case (name, df) =>
      val others = names.filterNot(_ == name)
      others.foldLeft(df.select(col(ts), col(tieBreak), col("value").as(name))) {
        (acc, o) => acc.withColumn(o, lit(null).cast(types(o)))
      }.select(col(ts) +: col(tieBreak) +: names.map(col): _*)
    }
    widened.reduce(_ unionByName _)
  }

  /** Last-value combine (W5/W6 — e3_show_graph.py:11-29, e2_ticking.py):
    * after a time-ordered merge, carry each source's latest value forward
    * with `last(ignoreNulls)` over an unbounded-preceding running frame.
    * Partition by `key` columns when the combine is per-instrument — that
    * is what makes it scale (each key's timeline is independent). The
    * un-keyed (global-timeline) form delegates to
    * [[graft.operators.Prefix.lastCarry]], the two-phase distributed
    * carry-forward, instead of a single-task global window.
    */
  def lastValueCombine(merged: DataFrame, valueCols: Seq[String],
                       partitionBy: Seq[String] = Nil,
                       ts: String = "ts", tieBreak: String = "event_id"): DataFrame =
    if (partitionBy.isEmpty)
      graft.operators.Prefix.lastCarry(merged, valueCols, ts, tieBreak)
    else {
      val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(ts), col(tieBreak))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      valueCols.foldLeft(merged) { (acc, c) =>
        acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    }
}
