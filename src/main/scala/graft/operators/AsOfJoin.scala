package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — the reference's core multi-stream pattern:
  * combine each left event with the most recent right-stream value at or
  * before it (last-value combine, reference examples/csp/01_basics/
  * e3_show_graph.py:11-29 and e4_trade_pnl.py:51-63, SURVEY W5/W7).
  *
  * Spark SQL has no ASOF JOIN, so this is a library operator built by
  * composition (SURVEY §7.3 — no Catalyst surgery needed):
  *
  *   union(left tagged 1, right tagged 0)
  *     → window partitionBy(keys) orderBy(ts, tag)
  *     → last(right cols, ignoreNulls) over unbounded-preceding frame
  *     → keep tag=1 rows
  *
  * Why this shape at 100 TB: it is ONE shuffle on the join keys followed by
  * a per-key sort — linear in input, no pair blow-up. The naive
  * alternative (non-equi range join) is O(n·m) per key under nested-loop
  * and explodes on hot keys. With the union trick, skew in either stream
  * is handled by AQE like any other sort, and the same plan runs in
  * Structured Streaming as a `transformWithState` merge (graft.streaming).
  *
  * Right rows sort BEFORE left rows at equal timestamps (tag 0 < 1), so a
  * quote at exactly the trade's timestamp is visible to the trade — same
  * FIFO tie-break the reference scheduler applies (processor.py:61-62).
  */
object AsOfJoin {

  /** @param left       probe stream (e.g. trades); all its columns survive
    * @param right      reference stream (e.g. quotes)
    * @param keys       equi-join key columns present in both sides
    * @param leftTs     event-time column on the left
    * @param rightTs    event-time column on the right
    * @param rightVals  right columns carried to each left row (as-of value)
    *
    * Callers needing full determinism when the RIGHT side can carry
    * duplicate timestamps per key should pre-deduplicate it (e.g.
    * `max_by` per (key, ts)) — engines (and this operator) otherwise pick
    * an arbitrary row among equal-timestamp matches.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // rightVals travel as ONE struct, not per-column: per-column
    // last(ignoreNulls) would skip a null FIELD of the latest right row
    // and stitch values from DIFFERENT rows into one output row (a row
    // no real right row ever was). The struct is non-null whenever a
    // right row exists — null fields included — so the as-of match is
    // always the latest right ROW, the same semantics as a SQL ASOF
    // JOIN. Null reference timestamps are filtered, never a timeline
    // entry (the asOfBroadcast invariant, enforced in all three forms).
    val rowType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c)))
    val l = left.withColumn("_asof_ts", col(leftTs)).withColumn("_asof_tag", lit(1))
      .withColumn("_asof_row", lit(null).cast(rowType))
    val r0 = right
      .filter(col(rightTs).isNotNull)
      .select(keys.map(col)
        :+ struct(rightVals.map(col): _*).as("_asof_row")
        :+ col(rightTs).as("_asof_ts"): _*)
      .withColumn("_asof_tag", lit(0))
    val r = leftCols.filterNot(keys.contains)
      .foldLeft(r0)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Output columns keep the LEFT schema's positions (a rightVal that
    // shadows a left column is substituted in place, not moved to the
    // end) — positional consumers (select-by-index, unionByName=false)
    // see the same layout as `left`; rightVals new to the left schema
    // append after it.
    val outCols = leftCols.map { c =>
        if (rightVals.contains(c)) col("_asof_row").getField(c).as(c) else col(c)
      } ++ rightVals.filterNot(leftCols.contains)
        .map(c => col("_asof_row").getField(c).as(c))
    l.unionByName(r)
      .withColumn("_asof_row", last(col("_asof_row"), ignoreNulls = true).over(w))
      .filter(col("_asof_tag") === 1)
      .select(outCols: _*)
  }

  /** Zero-shuffle as-of join for a SMALL reference side: each key's
    * reference timeline is packed into sorted parallel arrays
    * (`sort_array(collect_list(struct(ts, v)))`), the packed table is
    * BROADCAST, and every probe row resolves its as-of value with one
    * codegen'd binary search ([[graft.functions.AsOfPick]], O(log m)).
    *
    * This is the shape for 100 TB of trades against dimension-sized
    * marks (daily closes, instrument reference quotes): [[asOf]] shuffles
    * and sorts BOTH streams on the key; here the probe stream never
    * moves — no exchange, no sort, stays inside whole-stage codegen.
    * Bound: the packed reference side must fit in a broadcast (the same
    * judgement call as any `broadcast()` dim). Left-join semantics:
    * probe keys with no reference rows, or probing before the first
    * reference timestamp, get NULL.
    *
    * Same determinism caveat as [[asOf]]: pre-deduplicate the reference
    * side per (key, ts); equal-ts duplicates resolve to the last packed
    * entry (the `last()` tie-break).
    */
  def asOfBroadcast(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTs: String, rightTs: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    def micros(df: DataFrame, c: String): Column =
      if (df.schema(c).dataType == TimestampType) unix_micros(col(c))
      else col(c).cast("long")
    val packed = right
      .select(keys.map(col) :+ micros(right, rightTs).as("_t") :+ col(valueCol).as("_v"): _*)
      // a NULL reference timestamp must not enter the timeline: packed
      // arrays feed AsOfPick's binary search, where a null slot reads
      // as ts=0 and would answer probes before the first real reference
      // with that row's value — the non-null invariant AsOfPick
      // documents is ENFORCED here, not assumed
      .filter(col("_t").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(col("_t"), col("_v")))).as("_tv"))
      .select(keys.map(col)
        :+ col("_tv").getField("_t").as("_asof_ts_arr")
        :+ col("_tv").getField("_v").as("_asof_val_arr"): _*)
    left.join(broadcast(packed), keys, "left")
      .withColumn(valueCol,
        call_function("asof_pick",
          col("_asof_ts_arr"), col("_asof_val_arr"), micros(left, leftTs)))
      .drop("_asof_ts_arr", "_asof_val_arr")
  }

  /** As-of join in BOTH directions at once: each left row gets the most
    * recent right value at-or-before its timestamp (`v0`/`t0`) AND the
    * first right value strictly after it (`v1`/`t1`) — the neighbor pair
    * linear interpolation needs. Same union trick and the same cost as
    * [[asOf]]: ONE shuffle on the keys, one per-key sort; the backward
    * (unbounded-preceding) and forward (unbounded-following) frames share
    * one ordering, so Catalyst evaluates both in a single WindowExec.
    *
    * A right row exactly at the left timestamp sorts before it (tag
    * 0 < 1), so it lands in the backward frame only: `t0 == leftTs`,
    * giving the interpolation fraction 0 — the exact-match value.
    * Pre-deduplicate the right side per (key, ts) for determinism, as
    * with [[asOf]].
    */
  def asOfNeighbors(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTs: String, rightTs: String,
                    valueCol: String): DataFrame = {
    val vt = right.schema(valueCol).dataType
    val tt = right.schema(rightTs).dataType
    // (v, t) travel as ONE struct per neighbor so v0 and t0 (and v1/t1)
    // always come from the SAME right row — per-column ignoreNulls would
    // pair the last non-null VALUE with a newer row's timestamp when the
    // newest right value is null, and the interpolation fraction built
    // from that mixed pair is wrong. Null reference timestamps filtered
    // (the asOfBroadcast invariant).
    val pairType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", vt),
      org.apache.spark.sql.types.StructField("t", tt)))
    val l = left.withColumn("_asof_ts", col(leftTs)).withColumn("_asof_tag", lit(1))
      .withColumn("_asof_p", lit(null).cast(pairType))
    val r0 = right
      .filter(col(rightTs).isNotNull)
      .select(keys.map(col)
        :+ struct(col(valueCol).as("v"), col(rightTs).as("t")).as("_asof_p")
        :+ col(rightTs).as("_asof_ts"): _*)
      .withColumn("_asof_tag", lit(0))
    val r = left.columns.filterNot(keys.contains)
      .foldLeft(r0)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val back = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("_b", last(col("_asof_p"), ignoreNulls = true).over(back))
      .withColumn("_f", first(col("_asof_p"), ignoreNulls = true).over(fwd))
      .withColumn("v0", col("_b").getField("v"))
      .withColumn("t0", col("_b").getField("t"))
      .withColumn("v1", col("_f").getField("v"))
      .withColumn("t1", col("_f").getField("t"))
      .filter(col("_asof_tag") === 1)
      .drop("_asof_ts", "_asof_tag", "_asof_p", "_b", "_f")
  }

  /** Range (interval) join: left rows matched to right rows whose timestamp
    * falls in [leftTs + lower, leftTs + upper]. Built-in non-equi join —
    * Catalyst plans broadcast/shuffled nested loop when no equi key exists,
    * or sort-merge when `keys` are provided (the equi part carries the
    * shuffle; the range is a residual filter — the scalable layout).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTs: String, rightTs: String,
                lower: Column, upper: Column): DataFrame = {
    val cond = keys.map(k => left(k) === right(k))
      .reduceOption(_ && _).map(_ &&
        (right(rightTs) >= left(leftTs) + lower) &&
        (right(rightTs) <= left(leftTs) + upper))
      .getOrElse(
        (right(rightTs) >= left(leftTs) + lower) &&
        (right(rightTs) <= left(leftTs) + upper))
    left.join(right, cond)
  }
}
