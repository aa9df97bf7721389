package graft

import org.apache.spark.sql.{Column, DataFrame}
import graft.operators.{AsOfJoin, Windows}

/** Fluent surface over the library operators, so engine extensions chain
  * like built-ins:
  *
  * {{{
  * import graft.syntax._
  * trades
  *   .asOf(quotes, Seq("instrument"), "ts", "ts", Seq("mid"))
  *   .runningSum($"qty", "position", Seq("instrument"), "ts", "event_id")
  *   .topKPerGroup(Seq("instrument"), Seq($"position".desc), 10)
  * }}}
  *
  * Thin forwarding only — semantics, scale notes, and determinism
  * caveats live on the underlying operator objects.
  */
object syntax {

  implicit class GraftOps(private val df: DataFrame) extends AnyVal {

    /** [[AsOfJoin.asOf]]: most-recent right value at-or-before each row. */
    def asOf(right: DataFrame, keys: Seq[String], leftTs: String,
             rightTs: String, rightVals: Seq[String]): DataFrame =
      AsOfJoin.asOf(df, right, keys, leftTs, rightTs, rightVals)

    /** [[AsOfJoin.asOfBroadcast]]: zero-shuffle as-of for a small right side. */
    def asOfBroadcast(right: DataFrame, keys: Seq[String], leftTs: String,
                      rightTs: String, valueCol: String): DataFrame =
      AsOfJoin.asOfBroadcast(df, right, keys, leftTs, rightTs, valueCol)

    /** [[AsOfJoin.asOfNeighbors]]: backward AND forward neighbor values. */
    def asOfNeighbors(right: DataFrame, keys: Seq[String], leftTs: String,
                      rightTs: String, valueCol: String): DataFrame =
      AsOfJoin.asOfNeighbors(df, right, keys, leftTs, rightTs, valueCol)

    /** [[AsOfJoin.rangeJoin]]: rows matched within a time interval. */
    def rangeJoin(right: DataFrame, keys: Seq[String], leftTs: String,
                  rightTs: String, lower: Column, upper: Column): DataFrame =
      AsOfJoin.rangeJoin(df, right, keys, leftTs, rightTs, lower, upper)

    /** [[Windows.runningSum]]: cumulative per-key aggregate. */
    def runningSum(value: Column, as: String, keys: Seq[String],
                   ts: String = "ts", tieBreak: String = "event_id"): DataFrame =
      Windows.runningSum(df, value, as, keys, ts, tieBreak)

    /** [[Windows.firstSeen]]: first row per key (deterministic dedup). */
    def firstSeen(keys: Seq[String], ts: String = "ts",
                  tieBreak: String = "event_id"): DataFrame =
      Windows.firstSeen(df, keys, ts, tieBreak)

    /** [[Windows.topKPerGroup]]: partial top-k, never a full sort. */
    def topKPerGroup(keys: Seq[String], order: Seq[Column], k: Int): DataFrame =
      Windows.topKPerGroup(df, keys, order, k)

    /** [[Windows.vwap]]: sliding weighted average over event-time windows. */
    def vwap(width: String, slide: String, value: Column, weight: Column,
             keys: Seq[Column] = Nil, ts: String = "ts"): DataFrame =
      Windows.vwap(df, width, slide, value, weight, keys, ts)

    /** [[graft.llm.CorpusDedup.probe]]: exact/near-dup verdict per row
      * against a static corpus (works on a live stream — stateless).
      * Builds the index each call (materialized when `df` streams, since
      * the streaming plan scans it per band per micro-batch) — probing
      * repeatedly against one corpus should build the index once via
      * [[graft.llm.CorpusDedup.bandIndex]]/[[graft.llm.CorpusDedup.hashIndex]]. */
    def dedupAgainst(corpus: DataFrame): DataFrame = {
      val band = graft.llm.CorpusDedup.bandIndex(corpus)
      val hash = graft.llm.CorpusDedup.hashIndex(corpus)
      if (df.isStreaming)
        graft.llm.CorpusDedup.probe(df, band.transform(graft.Materialize(_)), hash.transform(graft.Materialize(_)))
      else graft.llm.CorpusDedup.probe(df, band, hash)
    }

    /** [[graft.operators.PageRank.run]]: fixed-point damped rank over a
      * (src, dst) edge table. */
    def pageRank(iterations: Int, dampingPct: Int = 85): DataFrame =
      graft.operators.PageRank.run(df, iterations, dampingPct)

    /** [[graft.streaming.StreamingCms.heavyHitters]]: live approximate
      * top-k over a streaming frame's `key` column (bounded state). */
    def heavyHitters(nShards: Int, k: Int): org.apache.spark.sql.Dataset[
        graft.streaming.StreamingCms.HeavyHitter] =
      graft.streaming.StreamingCms.heavyHitters(df, nShards, k)

    /** [[graft.operators.Scd2.build]]: change feed → versioned dimension
      * (valid_from/valid_to/is_current) in one shuffle. */
    def scd2(key: String, ts: String, tieBreak: String, attr: String): DataFrame =
      graft.operators.Scd2.build(df, key, ts, tieBreak, attr)
  }
}
