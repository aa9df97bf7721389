package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TypedAggs.{KmvBuf, KmvSketch}

/** Streaming distinct-count sketch — live cardinality per group over an
  * unbounded stream, with BOUNDED state: one KMV buffer (≤ 64 longs)
  * per group, updated incrementally with the exact same
  * reduce/merge/finish as the batch aggregator
  * ([[graft.functions.TypedAggs.KmvSketch]], oracle-gated as
  * q83_kmv_udaf). Because min-k insertion is order-free and
  * duplicate-idempotent, the streaming state after ANY prefix of the
  * stream equals the batch aggregate of that prefix — the parity spec
  * asserts it batch-for-batch.
  *
  * This is the live form of the 100 TB sketch-rollup story (q78): the
  * per-group state here and a per-partition stored sketch there merge
  * with the same min-k union. `count(DISTINCT)` over a stream would
  * need unbounded state; this needs 64 longs per group, forever.
  */
object StreamingKmv {

  /** Per-group estimate after each micro-batch (Update mode): the
    * current KMV estimate and the sketch fill level. */
  case class KmvEstimate(group: String, est_distinct: Double, sketch_size: Int)

  /** Incremental per-group KMV over a streaming frame of
    * (group: String, h: Long) rows — `h` already in the portable hash
    * domain ([[graft.functions.PortableHash.md5Mod]]). */
  def estimates(rows: DataFrame): Dataset[KmvEstimate] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.selectExpr("cast(group as string) group", "cast(h as long) h")
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[(String, Long)], state: GroupState[Array[Long]]) =>
          val buf0 = KmvBuf(state.getOption.getOrElse(Array.empty[Long]))
          val buf = batch.foldLeft(buf0)((b, r) => KmvSketch.reduce(b, r._2))
          state.update(buf.hs)
          KmvEstimate(g, KmvSketch.finish(buf), buf.hs.length)
      }
  }
}
