package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.PortableHash

/** Streaming heavy hitters — live approximate top-k over an unbounded
  * stream with BOUNDED state: a count-min sketch (4×256 int64 counters,
  * the q89_cms_topk geometry and hash domain) plus a ≤ k candidate map
  * per SHARD. The live form of the q89 batch sketch.
  *
  * Sharding is the scale story: keys are hash-partitioned into shards
  * (every occurrence of a key lands in ONE shard), so each shard's CMS
  * counts exactly its own keys and global heavy hitters are the top-k
  * of the union of shard candidates — the same exact decomposition a
  * 1000-executor cluster gets from its shuffle. State per shard is
  * 8 KiB of counters + k candidates, forever; an exact count would
  * keep one entry per distinct key.
  *
  * Candidate tracking is the standard CMS top-k discipline: after each
  * micro-batch the estimates of (existing candidates ∪ batch keys) are
  * refreshed against the grown counters and trimmed to k; a key
  * currently outside the candidate set re-enters the moment it
  * reappears in a batch. Estimates are deterministic given the input
  * prefix (md5 hash domain), so the parity spec re-derives them
  * exactly.
  */
object StreamingCms {
  val Depth = 4
  val Width = 256

  final case class HeavyHitter(shard: Int, key: Long, est: Long)

  /** q89's bucket function on the JVM side: md5("cms<r>|<key>") mod P
    * mod width — the portable hash domain, never JVM hashCode
    * (md5ModLocal is nonnegative, so the bare mod suffices). */
  def bucket(r: Int, key: Long): Int =
    (PortableHash.md5ModLocal(s"cms$r|$key") % Width).toInt

  /** Forwarder: the single shared definition lives on [[PortableHash]]. */
  def shardOf(key: Long, nShards: Int): Int = PortableHash.shardOf(key, nShards)

  /** Point estimate = min over rows of the key's counter (CMS read). */
  def estimate(counters: Array[Long], key: Long): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = counters(r * Width + bucket(r, key))
      if (c < m) m = c
      r += 1
    }
    m
  }

  /** Per-shard live top-k over a streaming frame with a `key: Long`
    * column; emits each shard's refreshed candidates every micro-batch
    * (Update mode). Global top-k = top-k of the shard union. */
  def heavyHitters(rows: DataFrame, nShards: Int, k: Int): Dataset[HeavyHitter] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val n = nShards
    val kk = k
    rows.selectExpr("cast(key as long) key").as[Long]
      .groupByKey(key => shardOf(key, n))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, batch: Iterator[Long],
         state: GroupState[(Array[Long], Map[Long, Long])]) =>
          val (counters, cands0) = state.getOption
            .getOrElse((new Array[Long](Depth * Width), Map.empty[Long, Long]))
          // tally per distinct key first: heavy-hitter streams are
          // duplicate-dominated, and bucket() is 4 md5 digests — hash
          // once per key, add the tally, not once per row
          val tally = scala.collection.mutable.Map.empty[Long, Long]
          batch.foreach(key => tally(key) = tally.getOrElse(key, 0L) + 1L)
          tally.foreach { case (key, cnt) =>
            var r = 0
            while (r < Depth) { counters(r * Width + bucket(r, key)) += cnt; r += 1 }
          }
          val cands = (cands0.keySet ++ tally.keySet).iterator
            .map(key => key -> estimate(counters, key))
            .toSeq.sortBy { case (key, est) => (-est, key) }
            .take(kk).toMap
          state.update((counters, cands))
          cands.iterator.map { case (key, est) => HeavyHitter(shard, key, est) }
      }
  }
}
