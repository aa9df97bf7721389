package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.PortableHash

/** Streaming first-seen dedup with BOUNDED state — the 100 TB form of
  * W1/q31. Exact streaming dedup (`dropDuplicates`, or the greeter
  * machine) keeps one state entry PER DISTINCT KEY, which on an
  * unbounded stream is an unbounded state store; the watermarked variant
  * (`dropDuplicatesWithinWatermark`, q86's batch shape) bounds state by
  * FORGETTING old keys — correct only when duplicates arrive close
  * together. This operator takes the other trade: a per-shard Bloom mask
  * (`mBits` bits, k=4 md5 positions — the q124 batch mask's hash domain)
  * remembers EVERY key forever in fixed space, at the cost of a
  * quantified false-positive rate: a genuinely-new key whose 4 bits are
  * all already set is wrongly dropped with probability ≈ (1−e^(−kn/m))^k.
  * For pipelines that tolerate slight over-dropping (training-data
  * dedup drops aggressively anyway), state is mBits/8 bytes per shard,
  * forever, with zero eviction semantics to reason about.
  *
  * Determinism contract (what makes the spec's from-scratch re-derivation
  * exact): bit positions are portable md5 (never JVM hashCode), keys
  * hash-decompose into shards exactly like a cluster shuffle would, and
  * each shard replays its micro-batch slice in (ts_us, seq) order before
  * touching the mask — so the kept set depends only on the stream
  * prefix, not on partitioning or arrival jitter within a batch.
  */
object StreamingBloomDedup {
  val K = 4

  /** A kept (first-seen) row; dropped rows produce nothing. */
  final case class Kept(shard: Int, key: Long, ts_us: Long, seq: Long)

  private[streaming] final case class In(key: Long, ts_us: Long, seq: Long)

  /** Bit position j for a key — the q124 'bloom<j>|<key>' convention
    * (md5ModLocal is nonnegative, so the bare mod matches q124's
    * column-side `md5Mod % m` exactly). */
  def posOf(j: Int, key: Long, mBits: Int): Int =
    (PortableHash.md5ModLocal(s"bloom$j|$key") % mBits).toInt

  /** Forwarder: the single shared definition lives on [[PortableHash]]. */
  def shardOf(key: Long, nShards: Int): Int = PortableHash.shardOf(key, nShards)

  /** Pure mask step, shared by the operator and the spec's re-derivation:
    * returns true (and sets the key's bits) iff some bit was unset. */
  def admit(mask: Array[Long], key: Long, mBits: Int): Boolean = {
    var j = 0
    var fresh = false
    while (j < K) {
      val p = posOf(j, key, mBits)
      if ((mask(p / 64) >>> (p % 64) & 1L) == 0L) { fresh = true; mask(p / 64) |= 1L << (p % 64) }
      j += 1
    }
    fresh
  }

  /** First-seen rows of a streaming frame with (key, ts_us, seq) columns.
    * `mBits` must be a multiple of 64; size it at ≳10 bits per expected
    * distinct key per shard for ~1% over-drop at k=4 — the build-side
    * sizing rule, independent of total stream volume. */
  def firstSeen(rows: DataFrame, nShards: Int, mBits: Int): Dataset[Kept] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
    val spark = rows.sparkSession
    import spark.implicits._
    val n = nShards
    val m = mBits
    rows.selectExpr("CAST(key AS LONG) AS key", "CAST(ts_us AS LONG) AS ts_us",
        "CAST(seq AS LONG) AS seq").as[In]
      .groupByKey(r => shardOf(r.key, n))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, batch: Iterator[In], state: GroupState[Array[Long]]) =>
          val mask = state.getOption.getOrElse(new Array[Long](m / 64))
          val out = Seq.newBuilder[Kept]
          batch.toArray.sortBy(r => (r.ts_us, r.seq)).foreach { r =>
            if (admit(mask, r.key, m)) out += Kept(shard, r.key, r.ts_us, r.seq)
          }
          state.update(mask)
          out.result().iterator
      }
  }
}
