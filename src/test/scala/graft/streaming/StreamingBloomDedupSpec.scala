package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.streaming.StreamingBloomDedup._

/** Bounded-state streaming dedup ≡ a from-scratch Bloom replay of the
  * whole stream prefix — state survives micro-batch boundaries, shards
  * decompose exactly, and at saturation the over-drop is deterministic
  * (the same keys drop on every run), not just bounded. */
class StreamingBloomDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent re-derivation: one mask per shard, rows in (ts, seq)
    * order, plain Scala — the operator's contract, not its code path. */
  private def expectedKept(rows: Seq[(Long, Long, Long)], nShards: Int,
                           mBits: Int): Seq[(Long, Long)] = {
    val masks = Array.fill(nShards)(new Array[Long](mBits / 64))
    rows.sortBy(r => (r._2, r._3)).flatMap { case (key, ts, seq) =>
      if (admit(masks(shardOf(key, nShards)), key, mBits)) Some((key, seq)) else None
    }
  }

  private def runStream(waves: Seq[Seq[(Long, Long, Long)]], nShards: Int,
                        mBits: Int): Seq[Kept] = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val got = java.util.Collections.synchronizedList(new java.util.ArrayList[Kept]())
    val q = firstSeen(mem.toDF().toDF("key", "ts_us", "seq"), nShards, mBits)
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Kept], _: Long) =>
        ds.collect().foreach(got.add)
      }
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      waves.foreach { w => mem.addData(w); q.processAllAvailable() }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq
  }

  test("no-collision regime: equals exact first-seen dedup across micro-batches") {
    // 40 distinct keys in 2^16 bits: P(any collision) ≈ 0 — the bloom
    // must reproduce EXACT first-seen semantics, including duplicates
    // split across micro-batch boundaries (state persistence)
    val w1 = (0 until 30).map(i => (i % 20L, 1000L + i, i.toLong))         // keys 0..19, dups
    val w2 = (0 until 30).map(i => (10L + i % 30L, 2000L + i, 100L + i))   // keys 10..39: 10..19 are cross-batch dups
    val kept = runStream(Seq(w1, w2), nShards = 4, mBits = 65536)

    val exactFirstSeen = (w1 ++ w2).sortBy(r => (r._2, r._3))
      .groupBy(_._1).view.mapValues(_.head._3).toMap
    assert(kept.size == 40, s"expected 40 distinct keys kept, got ${kept.size}")
    assert(kept.map(k => k.key -> k.seq).toMap == exactFirstSeen)
    // shard decomposition is the portable hash, not partitioning luck
    assert(kept.forall(k => k.shard == shardOf(k.key, 4)))
  }

  test("saturation: over-drop is deterministic — kept set equals the from-scratch replay") {
    // 500 distinct keys into 256 bits per shard (2 shards): the mask
    // saturates and genuinely-new keys get dropped. The CONTRACT is not
    // "no drops" but "exactly the drops the replay predicts".
    val rows = (0 until 600).map(i => ((i % 500).toLong, 1000L + i, i.toLong))
    val waves = rows.grouped(200).toSeq
    val nShards = 2
    val mBits = 256
    val kept = runStream(waves, nShards, mBits)
    val expected = expectedKept(rows, nShards, mBits)

    assert(kept.map(k => (k.key, k.seq)).sortBy(_._2) == expected.sortBy(_._2))
    // it DID saturate (some new keys dropped) and state stayed at 2×32B
    assert(kept.size < 500, s"mask should saturate: kept ${kept.size} of 500")
    assert(kept.size > 100, "but not degenerate")
  }
}
