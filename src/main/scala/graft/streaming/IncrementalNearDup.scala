package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming (incremental) near-duplicate detection — the "new crawl
  * batch against the existing corpus" operator. Batch equivalent:
  * q70_incremental_neardup (oracle-gated); the parity spec feeds the
  * same fixture through both and asserts identical output.
  *
  * Pipeline shape (the part that matters at 100 TB):
  *  - MinHash signatures are computed with the stateless per-row form
  *    ([[graft.llm.LlmQueries.rowSignature]]) — no shuffle, no state;
  *  - the ONLY stateful operator is a per-band-key store holding ONE
  *    long (the smallest doc_id that has produced this band key) —
  *    state size is O(distinct band keys), the same cardinality the
  *    batch LSH join shuffles, and it never rescans previous documents;
  *  - a doc arriving with some band key already in state emits
  *    (doc_id, stored min); the per-doc `dup_of` = min over its bands,
  *    finished per micro-batch downstream (foreachBatch in the spec —
  *    a grouped agg over ONLY this batch's hits).
  *
  * Docs must arrive in non-decreasing doc_id order for exact batch
  * parity (arrival order IS the dedup order); within a micro-batch any
  * order is repaired by the per-key sort.
  */
object IncrementalNearDup {

  /** Per-band hit: `doc_id` shares a band key with earlier doc `peer`. */
  case class BandHit(doc_id: Long, peer: Long)

  /** Band-key hits over a STREAMING frame of documents (doc_id, text).
    * Output (append-per-update semantics): one [[BandHit]] per (doc,
    * band) whose key was already seen by a smaller doc_id. Finish with a
    * per-doc `min(peer)` in the consumer. */
  def hits(docs: DataFrame): Dataset[BandHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = graft.llm.LlmQueries.bandKeys(
        graft.llm.LlmQueries.rowSignature(docs))
      .select(concat_ws("|", col("band"), col("bkey")).as("bk"), col("doc_id"))
      .as[(String, Long)]
    bands.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (_: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
        // replay this batch's docs for the key in arrival (doc_id) order
        val sorted = rows.map(_._2).toArray.sorted
        var mn = state.getOption.getOrElse(Long.MaxValue)
        val out = Seq.newBuilder[BandHit]
        sorted.foreach { d =>
          if (mn < d) out += BandHit(d, mn)
          if (d < mn) mn = d
        }
        state.update(mn)
        out.result().iterator
    }
  }
}
