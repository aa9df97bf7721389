package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Cross-corpus dedup as a reusable operator: probe NEW documents —
  * batch or a LIVE STREAM — against a static corpus index (q105 is the
  * batch/oracle form over the same machinery).
  *
  * The index is two small static frames derived from the corpus once
  * (at 100 TB: tables maintained by ingest):
  *   - distinct 60-bit content hashes (exact dup check),
  *   - distinct LSH band keys per band (near-dup candidate check).
  *
  * For a STREAMING probe, MATERIALIZE the index first
  * ([[graft.Materialize]]; a stored table — band-partitioned, so
  * the per-band filters prune — in production): that plan scans the
  * band index once per band per micro-batch, and an unmaterialized
  * index would re-derive the corpus signature pipeline per scan. The
  * batch plan reads each index exactly once. The fluent
  * `df.dedupAgainst(corpus)` applies this automatically.
  *
  * The probe is STATELESS: the per-row MinHash signature
  * ([[LlmQueries.rowSignature]] — no groupBy) plus one left join per
  * band against that band's distinct key set (each 1:≤1, so rows never
  * multiply), then the exact-hash left join. Inside Structured
  * Streaming every join is stream-static: no watermark, no state store
  * — the dedup-on-ingest shape where [[graft.streaming.IncrementalNearDup]]
  * is the within-stream form.
  */
object CorpusDedup {
  /** (band, bkey) distinct index of a static corpus. */
  def bandIndex(corpus: DataFrame): DataFrame =
    LlmQueries.bandKeys(LlmQueries.rowSignature(corpus))
      .select(col("band"), col("bkey")).distinct()

  /** Distinct 60-bit content hashes of a static corpus. */
  def hashIndex(corpus: DataFrame): DataFrame =
    corpus.select(PortableHash.md5Long(col("text")).as("th")).distinct()

  /** One row per new doc: doc_id, verdict ('exact_dup' | 'near_dup' |
    * 'keep'). PRECONDITION: `newDocs.doc_id` is unique — the batch
    * branch aggregates per doc_id (a duplicated id would blend two
    * documents into one verdict) while the streaming branch is per-row;
    * the documented batch ≡ streaming parity holds only for unique ids.
    * Re-ingest pipelines should exact-dedup (q40) before this call.
    * `newDocs` may be a streaming DataFrame — the plan adapts:
    *
    *   - BATCH: band keys explode to (doc, band, bkey), ONE semi-join
    *     against the index, per-doc flag aggregation — two shuffles,
    *     the throughput-optimal shape (q105's oracle gates it).
    *   - STREAMING: aggregation would be stateful, so instead one left
    *     join per band against that band's distinct keys — each 1:≤1,
    *     rows never multiply, and the whole plan stays STATELESS
    *     (stream-static joins only). The parity spec proves the two
    *     formulations row-identical.
    */
  def probe(newDocs: DataFrame, bandIdx: DataFrame, hashIdx: DataFrame): DataFrame = {
    // hash + signature ride ONE projection (a second branch of newDocs
    // would make a streaming plan stream-stream); docs under 3 tokens
    // have no shingles — null minima, so their band keys match nothing
    // and they still flow through the exact check
    val sig = newDocs
      .select(col("doc_id"), PortableHash.md5Long(col("text")).as("th"),
        LlmQueries.minsExpr(col("text")).as("mins"))
      .select(col("doc_id") +: col("th") +:
        (0 until 16).map(j => element_at(col("mins"), j + 1).as(s"h$j")): _*)
    val exact = hashIdx.select(col("th"), lit(1).as("is_exact"))
    val verdict = (near: org.apache.spark.sql.Column) =>
      when(col("is_exact").isNotNull, "exact_dup")
        .when(near, "near_dup").otherwise("keep").as("verdict")
    if (newDocs.isStreaming) {
      val flagged = (0 until 4).foldLeft(sig) { (acc, b) =>
        val idx = bandIdx.filter(col("band") === b)
          .select(col("bkey").as(s"bk$b"), lit(1).as(s"near$b"))
        acc.withColumn(s"bk$b", LlmQueries.bandKeyExpr(b)).join(idx, Seq(s"bk$b"), "left")
      }
      flagged.join(exact, Seq("th"), "left")
        .select(col("doc_id"),
          verdict((0 until 4).map(b => col(s"near$b").isNotNull).reduce(_ || _)))
    } else {
      // single consumer of `sig` (a second branch would re-run the
      // signature pipeline — the q91 diamond pathology): th rides the
      // band explode, the 1:≤1 index join marks hits, and ONE per-doc
      // aggregation recovers (th, any-band-hit)
      val bands = sig.select(col("doc_id"), col("th"),
        posexplode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), LlmQueries.bandKeyExpr(b).as("bkey"))): _*)))
        .select(col("doc_id"), col("th"),
          col("col.band").as("band"), col("col.bkey").as("bkey"))
      val hit = bands.join(bandIdx.withColumn("m", lit(1)), Seq("band", "bkey"), "left")
        .groupBy(col("doc_id"))
        .agg(first(col("th")).as("th"), max(col("m")).as("is_near"))
      hit.join(exact, Seq("th"), "left")
        .select(col("doc_id"), verdict(col("is_near").isNotNull))
    }
  }
}
