package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import graft.llm.CorpusDedup

/** Dedup-on-ingest: [[CorpusDedup.probe]] on a LIVE stream of new
  * documents against a static corpus index is pure stream-static joins
  * + a stateless per-row signature — ZERO streaming state (verified via
  * the query's stateOperators), and row-identical to the batch form
  * q105 hash-gates against DuckDB. */
class StreamingCorpusDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("live probe: stateless plan, verdicts match the batch operator") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    def doc(id: Long, text: String) = (id, text)
    val corpusRows = Seq(
      doc(1L, "alpha beta gamma delta epsilon zeta eta theta"),
      doc(2L, "one two three four five six seven eight nine ten"),
      doc(3L, "short text"))
    val corpus = corpusRows.toDF("doc_id", "text")
    // materialized once (the stored-table discipline the scaladoc
    // requires); streaming re-plans static sides per micro-batch
    val bandIdx = CorpusDedup.bandIndex(corpus).localCheckpoint()
    val hashIdx = CorpusDedup.hashIndex(corpus).localCheckpoint()

    val newRows = Seq(
      doc(10L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      doc(11L, "one two three four five six seven eight nine zzz"), // near dup of 2
      doc(12L, "totally different words appear in this document here"), // keep
      doc(13L, "short text"), // exact dup of 3 (no shingles — exact path only)
      doc(14L, "tiny doc")) // keep (no shingles, no hash match)

    val mem = MemoryStream[(Long, String)]
    val live = CorpusDedup.probe(
      mem.toDS().toDF("doc_id", "text"), bandIdx, hashIdx)
    val q = live.writeStream.format("memory").queryName("corpus_dedup_live")
      .outputMode("append").start()
    try {
      mem.addData(newRows.take(2): _*)
      q.processAllAvailable()
      mem.addData(newRows.drop(2): _*)
      q.processAllAvailable()

      // stateless: no stateful operators in any progress entry
      val state = q.lastProgress.stateOperators
      assert(state == null || state.isEmpty,
        s"streaming probe acquired state: ${state.mkString(",")}")

      val got = sp.table("corpus_dedup_live")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == Map(
        10L -> "exact_dup", 11L -> "near_dup", 12L -> "keep",
        13L -> "exact_dup", 14L -> "keep"))

      // batch parity: identical verdicts from the same operator
      val batch = CorpusDedup.probe(newRows.toDF("doc_id", "text"), bandIdx, hashIdx)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(batch == got)
    } finally q.stop()
  }
}
