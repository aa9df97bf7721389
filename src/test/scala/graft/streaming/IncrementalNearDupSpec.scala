package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Streaming incremental near-dup ≡ the batch q70 computation: the same
  * documents fed in three arrival-ordered micro-batches through the
  * stateful band store produce exactly the per-doc dup_of map the batch
  * LSH join computes — including duplicates that straddle micro-batch
  * boundaries (the state carries the corpus, nothing is rescanned). */
class IncrementalNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming band-store dedup ≡ batch q70 on the sf0.001 documents") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val docs = graft.core.Tables.documents(sp, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq

    val batchExpected = graft.SparkEntry
      .queries("q70_incremental_neardup")(sp, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val mem = MemoryStream[(Long, String)]
    val hits = IncrementalNearDup.hits(mem.toDS().toDF("doc_id", "text"))

    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    val q = hits.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[IncrementalNearDup.BandHit], _: Long) =>
        // per-micro-batch finish: min peer per doc over THIS batch's hits
        val finished = batch.groupBy($"doc_id").agg(min($"peer").as("dup_of"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
        acc.synchronized { acc ++= finished }
        ()
      }
      .start()
    try {
      // three arrival-ordered chunks — near-dups straddle the boundaries
      docs.grouped(math.max(1, docs.size / 3 + 1)).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // a doc's hits all land in its own micro-batch (state from earlier
    // batches), so per-batch finishing is exact — no doc appears twice
    val streamed = acc.toMap
    assert(acc.size == streamed.size, "a doc was finished in two batches")
    assert(streamed == batchExpected)
    assert(batchExpected.nonEmpty, "fixture produced no near-dups — vacuous test")
  }
}
