package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark

/** Sink-side exactly-once: Structured Streaming guarantees each batchId
  * is REDELIVERED after a failure between source-offset commit and sink
  * commit — the sink must be idempotent per batchId or rows duplicate.
  * Pins the foreachBatch discipline a 100 TB pipeline's parquet/object-
  * store sink uses: write every batch to a batchId-keyed location with
  * overwrite (redelivery rewrites the same files), versus the naive
  * append sink that duplicates on the same replay. The replay is forced
  * the way a real crash produces it: the checkpoint's commit marker for
  * batch 0 is removed (offsets recorded, completion not), so restart
  * re-executes batch 0 from the SAME recorded offsets. */
class IdempotentSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("overwrite-by-batchId sink survives a replayed batch; append duplicates") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val out = java.nio.file.Files.createTempDirectory("graft-eos").toString
    val naive = java.nio.file.Files.createTempDirectory("graft-naive").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val mem = MemoryStream[Long]

    def start() = mem.toDS().toDF("v").writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        // idempotent: the batch's identity names its output; a replay
        // overwrites the identical files instead of adding new ones
        df.write.mode("overwrite").parquet(s"$out/b$batchId")
        // the hazard, for contrast: blind append
        df.write.mode("append").parquet(naive)
        ()
      }
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    try { mem.addData(1L, 2L, 3L); q1.processAllAvailable() } finally q1.stop()

    // simulate the crash window: offsets/0 exists, commits/0 does not
    // (the local FS keeps a .crc sibling — drop it with the file, or the
    // commit log reads the orphan checksum as a concurrent writer)
    val commit = java.nio.file.Paths.get(ckpt, "commits", "0")
    assert(java.nio.file.Files.deleteIfExists(commit))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))

    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val idem = sp.read.parquet(s"$out/b0").as[Long].collect().sorted
    assert(idem.toSeq == Seq(1L, 2L, 3L)) // replay rewrote, not doubled
    assert(sp.read.parquet(naive).count() == 6L) // the naive sink paid for it
  }
}
