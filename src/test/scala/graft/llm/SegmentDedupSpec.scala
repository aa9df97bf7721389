package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q103's segment dedup edges the fixture can't exercise: a document
  * whose EVERY segment repeats collapses to empty text (but stays in
  * the output), a partial overlap only loses the repeated block, and
  * unaffected multi-segment docs round-trip bit-exactly through the
  * explode → window → reassemble path. */
class SegmentDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val sp = spark
    import sp.implicits._
    val block = (1 to 10).map(i => s"w$i").mkString(" ") // one shared segment
    val tail5 = (1 to 5).map(i => s"t$i").mkString(" ")
    val uniq25 = (1 to 25).map(i => s"u$i").mkString(" ")
    val d = java.nio.file.Files.createTempDirectory("segdedup").toString
    Seq(
      (1L, block, "en", "s", block.length.toLong),         // dup of doc 2
      (2L, block, "en", "s", block.length.toLong),         // dup of doc 1
      (3L, s"$block $tail5", "en", "s", 0L),               // first block dup, tail unique
      (4L, uniq25, "en", "s", uniq25.length.toLong)        // 3 segments, untouched
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("fully-duplicated docs collapse to empty text but stay present") {
    val out = graft.SparkEntry.queries("q103_segment_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((1L, 1L, "")))
    assert(out(2L) == ((1L, 1L, "")))
  }

  test("partial overlap drops only the repeated block, in order") {
    val tail5 = (1 to 5).map(i => s"t$i").mkString(" ")
    val r = graft.SparkEntry.queries("q103_segment_dedup")(spark, dir)
      .filter("doc_id = 3").collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getString(3)) == ((2L, 1L, tail5)))
  }

  test("untouched multi-segment doc round-trips bit-exactly") {
    val uniq25 = (1 to 25).map(i => s"u$i").mkString(" ")
    val r = graft.SparkEntry.queries("q103_segment_dedup")(spark, dir)
      .filter("doc_id = 4").collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getString(3)) == ((3L, 0L, uniq25)))
  }
}
