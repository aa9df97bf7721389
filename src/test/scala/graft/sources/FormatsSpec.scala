package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Source-format coverage beyond parquet: the same tables and query
  * semantics over schema'd CSV and JSON (batch) and a JSON file stream
  * (live) — the formats a pipeline actually ingests before it ever
  * owns columnar files. Pins (a) lossless round-trips under an
  * explicit schema, (b) identical query results across formats, and
  * (c) the column-pruning caveat: row formats read whole records, so
  * converting to parquet is the first job of any 100 TB pipeline (the
  * Compaction operator's job), not an afterthought. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("CSV and JSON round-trip documents under an explicit schema; queries agree") {
    val sp = spark
    import sp.implicits._
    val docs = graft.core.Tables.documents(sp, sf)
      .orderBy($"doc_id") // deterministic file content
    val dir = java.nio.file.Files.createTempDirectory("graft-formats")

    docs.write.option("header", "true").option("escape", "\"")
      .csv(s"$dir/docs_csv")
    docs.write.json(s"$dir/docs_json")

    val schema = docs.schema
    val fromCsv = sp.read.schema(schema).option("header", "true")
      .option("escape", "\"").csv(s"$dir/docs_csv")
    val fromJson = sp.read.schema(schema).json(s"$dir/docs_json")

    // (a) lossless round-trip (text includes commas/quotes — the escape
    // options are load-bearing, not decoration)
    val want = docs.collect().map(_.toSeq).toSet
    assert(fromCsv.collect().map(_.toSeq).toSet == want)
    assert(fromJson.collect().map(_.toSeq).toSet == want)

    // (b) a real aggregation is format-independent
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"lang").agg(count(lit(1)).as("n"),
          sum($"n_chars").as("chars"))
        .orderBy($"lang").collect().map(_.toSeq).toSeq
    val fromParquet = stats(docs)
    assert(stats(fromCsv) == fromParquet && stats(fromJson) == fromParquet)
  }

  test("JSON file stream drains to the same aggregate as batch") {
    val sp = spark
    import sp.implicits._
    val docs = graft.core.Tables.documents(sp, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-json-stream")
    docs.write.json(s"$dir/in")

    val streamed = sp.readStream.schema(docs.schema).json(s"$dir/in")
      .groupBy($"lang").agg(count(lit(1)).as("n"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = streamed.writeStream.format("memory").queryName("json_stream")
      .option("checkpointLocation", ckpt).outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()

    val got = sp.sql("SELECT * FROM json_stream ORDER BY lang")
      .collect().map(_.toSeq).toSeq
    val want = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
      .orderBy($"lang").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }
}
