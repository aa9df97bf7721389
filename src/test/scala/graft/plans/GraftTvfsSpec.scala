package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The SQL TVF surface (q148/q149 gate the happy paths against DuckDB;
  * this pins operator EQUIVALENCE and the failure modes): the TVF must
  * return exactly what the Column-API operator returns on the same
  * views, and malformed invocations must fail at analysis with a
  * message naming the problem — not at runtime with a resolution
  * mystery. */
class GraftTvfsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def setup(): Unit = {
    val sp = spark
    import sp.implicits._
    Seq((1L, 10L, "a", 100.0), (2L, 20L, "a", 101.0), (3L, 15L, "b", 55.0))
      .toDF("trade_id", "ts", "sym", "px")
      .createOrReplaceTempView("tvf_trades")
    Seq(("a", 5L, 99.0), ("a", 12L, 100.5), ("b", 20L, 54.0))
      .toDF("sym", "ts", "quote_px")
      .createOrReplaceTempView("tvf_quotes")
  }

  test("graft_asof TVF returns exactly the Column-API operator's rows") {
    setup()
    val viaSql = spark.sql(
      "SELECT * FROM graft_asof('tvf_trades', 'tvf_quotes', 'sym', 'ts', 'ts', 'quote_px')")
    val viaApi = graft.operators.AsOfJoin.asOf(
      spark.table("tvf_trades"), spark.table("tvf_quotes"),
      Seq("sym"), "ts", "ts", Seq("quote_px"))
    assert(viaSql.columns.toSeq == viaApi.columns.toSeq)
    assert(viaSql.collect().toSet == viaApi.collect().toSet)
    // the as-of semantics themselves: trade@10 sees quote@5, trade@20
    // sees quote@12, trade(b)@15 precedes b's first quote -> NULL
    val byTrade = viaSql.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(4)) null else r.getDouble(4))).toMap
    assert(byTrade == Map(1L -> 99.0, 2L -> 100.5, 3L -> null))
  }

  test("malformed TVF calls fail at analysis with a naming message") {
    setup()
    val arity = intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof('tvf_trades', 'tvf_quotes', 'sym', 'ts')").collect()
    }
    assert(arity.getMessage.contains("graft_asof"))
    val nonLiteral = intercept[Exception] {
      spark.sql("SELECT * FROM graft_dedup_probe(CAST(rand() AS STRING), 'x')").collect()
    }
    assert(nonLiteral.getMessage.contains("string literal"))
    // corpus view valid — the missing PROBE view must be the one named
    // (the builder resolves corpus first)
    val missingView = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_dedup_probe('no_such_view_anywhere', 'tvf_trades')").collect()
    }
    assert(missingView.getMessage.toLowerCase.contains("no_such_view_anywhere"))
  }

  test("graft_dup_spans TVF returns exactly the Scala operator's rows") {
    val sp = spark
    import sp.implicits._
    Seq((1L, "x y a b c d"), (2L, "p q a b c r"), (3L, "u v w"))
      .toDF("doc_id", "text").createOrReplaceTempView("tvf_docs")
    val viaSql = spark.sql(
      "SELECT * FROM graft_dup_spans('tvf_docs', 3) ORDER BY doc_id, span_start")
      .collect().toSeq
    val viaScala = graft.llm.SubstringDedup.dupSpans(
        graft.llm.SubstringDedup.windowHashes(spark.table("tvf_docs"), 3), 3)
      .orderBy($"doc_id", $"span_start").collect().toSeq
    assert(viaSql == viaScala && viaSql.nonEmpty) // "a b c" repeats
    // n must be an integer literal; a string is an analysis-time failure
    val badN = intercept[Exception] {
      spark.sql("SELECT * FROM graft_dup_spans('tvf_docs', 'three')").collect()
    }
    assert(badN.getMessage.contains("integer literal"))
    val badRange = intercept[Exception] {
      spark.sql("SELECT * FROM graft_dup_spans('tvf_docs', 0)").collect()
    }
    assert(badRange.getMessage.contains(">= 1"))
  }
}
