package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.syntax._

/** The fluent surface forwards to the operator objects unchanged — one
  * chained pipeline equals the explicit calls it sugars. */
class SyntaxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("chained asOf + runningSum + topKPerGroup ≡ explicit operator calls") {
    val sp = spark
    import sp.implicits._
    val ev = graft.core.Tables.events(sp, sf)
    val trades = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val quotes = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max_by($"value", $"event_id").as("quote"))

    val fluent = trades
      .asOf(quotes, Seq("user_id"), "ts", "ts", Seq("quote"))
      .runningSum($"value", "position", Seq("user_id"))
      .topKPerGroup(Seq("user_id"), Seq($"position".desc, $"event_id"), 3)

    val explicit = graft.operators.Windows.topKPerGroup(
      graft.operators.Windows.runningSum(
        graft.operators.AsOfJoin.asOf(trades, quotes, Seq("user_id"), "ts", "ts", Seq("quote")),
        $"value", "position", Seq("user_id")),
      Seq("user_id"), Seq($"position".desc, $"event_id"), 3)

    val a = fluent.orderBy($"user_id", $"rnk").collect()
    val b = explicit.orderBy($"user_id", $"rnk").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("asOfBroadcast through syntax matches asOf") {
    val sp = spark
    import sp.implicits._
    val ev = graft.core.Tables.events(sp, sf)
    val trades = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val quotes = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max_by($"value", $"event_id").as("quote"))
    val viaBroadcast = trades.asOfBroadcast(quotes, Seq("user_id"), "ts", "ts", "quote")
      .orderBy($"event_id").select($"event_id", $"quote").collect()
    val viaUnion = trades.asOf(quotes, Seq("user_id"), "ts", "ts", Seq("quote"))
      .orderBy($"event_id").select($"event_id", $"quote").collect()
    assert(viaBroadcast.nonEmpty && viaBroadcast.sameElements(viaUnion))
  }

  test("dedupAgainst ≡ explicit CorpusDedup probe") {
    val sp = spark
    import sp.implicits._
    val docs = graft.core.Tables.documents(sp, sf)
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val neu = docs.filter($"doc_id" % 2 === 1)
    val fluent = neu.dedupAgainst(corpus)
      .orderBy($"doc_id").collect()
    val explicit = graft.llm.CorpusDedup.probe(neu,
        graft.llm.CorpusDedup.bandIndex(corpus),
        graft.llm.CorpusDedup.hashIndex(corpus))
      .orderBy($"doc_id").collect()
    assert(fluent.nonEmpty && fluent.sameElements(explicit))
  }

  test("pageRank through syntax ≡ explicit PageRank.run") {
    val sp = spark
    import sp.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val fluent = edges.pageRank(2).orderBy($"node").collect()
    val explicit = graft.operators.PageRank.run(edges, 2)
      .orderBy($"node").collect()
    assert(fluent.nonEmpty && fluent.sameElements(explicit))
  }

  test("scd2 through syntax ≡ explicit Scd2.build") {
    val sp = spark
    import sp.implicits._
    val feed = Seq((1L, 10L, 0L, "A"), (1L, 20L, 1L, "A"), (1L, 30L, 2L, "B"))
      .toDF("k", "ts_us", "seq", "attr")
    val fluent = feed.scd2("k", "ts_us", "seq", "attr")
      .orderBy($"valid_from").collect()
    val explicit = graft.operators.Scd2.build(feed, "k", "ts_us", "seq", "attr")
      .orderBy($"valid_from").collect()
    assert(fluent.length == 2 && fluent.sameElements(explicit))
    assert(fluent.last.getLong(3) == Long.MaxValue) // open-ended current row
  }
}
