package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Windows

/** SQ8 serving on LIVE traffic — the q151 encode at ingest time: the
  * corpus is SQ8-coded ONCE (static, 8× smaller than the float scan),
  * each live query row is coded by a stateless per-row projection (the
  * same integer rule), and scoring is a stream-static broadcast join on
  * int8 codes. ZERO streaming state — like the IVF/PQ serving specs,
  * the index layers compose with Structured Streaming because every
  * per-query step is a projection + join, never an aggregation. */
class StreamingSq8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The q151_sq8_recall encode (QScale 1e7 quant → per-vector max-abs
    * scale → sign-split integer division to int8 codes + code norm). */
  private def sq8(df: DataFrame, emb: String, pfx: String): DataFrame =
    df.selectExpr("*",
        s"transform($emb, x -> CAST(CAST(x AS DOUBLE) * 10000000 AS BIGINT)) AS ${pfx}_xq")
      .selectExpr("*", s"array_max(transform(${pfx}_xq, x -> abs(x))) AS ${pfx}_s")
      .filter(col(s"${pfx}_s") > 0)
      .selectExpr("*",
        s"transform(${pfx}_xq, x -> CASE WHEN x < 0 THEN -((-x * 127) DIV ${pfx}_s)" +
          s" ELSE (x * 127) DIV ${pfx}_s END) AS ${pfx}_c8")
      .selectExpr("*",
        s"aggregate(${pfx}_c8, CAST(0 AS BIGINT), (a, x) -> a + x * x) AS ${pfx}_n8")
      .drop(s"${pfx}_xq", s"${pfx}_s")

  test("live queries rank against the static SQ8 codes, batch parity, zero state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    def v(a: Float, b: Float, c: Float, d: Float) = Seq(a, b, c, d)
    val corpus = Seq(
      0L -> v(1f, 0f, 0f, 0f), 1L -> v(0f, 1f, 0f, 0f),
      2L -> v(0.9f, 0.1f, 0f, 0f), 3L -> v(0.8f, 0.2f, 0f, 0f),
      4L -> v(0.1f, 0.9f, 0f, 0f), 5L -> v(0.2f, 0.8f, 0f, 0f))
      .toDF("vec_id", "embedding")
    val coded = sq8(corpus, "embedding", "c")
      .select($"vec_id", $"c_c8", $"c_n8")
      .localCheckpoint() // the built code table — static by construction

    // per-query scoring: stateless projections + one broadcast join
    def probe(queries: DataFrame): DataFrame =
      sq8(queries, "q_emb", "q")
        .crossJoin(broadcast(coded))
        .selectExpr("q_id", "vec_id AS c_id",
          "CAST(aggregate(zip_with(q_c8, c_c8, (x, y) -> x * y), CAST(0 AS BIGINT), (a, x) -> a + x) AS DOUBLE)" +
            " / sqrt(CAST(q_n8 AS DOUBLE) * CAST(c_n8 AS DOUBLE)) AS cosine")

    val mem = MemoryStream[(Long, Seq[Float])]
    val queries = mem.toDS().toDF("q_id", "q_emb")
    val q = probe(queries).writeStream.format("memory").queryName("sq8_live")
      .outputMode("append").start()
    try {
      mem.addData(100L -> v(0.95f, 0.05f, 0f, 0f)) // x-cluster query
      mem.addData(101L -> v(0.05f, 0.95f, 0f, 0f)) // y-cluster query
      q.processAllAvailable()

      val live = sp.table("sq8_live")
      val top = Windows.topKPerGroup(live, Seq("q_id"),
          Seq($"cosine".desc, $"c_id"), 2)
        .select($"q_id", $"c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // int8 rounding must not flip the cluster ranking
      assert(top.count(_._1 == 100L) == 2 && top.count(_._1 == 101L) == 2)
      assert(top.filter(_._1 == 100L).forall(p => Set(0L, 2L, 3L)(p._2)))
      assert(top.filter(_._1 == 101L).forall(p => Set(1L, 4L, 5L)(p._2)))

      // batch parity: the identical probe over a static frame
      val batch = probe(Seq(
          100L -> v(0.95f, 0.05f, 0f, 0f), 101L -> v(0.05f, 0.95f, 0f, 0f))
        .toDF("q_id", "q_emb"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val liveSet = live.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch == liveSet)

      // serving path is stateless: no state store operators at all
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
