package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.VectorOps
import graft.operators.Windows

/** Similarity search on LIVE traffic: a stream of query vectors probes
  * a static IVF-indexed corpus — cell scoring against the broadcast
  * codebook is a stateless projection, candidate ranking is a
  * stream-static join into the cell-partitioned index, and the per-query
  * top-k is computed inside the micro-batch. ZERO streaming state (no
  * watermark, no state store) — the q120 probe running at ingest time,
  * the serving-path counterpart of the batch index build. */
class StreamingAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("live queries rank against the static trained index, batch parity") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    // corpus: 2 clean direction clusters in 4 dims + ids 0/1 as seeds
    def v(a: Float, b: Float, c: Float, d: Float) = Seq(a, b, c, d)
    val corpus = Seq(
      0L -> v(1f, 0f, 0f, 0f), 1L -> v(0f, 1f, 0f, 0f),
      2L -> v(0.9f, 0.1f, 0f, 0f), 3L -> v(0.8f, 0.2f, 0f, 0f),
      4L -> v(0.1f, 0.9f, 0f, 0f), 5L -> v(0.2f, 0.8f, 0f, 0f))
      .toDF("vec_id", "embedding")
    val (cb, assign) = graft.llm.KMeans.train(corpus, k = 2, iterations = 2)
    val indexed = corpus
      .join(assign, "vec_id")
      .select($"vec_id", $"embedding",
        VectorOps.sqNormQ($"embedding").as("nrm"), $"cell")
      .localCheckpoint() // the built index — static by construction

    // stateless per-row best cell (nprobe=1 — the clusters are cleanly
    // separated): THE trained assignment rule, KMeans.bestCell, over a
    // projection — a window/groupBy here would be STATEFUL in a stream;
    // the per-row argmax is not
    def probe(queries: org.apache.spark.sql.DataFrame) = {
      val withCell = queries.withColumn("cell",
        graft.llm.KMeans.bestCell(
          transform($"q_emb", x => VectorOps.quant(x)), $"q_nrm", cb))
      withCell.join(indexed, Seq("cell"))
        .select($"q_id", $"vec_id".as("c_id"), $"cell",
          (VectorOps.dotQ($"q_emb", $"embedding").cast("double") /
            sqrt($"q_nrm".cast("double") * $"nrm".cast("double"))).as("cosine"))
    }

    val mem = MemoryStream[(Long, Seq[Float])]
    val queries = mem.toDS().toDF("q_id", "q_emb")
      .withColumn("q_nrm", VectorOps.sqNormQ($"q_emb"))
    val q = probe(queries).writeStream.format("memory").queryName("ann_live")
      .outputMode("append").start()
    try {
      mem.addData(100L -> v(0.95f, 0.05f, 0f, 0f)) // x-cluster query
      mem.addData(101L -> v(0.05f, 0.95f, 0f, 0f)) // y-cluster query
      q.processAllAvailable()

      // top-2 per query computed from the emitted candidates
      val live = sp.table("ann_live")
      val top = Windows.topKPerGroup(live, Seq("q_id"),
          Seq($"cosine".desc, $"c_id"), 2)
        .select($"q_id", $"c_id", $"rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // x-query's nearest are the x-cluster vectors; y-query's the y's
      assert(top.count(_._1 == 100L) == 2 && top.count(_._1 == 101L) == 2)
      assert(top.filter(_._1 == 100L).forall(p => Set(0L, 2L, 3L)(p._2)))
      assert(top.filter(_._1 == 101L).forall(p => Set(1L, 4L, 5L)(p._2)))

      // batch parity: the same probe over a static frame of the queries
      val batchQ = Seq(100L -> v(0.95f, 0.05f, 0f, 0f), 101L -> v(0.05f, 0.95f, 0f, 0f))
        .toDF("q_id", "q_emb")
        .withColumn("q_nrm", VectorOps.sqNormQ($"q_emb"))
      val batch = probe(batchQ)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
      val liveSet = live.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
      assert(batch == liveSet)

      // serving path is stateless: no state store operators at all
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
