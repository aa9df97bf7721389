package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.VectorOps

/** The TRAINED compressed index served live — q134's offline artifacts
  * (Lloyd-trained per-subspace codebook over the coarse residuals)
  * driving the online ADC probe. Everything the stream evaluates is the
  * SAME builder the offline gate used ([[IvfPq]] residual/dtab/adc,
  * [[KMeans.bestCell]] for the coarse cell — one definition each), so
  * a training run cannot desynchronize offline build from online
  * serving. Stream-static join on the cell, zero state operators;
  * batch ≡ live asserted row-for-row on the committed fixture. */
class StreamingTrainedPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("trained PQ codebook serves live: stream ADC ≡ batch ADC, zero state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val ctx = LlmQueries.ivfPqCtx(sp, "/root/testdata/sf0.001")
    val cwT = LlmQueries.trainPqCodebook(ctx.resid, ctx.cwSeed, 2)
    assert(cwT != ctx.cwSeed, "training did not move the codebook")

    // offline: the coded table under the TRAINED codebook (cell-keyed,
    // static by construction — at scale this is the cell-partitioned
    // postings table PipelineDemo writes)
    val coded = ctx.resid.select($"vec_id" +: $"cell" +:
        (0 to 3).map(sI => IvfPq.codeFor($"r", cwT, sI, 16).as(s"code$sI")): _*)
      .localCheckpoint()
    val cb = ctx.centComps.zipWithIndex.map { case (c, i) =>
      KMeans.Centroid(i.toLong, c, c.map(v => v * v).sum)
    }

    // the online probe: coarse cell via the SHARED assignment rule,
    // residual + per-subspace ADC tables via the SHARED builders,
    // stream-static join to the coded cell — stateless projections only
    def probe(queries: DataFrame): DataFrame = {
      val q = queries
        .withColumn("xq", transform($"q_emb", x => VectorOps.quant(x)))
        .withColumn("nrm", VectorOps.sqNormQ($"q_emb"))
        .withColumn("cell", KMeans.bestCell($"xq", $"nrm", cb))
        .withColumn("qr", IvfPq.residual($"xq", $"cell", ctx.centComps))
        .select($"q_id" +: $"cell" +:
          (0 to 3).map(sI => IvfPq.dtab($"qr", cwT, sI, 16).as(s"dtab$sI")): _*)
      q.join(coded, Seq("cell"))
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id".as("c_id"),
          IvfPq.adc((0 to 3).map(i => col(s"code$i")),
            (0 to 3).map(i => col(s"dtab$i"))).as("adc"))
    }

    val queries = ctx.emb.filter($"vec_id" >= 10 && $"vec_id" < 15)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val batchOut = probe(queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(batchOut.nonEmpty)

    val qRows = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq
    val mem = MemoryStream[(Long, Seq[Float])]
    val sq = probe(mem.toDS().toDF("q_id", "q_emb"))
      .writeStream.format("memory").queryName("trained_pq_live")
      .outputMode("append").start()
    try {
      mem.addData(qRows.take(2): _*)
      sq.processAllAvailable()
      mem.addData(qRows.drop(2): _*)
      sq.processAllAvailable()
      val live = sp.sql("SELECT q_id, c_id, adc FROM trained_pq_live").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(live == batchOut, "live trained-ADC ≠ batch trained-ADC")
      val st = sq.lastProgress.stateOperators
      assert(st == null || st.isEmpty, s"unexpected stateful operators: $st")
    } finally sq.stop()
  }
}
