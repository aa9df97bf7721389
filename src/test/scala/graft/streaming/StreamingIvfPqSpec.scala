package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.VectorOps
import graft.llm.IvfPq

/** The COMPRESSED index served live: a stream of query vectors probes a
  * static IVF-PQ corpus — per-row cell assignment and the per-cell ADC
  * tables are stateless projections built from the SAME [[IvfPq]]
  * builders as the offline q129 index (one definition: an online prober
  * that re-derived the encode/tie/lookup rules could silently diverge),
  * candidates come from a stream-static join on the cell, and the
  * distance is 2 code lookups — the scan never touches the original
  * floats. ZERO streaming state; batch parity asserted per prefix. */
class StreamingIvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("live ADC probe ≡ batch ADC probe on the same coded index, zero state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    // 4-dim corpus, m=2 subspaces × 2 dims, 2 centroids, 2 codewords.
    // Cells split on x-vs-y direction; within a cell, residuals split on
    // the z/w components — so ADC must separate what the coarse cell
    // cannot.
    def v(a: Float, b: Float, c: Float, d: Float) = Seq(a, b, c, d)
    val corpus = Seq(
      0L -> v(1f, 0f, 0f, 0f), 1L -> v(0f, 1f, 0f, 0f),        // centroids
      2L -> v(0.9f, 0.1f, 0.2f, 0f), 3L -> v(0.9f, 0.1f, 0f, 0.2f), // codeword donors
      4L -> v(0.95f, 0f, 0.19f, 0.01f), 5L -> v(0.95f, 0f, 0.01f, 0.19f),
      6L -> v(0f, 0.95f, 0.2f, 0f), 7L -> v(0f, 0.95f, 0f, 0.2f))
      .toDF("vec_id", "embedding")
    val base = corpus.select($"vec_id",
      transform($"embedding", x => VectorOps.quant(x)).as("xq"),
      VectorOps.sqNormQ($"embedding").as("nrm"))

    // offline build (driver-side, mirroring ivfPqTop3's conventions):
    // cells = ids 0/1; PQ codewords = residuals of ids 2/3
    val rows = base.collect().map(r =>
      r.getLong(0) -> (r.getSeq[Long](1).toIndexedSeq, r.getLong(2))).toMap
    val cents = IndexedSeq(rows(0L)._1, rows(1L)._1)
    def cellOf(id: Long): Int = { // argmax cosine, ties to lower cell
      val (xq, nrm) = rows(id)
      Seq(0, 1).maxBy { c =>
        val dot = xq.zip(cents(c)).map { case (a, b) => a * b }.sum
        (dot.toDouble / math.sqrt(nrm.toDouble *
          cents(c).map(v => v * v).sum.toDouble), -c)
      }
    }
    def residOf(id: Long): IndexedSeq[Long] =
      rows(id)._1.zip(cents(cellOf(id))).map { case (a, b) => a - b }
    val cw = IndexedSeq(residOf(2L), residOf(3L))

    // cell + residual + codes via the SHARED builders (the thing under test)
    val cellCol = Seq(0, 1).map { c =>
      val dot = aggregate(zip_with($"xq", typedLit(cents(c)),
        (a, b) => a * b), lit(0L), (acc, x) => acc + x)
      struct((dot.cast("double") /
        sqrt($"nrm".cast("double") * lit(cents(c).map(v => v * v).sum.toDouble)))
        .as("cos"), lit(-c).as("negCell"))
    }.reduce((a, b) => when(a.getField("cos") >= b.getField("cos"), a).otherwise(b))
    val coded = base
      .filter($"vec_id" >= 4) // serve the corpus; 0..3 are codebook artifacts
      .withColumn("cell", -cellCol.getField("negCell"))
      .withColumn("r", IvfPq.residual($"xq", $"cell", cents))
      .select($"vec_id", $"cell",
        IvfPq.codeFor($"r", cw, 0, 2).as("code0"),
        IvfPq.codeFor($"r", cw, 1, 2).as("code1"))
      .localCheckpoint() // the built coded index — static by construction

    def probe(queries: org.apache.spark.sql.DataFrame) = {
      val withCell = queries
        .withColumn("xq", transform($"q_emb", x => VectorOps.quant(x)))
        .withColumn("nrm", VectorOps.sqNormQ($"q_emb"))
        .withColumn("cell", -cellCol.getField("negCell"))
        .withColumn("qr", IvfPq.residual($"xq", $"cell", cents))
        .select($"q_id", $"cell",
          IvfPq.dtab($"qr", cw, 0, 2).as("dtab0"),
          IvfPq.dtab($"qr", cw, 1, 2).as("dtab1"))
      withCell.join(coded, Seq("cell")) // stream-static: zero state
        .select($"q_id", $"vec_id".as("c_id"), $"cell",
          IvfPq.adc(Seq($"code0", $"code1"), Seq($"dtab0", $"dtab1")).as("adc"))
    }

    val q100 = v(0.93f, 0.02f, 0.18f, 0.02f) // x-cell, z-flavored residual
    val q101 = v(0.02f, 0.93f, 0.02f, 0.18f) // y-cell, w-flavored residual
    val batchOut = probe(Seq(100L -> q100, 101L -> q101)
        .toDF("q_id", "q_emb")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(x => (x._1, x._2))

    val mem = MemoryStream[(Long, Seq[Float])]
    val sq = probe(mem.toDS().toDF("q_id", "q_emb"))
      .writeStream.format("memory").queryName("ivfpq_live")
      .outputMode("append").start()
    try {
      mem.addData(100L -> q100)
      sq.processAllAvailable()
      mem.addData(101L -> q101)
      sq.processAllAvailable()

      val live = sp.sql("SELECT q_id, c_id, adc FROM ivfpq_live").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
      assert(live.toSeq == batchOut.toSeq, "live ADC ≠ batch ADC")
      // the ADC separates residual flavors within the cell: q100 (z) must
      // rank the z-flavored neighbor 4 above the w-flavored 5, and q101
      // symmetrical — the compression carries real signal, not noise
      def best(qid: Long) = live.filter(_._1 == qid).minBy(r => (r._3, r._2))._2
      assert(best(100L) == 4L, s"q100 nearest was ${best(100L)}")
      assert(best(101L) == 7L, s"q101 nearest was ${best(101L)}")
      // zero streaming state: no state store operators in the progress
      val st = sq.lastProgress.stateOperators
      assert(st == null || st.isEmpty, s"unexpected stateful operators: $st")
    } finally sq.stop()
  }
}
