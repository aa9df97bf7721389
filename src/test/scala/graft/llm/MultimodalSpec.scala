package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core.Tables

/** Multimodal plumbing: binary column → distributed frame decode →
  * per-frame digest + feature vector. Decode is the deterministic stub
  * (no media libs in this container); the schema/partitioning/batch
  * shape is the real pipeline. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("frame extraction: counts, hashes and features are deterministic and consistent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.binarize(docs)
    val frames = Multimodal.extractFrames(media, "doc_id", "blob").collect()

    import spark.implicits._
    val expectedCounts = media
      .selectExpr("doc_id", "CAST(ceil(octet_length(blob) / 64.0) AS INT) AS n")
      .as[(Long, Int)].collect().toMap
    val gotCounts = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(gotCounts == expectedCounts)

    // every frame's feature histogram sums to its byte count
    assert(frames.forall(f => f.features.sum.toInt == f.n_bytes))
    // frame indexes are dense per medium
    assert(frames.groupBy(_.media_id).values.forall(g =>
      g.map(_.frame_idx).sorted.toSeq == (0 until g.length)))

    // re-run is bit-identical (stub decode is deterministic)
    val again = Multimodal.extractFrames(media, "doc_id", "blob").collect()
    assert(again.map(f => (f.media_id, f.frame_idx, f.frame_md5)).sortBy(x => (x._1, x._2)).toSeq
      == frames.map(f => (f.media_id, f.frame_idx, f.frame_md5)).sortBy(x => (x._1, x._2)).toSeq)
  }

  test("pipeline integration: frame features flow into the ANN operator (quantized_dot)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps

    val docs = Tables.documents(spark, "/root/testdata/sf0.001").filter($"doc_id" < 20)
    val frames = Multimodal.extractFrames(Multimodal.binarize(docs), "doc_id", "blob")
      .toDF().filter($"frame_idx" === 0) // first frame per medium
      .select($"media_id", $"features")

    // nearest neighbor per frame among the other frames, via the native
    // codegen expression — the multimodal → similarity-search hand-off
    val q = frames.select($"media_id".as("q_id"), $"features".as("q_f"),
      VectorOps.sqNormQ($"features").as("q_n"))
    val c = frames.select($"media_id".as("c_id"), $"features".as("c_f"),
      VectorOps.sqNormQ($"features").as("c_n"))
    val nn = q.join(c, $"q_id" =!= $"c_id")
      .select($"q_id", $"c_id",
        (VectorOps.dotQ($"q_f", $"c_f").cast("double") /
          sqrt($"q_n".cast("double") * $"c_n".cast("double"))).as("cosine"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"q_id")
          .orderBy($"cosine".desc, $"c_id")))
      .filter($"rn" === 1)
      .collect()

    assert(nn.length == 20) // every frame found a neighbor
    assert(nn.forall { r =>
      val cos = r.getAs[Double]("cosine"); cos >= -1.0001 && cos <= 1.0001
    })
  }
}
