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
}
