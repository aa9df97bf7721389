package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q134_ivfpq_trained end-to-end on the committed sf0.001 fixture: the
  * Lloyd-trained PQ codebook + exact re-rank must MEASURABLY beat the
  * untrained q130 baseline — the whole point of the gate is that the
  * improvement is a measured number in the output, not a claim. The
  * hash gate (vs the DuckDB recursive-free unrolled-Lloyd oracle) pins
  * the exact values; this spec pins the direction. */
class IvfPqTrainedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("trained recall strictly beats untrained, no per-query regression") {
    val df = graft.SparkEntry.queries("q134_ivfpq_trained")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect().map { r =>
      (r.getAs[Long]("q_id"),
        r.getAs[Long]("hits_untrained"), r.getAs[Long]("hits_trained"))
    }
    assert(rows.map(_._1).toSeq == Seq(10L, 11L, 12L, 13L, 14L))
    // direction: the trained index never loses a hit on this fixture…
    rows.foreach { case (q, unt, tr) =>
      assert(tr >= unt, s"q$q regressed: trained $tr < untrained $unt")
    }
    // …and strictly gains in aggregate
    assert(rows.map(_._3).sum > rows.map(_._2).sum)
  }
}
