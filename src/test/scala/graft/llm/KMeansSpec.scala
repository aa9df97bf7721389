package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[KMeans]] unit behavior on hand-checkable fixtures (q119 hash-gates
  * the full-corpus math against DuckDB; this pins the semantics). */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def embDf(rows: Seq[(Long, Seq[Float])]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("two separable direction clusters converge to their members") {
    val a = Seq(1.0f, 0.0f, 0.0f)
    val b = Seq(0.0f, 1.0f, 0.0f)
    def near(base: Seq[Float], eps: Float) =
      base.zipWithIndex.map { case (x, i) => if (i == 2) eps else x }
    // seeds: 0 (cluster A), 1 (cluster B); members tilted slightly in z
    val (cb, assign) = KMeans.train(embDf(Seq(
      0L -> a, 1L -> b,
      2L -> near(a, 0.1f), 3L -> near(a, -0.1f),
      4L -> near(b, 0.1f), 5L -> near(b, -0.1f))), k = 2, iterations = 3)
    val got = assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == got(2L) && got(0L) == got(3L))
    assert(got(1L) == got(4L) && got(1L) == got(5L))
    assert(got(0L) != got(1L))
    assert(cb.map(_.cell).toSet == Set(0L, 1L))
    // trained centroid = truncated mean of the members' quantized
    // components: z averages to 0 for both cells
    cb.foreach(c => assert(c.c(2) == 0L))
  }

  test("duplicate seeds contract: the losing cell drops out of the codebook") {
    val v = Seq(1.0f, 0.0f)
    // both seeds identical -> every vector ties -> tie rule sends all
    // to cell 0 -> cell 1 is empty after round 1 and stays dropped
    val (cb, assign) = KMeans.train(
      embDf(Seq(0L -> v, 1L -> v, 2L -> v, 3L -> v)), k = 2, iterations = 2)
    assert(cb.map(_.cell) == Seq(0L))
    assert(assign.collect().map(_.getLong(1)).forall(_ == 0L))
  }
}
