package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PageRank fixed-point arithmetic vs a plain-Scala re-derivation on a
  * hand-checkable graph — the distributed scatter/gather must equal the
  * sequential integer recurrence exactly (that exactness is what lets
  * q115 hash-gate the estimates against DuckDB). */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("3 iterations on a star+chain graph match the sequential integer math") {
    val sp = spark
    import sp.implicits._
    // hub 0 ← leaves 1,2,3 (leaves point at the hub); hub points at 4;
    // 4 → 5 chain tail; 5 is dangling (keeps base)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 4L), (4L, 5L))
    val got = PageRank.run(edges.toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val init = PageRank.Scale / nodes.size
    val base = 15L * init / 100L
    var rank = nodes.map(_ -> init).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = nodes.map(n => n -> (base + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    assert(got == rank)
    // structure sanity: the hub out-ranks every leaf, and the chain
    // tail (which accumulates the hub's flow) out-ranks the leaves
    assert(got(0L) > got(1L) && got(5L) > got(1L))
  }
}
