package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.Tables.configure(
    SparkSession.builder().master("local[4]").appName("cc-spec"), "8")
    .getOrCreate()

  private def cc(edges: Seq[(Long, Long)], driverThreshold: Long): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("src", "dst"), driverThreshold = driverThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // every case runs BOTH execution paths: the driver union-find (default
  // hybrid route for small candidate graphs) and the distributed star
  // alternation (threshold 0 — the 100 TB route)
  private def ccBoth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val driver = cc(edges, driverThreshold = 1000000L)
    val distributed = cc(edges, driverThreshold = 0L)
    assert(driver == distributed, "driver union-find != distributed star result")
    driver
  }

  test("two components, arbitrary edge orientation") {
    val labels = ccBoth(Seq((3L, 1L), (2L, 3L), (7L, 9L), (9L, 8L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("worst-case chain converges in O(log n) rounds, not O(diameter)") {
    // a 4096-long path: label propagation would need 4096 rounds; the
    // star alternation must finish well inside the 25-round guard
    val chain = (1L until 4096L).map(i => (i, i + 1))
    val labels = cc(chain, driverThreshold = 0L)
    assert(labels.size == 4096 && labels.values.forall(_ == 1L))
  }

  test("duplicate edges, self loops, singleton exclusion") {
    val labels = ccBoth(Seq((5L, 5L), (5L, 2L), (2L, 5L), (5L, 2L)))
    assert(labels == Map(2L -> 2L, 5L -> 2L))
  }
}
