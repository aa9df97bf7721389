package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[Skew.boundedBucketPairs]] — the LSH bucket-population cap. The
  * oracle gates (q137/q138) prove both engines' cap semantics agree;
  * this pins the operator's behavior where it matters: a degenerate
  * bucket is dropped WHOLE (no pair from it survives), small buckets
  * pass through untouched, and the capped text chain emits a strict
  * subset of the uncapped one on the committed fixture. */
class SkewBoundedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("over-cap bucket drops whole; under-cap bucket pairs survive") {
    val sp = spark
    import sp.implicits._
    // bucket A: 5 members (degenerate), bucket B: 2 members
    val buckets = (
      (1L to 5L).map(i => (0L, "A", i)) ++ Seq((0L, "B", 10L), (0L, "B", 11L))
    ).toDF("band", "bkey", "id")
    val pairs = Skew.boundedBucketPairs(buckets, Seq("band", "bkey"), "id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 11L)), s"got $pairs")
    // raising the cap to 5 readmits bucket A's 10 pairs
    val all = Skew.boundedBucketPairs(buckets, Seq("band", "bkey"), "id", 5)
      .count()
    assert(all == 11L) // C(5,2) + 1
  }

  test("star mode: over-cap bucket keeps O(pop) representative edges, components preserved") {
    val sp = spark
    import sp.implicits._
    // bucket A: 5 NON-identical members (the drop-mode blind spot),
    // bucket B: 2 members
    val buckets = (
      (1L to 5L).map(i => (0L, "A", i)) ++ Seq((0L, "B", 10L), (0L, "B", 11L))
    ).toDF("band", "bkey", "id")
    val pairs = Skew.boundedBucketPairsStar(buckets, Seq("band", "bkey"), "id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bucket B enumerated fully; bucket A reduced to rep(1) → {2,3,4,5}
    assert(pairs == Set((10L, 11L), (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)),
      s"got $pairs")
    // connectivity identical to the unbounded enumeration
    val full = Skew.boundedBucketPairs(buckets, Seq("band", "bkey"), "id", 5)
    def comps(df: org.apache.spark.sql.DataFrame) =
      ConnectedComponents.run(df, "a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(comps(full.toDF("a_id", "b_id")) ==
      comps(Skew.boundedBucketPairsStar(buckets, Seq("band", "bkey"), "id", 4)))
  }

  test("capped text chain is a strict subset of the uncapped chain") {
    val sf = "/root/testdata/sf0.001"
    val capped = graft.SparkEntry.queries("q137_bounded_banding")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.SparkEntry.queries("q44_lsh_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(full))
    // the fixture HAS over-cap buckets at this scale — the cap must bite
    assert(capped.size < full.size,
      s"cap did not drop anything (${capped.size} == ${full.size})")
  }
}
