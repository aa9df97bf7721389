package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Property check for the merged prefix-window rank path: random key
  * cardinalities (from all-distinct to one giant tie group), random
  * input partitionings, rank/dense_rank over the coarse key + row_number
  * over the full key — always ONE DistributedRank node, always equal to
  * the brute-force definition computed in plain Scala. The cardinality
  * sweep forces every boundary case: groups split across partitions,
  * whole partitions inside one group, empty partitions (n < partitions). */
class RankMergePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merged rank/dense/row_number == brute force across cardinalities") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(1234)
    for (card <- Seq(1, 2, 5, 300, 5000); _ <- 1 to 2) {
      val n = 200 + rnd.nextInt(1800)
      val parts = 1 + rnd.nextInt(20)
      val rows = List.tabulate(n)(i =>
        (rnd.nextInt(card).toLong, i.toLong))
      val df = sp.createDataset(rows).toDF("k", "payload")
        .repartition(parts)
        .withColumn("rk", rank().over(Window.orderBy($"k")))
        .withColumn("dr", dense_rank().over(Window.orderBy($"k")))
        .withColumn("rn", row_number().over(Window.orderBy($"k", $"payload")))
      val plan = df.queryExecution.executedPlan.toString
      assert("DistributedRank".r.findAllIn(plan).length == 1,
        s"card=$card n=$n parts=$parts did not merge:\n$plan")

      val sortedKeys = rows.map(_._1).sorted
      val rankOf = sortedKeys.zipWithIndex.groupBy(_._1)
        .map { case (k, g) => k -> (g.map(_._2).min + 1) }
      val denseOf = sortedKeys.distinct.sorted.zipWithIndex
        .map { case (k, i) => k -> (i + 1) }.toMap
      val rnOf = rows.sortBy(identity).zipWithIndex
        .map { case (kp, i) => kp -> (i + 1) }.toMap

      val got = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSet
      val want = rows.map { case (k, p) =>
        (k, p, rankOf(k), denseOf(k), rnOf((k, p))) }.toSet
      assert(got == want, s"values diverged at card=$card n=$n parts=$parts")
    }
  }
}
