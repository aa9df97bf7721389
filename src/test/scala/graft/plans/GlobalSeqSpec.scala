package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The extension path end-to-end: user-written global ranking windows
  * (row_number / rank / dense_rank with no partition key) plan as
  * DistributedRankExec (no single-task WindowExec), with exactly the
  * stock semantics — including tie groups, which range partitioning
  * keeps intact by construction. */
class GlobalSeqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    val sp = spark
    import sp.implicits._
    // duplicate keys (k has ~1000 distinct values over 5000 rows) force
    // tie groups; interleaved across 16 input partitions
    sp.createDataset((1 to 5000).map(i => ((i * 2654435761L) % 997, i.toLong)))
      .toDF("k", "payload")
      .repartition(16)
  }

  test("global row_number window plans as DistributedRankExec, correct values") {
    val sp = spark
    import sp.implicits._
    val df = fixture.withColumn("rn",
      row_number().over(Window.orderBy($"k", $"payload")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DistributedRank"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"stock WindowExec still present:\n$plan")

    val got = df.orderBy($"rn").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val want = fixture.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._1, t._2)).zipWithIndex
      .map { case ((k, p), i) => (k, p, i + 1) }
    assert(got.toSeq == want.toSeq)
  }

  test("global rank/dense_rank rewritten, tie groups exact across partitions") {
    val sp = spark
    import sp.implicits._
    // order by k ALONE → real ties (several rows per k)
    val df = fixture
      .withColumn("rk", rank().over(Window.orderBy($"k")))
      .withColumn("dr", dense_rank().over(Window.orderBy($"k")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DistributedRank"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"stock WindowExec still present:\n$plan")

    val rows = fixture.collect().map(r => (r.getLong(0), r.getLong(1)))
    val sortedKeys = rows.map(_._1).sorted
    val rankOf = sortedKeys.zipWithIndex.groupBy(_._1)
      .map { case (k, g) => k -> (g.map(_._2).min + 1) }
    val denseOf = sortedKeys.distinct.sorted.zipWithIndex
      .map { case (k, i) => k -> (i + 1) }.toMap

    val got = df.select($"k", $"payload", $"rk", $"dr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val want = rows.map { case (k, p) => (k, p, rankOf(k), denseOf(k)) }.toSet
    assert(got == want)
  }

  test("stacked prefix-compatible windows merge into ONE shuffle node") {
    val sp = spark
    import sp.implicits._
    // rank/dense over the COARSE key k; row_number over the full
    // (k, payload) — prefix-compatible, so one DistributedRank node.
    // k-tie groups straddle range-partition boundaries under the finer
    // partitioning, exercising the boundary carry-in/dedup merge.
    val df = fixture
      .withColumn("rk", rank().over(Window.orderBy($"k")))
      .withColumn("dr", dense_rank().over(Window.orderBy($"k")))
      .withColumn("rn", row_number().over(Window.orderBy($"k", $"payload")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DistributedRank"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"stock WindowExec still present:\n$plan")
    val nNodes = "DistributedRank".r.findAllIn(plan).length
    assert(nNodes == 1, s"expected ONE merged DistributedRank, got $nNodes:\n$plan")

    val rows = fixture.collect().map(r => (r.getLong(0), r.getLong(1)))
    val sortedKeys = rows.map(_._1).sorted
    val rankOf = sortedKeys.zipWithIndex.groupBy(_._1)
      .map { case (k, g) => k -> (g.map(_._2).min + 1) }
    val denseOf = sortedKeys.distinct.sorted.zipWithIndex
      .map { case (k, i) => k -> (i + 1) }.toMap
    val rnOf = rows.sortBy(t => (t._1, t._2)).zipWithIndex
      .map { case (kp, i) => kp -> (i + 1) }.toMap

    val got = df.select($"k", $"payload", $"rk", $"dr", $"rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSet
    val want = rows.map { case (k, p) =>
      (k, p, rankOf(k), denseOf(k), rnOf((k, p))) }.toSet
    assert(got == want)
  }

  test("one giant tie group chains carry-in across every partition") {
    val sp = spark
    import sp.implicits._
    // k is CONSTANT: the single rank/dense group spans all partitions,
    // so every boundary continues the run and carry-in must chain
    // through partitions that are entirely one group
    val df = sp.createDataset((1 to 4000).map(i => (7L, i.toLong)))
      .toDF("k", "payload").repartition(16)
      .withColumn("rk", rank().over(Window.orderBy($"k")))
      .withColumn("dr", dense_rank().over(Window.orderBy($"k")))
      .withColumn("rn", row_number().over(Window.orderBy($"k", $"payload")))
    val plan = df.queryExecution.executedPlan.toString
    assert("DistributedRank".r.findAllIn(plan).length == 1)
    val rows = df.select($"payload", $"rk", $"dr", $"rn").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(rows.forall { case (_, rk, dr, _) => rk == 1 && dr == 1 })
    assert(rows.sortBy(_._1).map(_._4).toSeq == (1 to 4000))
  }

  test("row_number over a PREFIX order does not merge (tie order pinned)") {
    val sp = spark
    import sp.implicits._
    val df = fixture
      .withColumn("rn1", row_number().over(Window.orderBy($"k")))
      .withColumn("rn2", row_number().over(Window.orderBy($"k", $"payload")))
    val plan = df.queryExecution.executedPlan.toString
    val nNodes = "DistributedRank".r.findAllIn(plan).length
    assert(nNodes == 2, s"expected two separate nodes:\n$plan")
    // both assignments are still valid permutations
    val n = fixture.count().toInt
    val r = df.agg(min($"rn1"), max($"rn1"), countDistinct($"rn1"),
      min($"rn2"), max($"rn2"), countDistinct($"rn2")).collect()(0)
    assert(r.getInt(0) == 1 && r.getInt(1) == n && r.getLong(2) == n)
    assert(r.getInt(3) == 1 && r.getInt(4) == n && r.getLong(5) == n)
  }

  test("partitioned and non-ranking windows are NOT rewritten") {
    val sp = spark
    import sp.implicits._
    val partitioned = fixture.withColumn("rn",
      row_number().over(Window.partitionBy($"k" % 7).orderBy($"payload")))
    assert(!partitioned.queryExecution.executedPlan.toString.contains("DistributedRank"))
    val lagged = fixture.withColumn("lg",
      lag($"payload", 1).over(Window.orderBy($"k", $"payload")))
    assert(!lagged.queryExecution.executedPlan.toString.contains("DistributedRank"))
  }

  test("empty input and downstream composition") {
    val sp = spark
    import sp.implicits._
    val empty = fixture.filter($"payload" < 0).withColumn("rn",
      row_number().over(Window.orderBy($"k")))
    assert(empty.count() == 0)

    val out = fixture.withColumn("rn",
        row_number().over(Window.orderBy($"k", $"payload")))
      .filter($"rn" <= 10)
      .select($"rn", $"k")
      .orderBy($"rn")
      .collect()
    assert(out.length == 10 && out.map(_.getInt(0)).toSeq == (1 to 10))
  }
}
