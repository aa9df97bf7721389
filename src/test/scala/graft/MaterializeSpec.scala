package graft

import org.scalatest.funsuite.AnyFunSuite

private[graft] case class MatRow(id: Long, tag: String, vs: Seq[Int])

/** The materialization seam itself: mode selection, round-trip fidelity
  * (untyped AND typed — the seam sits under DataFrame sites like the
  * LSH bands and typed sites like runSpliced's tuples), and scratch
  * lifecycle. The executor-loss semantics of the two modes are proven
  * by [[graft.ClusterCheck]] under local-cluster (separate executor
  * JVMs) — a shared-session scalatest JVM can only host one
  * SparkContext, so the kill test lives in the cluster gate. */
class MaterializeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("eager local materialization preserves hash partitioning under AQE") {
    // r10 regression guard: under AQE (default-on in Spark 4)
    // localCheckpoint captures AdaptiveSparkPlanExec.outputPartitioning
    // = UnknownPartitioning, so every downstream join/groupBy on an
    // iterative round table re-shuffled it — silently defeating the
    // exchange-free co-partitioned rounds PageRank/ConnectedComponents
    // are built on. Materialize.eager now plans the checkpoint AQE-off
    // so the LogicalRDD records the real hashpartitioning.
    import org.apache.spark.sql.functions.{col, sum}
    import spark.implicits._
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "precondition: this spec must run with AQE on")
    val cp = Materialize.eager(
      (1 to 1000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "v")
        .repartition(4, col("k")))
    assert(cp.queryExecution.executedPlan.outputPartitioning.toString
      .startsWith("hashpartitioning(k"),
      s"checkpoint lost partitioning: ${cp.queryExecution.executedPlan.outputPartitioning}")
    // and the conf toggle restored AQE for the session
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    // consumer proof: a groupBy on the preserved key plans NO exchange
    val agg = cp.groupBy($"k").agg(sum($"v"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"groupBy after eager materialization still exchanges:\n$plan")
    assert(agg.count() == 97)
  }

  test("default (local) mode writes no scratch files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mat-none").toString
    spark.conf.set(Materialize.DirKey, dir)
    try {
      val df = Materialize((1 to 100).toDF("n"))
      assert(df.count() == 100)
      assert(new java.io.File(dir).list().forall(_ => false))
    } finally spark.conf.unset(Materialize.DirKey)
  }

  test("table mode round-trips untyped and typed data; cleanup removes scratch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mat-tbl").toString
    spark.conf.set(Materialize.ModeKey, "table")
    spark.conf.set(Materialize.DirKey, dir)
    try {
      val df = Materialize(
        spark.range(0, 50).selectExpr("id", "id * id as sq", "array(id, id+1) as a"))
      assert(df.as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq ==
        (0L until 50L).map(i => (i, i * i, Seq(i, i + 1))))
      val typed = Materialize.eager(
        Seq(MatRow(1, "a", Seq(1, 2)), MatRow(2, "b", Nil)).toDS())
      assert(typed.collect().sortBy(_.id).toSeq ==
        Seq(MatRow(1, "a", Seq(1, 2)), MatRow(2, "b", Nil)))
      // both materializations hit the scratch dir, and cleanup clears it
      assert(new java.io.File(dir).list().length == 2)
      Materialize.cleanup(spark)
      assert(new java.io.File(dir).list().forall(_ => false))
    } finally {
      spark.conf.unset(Materialize.ModeKey)
      spark.conf.unset(Materialize.DirKey)
    }
  }

  test("eagerReplacing keeps table mode at O(1) scratch tables per loop") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mat-loop").toString
    spark.conf.set(Materialize.ModeKey, "table")
    spark.conf.set(Materialize.DirKey, dir)
    try {
      var ranks = Materialize.eager(spark.range(0, 20).toDF("n"))
      assert(new java.io.File(dir).list().length == 1)
      for (_ <- 1 to 3) {
        ranks = Materialize.eagerReplacing(
          ranks.selectExpr("n + 1 as n"), ranks)
        // the superseded round's parquet is gone; only the live one remains
        assert(new java.io.File(dir).list().length == 1)
      }
      assert(ranks.selectExpr("sum(n)").head().getLong(0) ==
        (0L until 20L).map(_ + 3).sum)
      // releasing a non-table dataset (round-1 shape) is a harmless no-op
      Materialize.release(spark.range(3).toDF("n"))
      Materialize.cleanup(spark)
      assert(new java.io.File(dir).list().forall(_ => false))
    } finally {
      spark.conf.unset(Materialize.ModeKey)
      spark.conf.unset(Materialize.DirKey)
    }
  }

  test("first table-mode use sweeps stale sibling scratch from crashed drivers") {
    val parent = java.nio.file.Files.createTempDirectory("graft-mat-parent")
    val stale = new java.io.File(parent.toFile, "graft-mat-crashed-123")
    assert(stale.mkdir())
    assert(new java.io.File(stale, "orphan.parquet").createNewFile())
    // idle since yesterday — past the sweep age
    assert(stale.setLastModified(System.currentTimeMillis() - 24L * 3600 * 1000))
    val fresh = new java.io.File(parent.toFile, "graft-mat-fresh-456")
    assert(fresh.mkdir()) // a LIVE sibling (recent mtime) must survive
    spark.conf.set(Materialize.ModeKey, "table")
    spark.conf.set(Materialize.DirKey, s"$parent/graft-mat-live")
    try {
      Materialize.eager(spark.range(5).toDF("n")).count()
      assert(!stale.exists(), "stale sibling should have been swept")
      assert(fresh.exists(), "recent sibling must not be swept")
      Materialize.cleanup(spark)
    } finally {
      spark.conf.unset(Materialize.ModeKey)
      spark.conf.unset(Materialize.DirKey)
    }
  }
}
