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
}
