package graft

import org.scalatest.funsuite.AnyFunSuite

/** The composed five-stage pipeline (ingest → compact → dedup → index
  * → train-mix) end-to-end on the committed fixture. Stage correctness
  * lives in the oracle gates; what this pins is the COMPOSITION — each
  * stage's artifact is readable by the next, the internal row-count
  * cross-checks (survivor join, postings == q119 gate, packing bound)
  * all hold, and the stage boundaries stay in their expected order. */
class PipelineDemoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("all six stages run end-to-end with consistent counts") {
    val work = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val stages = PipelineDemo.run(spark, "/root/testdata/sf0.001", work)
    assert(stages.map(_.name) ==
      Seq("ingest", "compact", "dedup", "scrub", "index", "train-mix"))
    val byName = stages.map(s => s.name -> s).toMap
    // ingest landed the corpus; dedup kept a non-trivial strict subset
    assert(byName("ingest").rows == byName("compact").rows)
    assert(byName("dedup").rows > 0 &&
      byName("dedup").rows <= byName("compact").rows)
    // passage-level scrub rewrites text, never drops documents
    assert(byName("scrub").rows == byName("dedup").rows)
    // packing emitted at most one row per surviving doc
    assert(byName("train-mix").rows > 0 &&
      byName("train-mix").rows <= byName("scrub").rows)
  }

  test("persisted-materialization (table) mode completes with identical counts") {
    // the production fault-tolerant posture (graft.Materialize mode=table):
    // every reuse point becomes a durable parquet table instead of a
    // lineage-truncated localCheckpoint. Same pipeline, same fixture —
    // stage row counts must MATCH the default-mode run bit-for-bit
    // (materialization strategy is an execution detail, never semantics).
    val base = PipelineDemo.run(spark,
      "/root/testdata/sf0.001",
      java.nio.file.Files.createTempDirectory("graft-pipe-base").toString)
    val work = java.nio.file.Files.createTempDirectory("graft-pipe-table").toString
    spark.conf.set(Materialize.ModeKey, "table")
    spark.conf.set(Materialize.DirKey, s"$work/materialize")
    try {
      val stages = PipelineDemo.run(spark, "/root/testdata/sf0.001", work)
      assert(stages.map(s => (s.name, s.rows)) ==
        base.map(s => (s.name, s.rows)))
      // the mode actually engaged: reuse points exist on disk
      assert(new java.io.File(s"$work/materialize").exists())
    } finally {
      spark.conf.unset(Materialize.ModeKey)
      spark.conf.unset(Materialize.DirKey)
      Materialize.cleanup(spark)
    }
  }
}
