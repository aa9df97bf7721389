package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The plan-shape regression gate's two halves: the classifier (what
  * counts as "strictly worse") and the fingerprinter (does a real plan
  * land in the right buckets — and does a REAL regression, a broadcast
  * join demoted by conf, actually trip it). The whole-suite run against
  * the committed baseline is the standing `graft.PlanGate` gate. */
class PlanGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fp(df: org.apache.spark.sql.DataFrame) = PlanGate.fingerprint(df)

  test("fingerprint buckets a broadcast join and a shuffle agg") {
    import spark.implicits._
    val big = spark.range(0, 10000).select($"id", ($"id" % 7).as("k"))
    val dim = Seq((0L, "a"), (1L, "b")).toDF("k", "tag")
    val f = fp(big.join(broadcast(dim), "k").groupBy($"tag").count())
    assert(f.counts.getOrElse("bhj", 0) == 1, s"expected one broadcast join: $f")
    assert(f.counts.getOrElse("broadcast", 0) == 1)
    assert(f.counts.getOrElse("shuffle", 0) == 1) // the groupBy exchange
    assert(f.counts.getOrElse("smj", 0) == 0)
  }

  test("fingerprint counts scan width and pushed filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plangate").toString
    spark.range(0, 100).selectExpr("id", "id*2 as a", "id*3 as b")
      .write.mode("overwrite").parquet(dir)
    val narrow = fp(spark.read.parquet(dir).filter(col("id") > 10).select("id", "a"))
    val wide = fp(spark.read.parquet(dir))
    assert(narrow.counts.getOrElse("scan", 0) == 1)
    assert(narrow.scanCols == 2 && wide.scanCols == 3) // pruning visible
    assert(narrow.pushed >= 1 && wide.pushed == 0) // pushdown visible
  }

  test("a conf-demoted broadcast join is a detected regression") {
    import spark.implicits._
    val big = spark.range(0, 10000).select($"id", ($"id" % 7).as("k"))
    val dim = spark.range(0, 5).select($"id".as("k"), ($"id" * 10).as("tag"))
    val joined = big.join(dim, "k") // size-based broadcast at 5 rows
    val before = fp(joined)
    assume(before.counts.getOrElse("bhj", 0) == 1) // precondition of the demo
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val after = fp(big.join(dim, "k"))
      val regs = PlanGate.regressions(before, after)
      assert(regs.exists(_.contains("demoted")), s"expected demotion in $regs")
      assert(regs.exists(_.startsWith("shuffle")), s"expected shuffle growth in $regs")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("classifier: each cost axis trips; improvements do not") {
    def f(nodes: (String, Int)*) = PlanGate.Fp(nodes.toMap, 0, 0, Nil)
    val base = f("shuffle" -> 1, "sort" -> 1, "bhj" -> 1, "scan" -> 2)
    assert(PlanGate.regressions(base, base).isEmpty)
    assert(PlanGate.regressions(base, f("shuffle" -> 2, "sort" -> 1, "bhj" -> 1, "scan" -> 2)).nonEmpty)
    assert(PlanGate.regressions(base, f("shuffle" -> 1, "sort" -> 2, "bhj" -> 1, "scan" -> 2)).nonEmpty)
    assert(PlanGate.regressions(base, f("shuffle" -> 1, "sort" -> 1, "bhj" -> 1, "scan" -> 3)).nonEmpty)
    assert(PlanGate.regressions(base,
      f("shuffle" -> 1, "sort" -> 1, "bhj" -> 1, "scan" -> 2, "cartesian" -> 1)).nonEmpty)
    assert(PlanGate.regressions(base,
      f("shuffle" -> 1, "sort" -> 1, "bhj" -> 1, "scan" -> 2, "sortagg" -> 1)).nonEmpty)
    // fewer shuffles/sorts = improvement, not a regression (stale-baseline CHANGED)
    assert(PlanGate.regressions(base, f("bhj" -> 1, "scan" -> 2)).isEmpty)
    // lost pruning / pushdown
    val scan = PlanGate.Fp(Map("scan" -> 1), 2, 1, Nil)
    assert(PlanGate.regressions(scan, scan.copy(scanCols = 3)).nonEmpty)
    assert(PlanGate.regressions(scan, scan.copy(pushed = 0)).nonEmpty)
    assert(PlanGate.regressions(scan, scan.copy(pushed = 2)).isEmpty)
  }

  test("baseline JSON round-trips through the parser") {
    val fps = Map(
      "qa" -> PlanGate.Fp(Map("shuffle" -> 2, "scan" -> 1), 5, 3, Seq("DistributedRank")),
      "qb" -> PlanGate.Fp(Map.empty, 0, 0, Nil))
    val json = fps.toSeq.sortBy(_._1)
      .map { case (q, f) => s""""$q": ${f.json}""" }.mkString("{\n", ",\n", "\n}\n")
    assert(PlanGate.parseBaseline(json) == fps)
  }

  test("the committed baseline parses and covers the whole registry") {
    val base = PlanGate.parseBaseline(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("tools/plan_baseline.json")),
      java.nio.charset.StandardCharsets.UTF_8))
    assert(base.keySet == SparkEntry.queries.keySet,
      s"baseline drift: +${SparkEntry.queries.keySet.diff(base.keySet)} " +
        s"-${base.keySet.diff(SparkEntry.queries.keySet)} (run PlanGate --update)")
  }
}
