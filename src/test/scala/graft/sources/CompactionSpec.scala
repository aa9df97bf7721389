package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction merges a shattered table; content identical; clustering bands files") {
    val sp = spark
    import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val shattered = s"$base/in"
    val merged = s"$base/out"
    val clustered = s"$base/clustered"

    // shatter: 64 files for ~60k rows of lineitem-shaped data
    val src = graft.core.Tables.lineitem(sp, "/root/testdata/sf0.01")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    src.repartition(64).write.mode("overwrite").parquet(shattered)
    assert(Compaction.countFiles(sp, shattered) == 64)

    val nOut = Compaction.compact(sp, shattered, merged)
    assert(nOut < 8, s"expected few size-targeted files, got $nOut")
    // content preserved exactly
    val a = sp.read.parquet(shattered).orderBy($"l_orderkey", $"l_quantity", $"l_extendedprice").collect()
    val b = sp.read.parquet(merged).orderBy($"l_orderkey", $"l_quantity", $"l_extendedprice").collect()
    assert(a.sameElements(b))

    // clustered rewrite: per-file l_orderkey ranges must not overlap, so
    // row-group min/max statistics can prune selective scans
    Compaction.compact(sp, shattered, clustered, clusterBy = Seq("l_orderkey"))
    val files = new java.io.File(clustered).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    val ranges = files.map { f =>
      val r = sp.read.parquet(f).agg(min($"l_orderkey"), max($"l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
  }
}
