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

  test("z-order clustering bounds file min/max in EVERY dimension; linear sort does not") {
    val sp = spark
    import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val in = s"$base/in"
    val zout = s"$base/z"
    val lout = s"$base/linear"

    // a 256×256 uniform grid: two independent dimensions, 65536 rows
    sp.range(65536L)
      .select(($"id" % 256).as("a"), ($"id" / 256).cast("long").as("b"))
      .repartition(8).write.mode("overwrite").parquet(in)

    // one read per file: (minA, maxA, minB, maxB)
    def bounds(dir: String): Array[(Long, Long, Long, Long)] = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      files.map { f =>
        val r = sp.read.parquet(f)
          .agg(min($"a"), max($"a"), min($"b"), max($"b")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    }

    // 4096-row files: written in sort order, so each owns a contiguous
    // chunk of the cluster key even when AQE coalesces the tiny fixture
    // into one partition
    Compaction.compact(sp, in, zout, maxRecordsPerFile = 4096, zOrderBy = Seq("a", "b"))
    Compaction.compact(sp, in, lout, maxRecordsPerFile = 4096, clusterBy = Seq("a", "b"))

    // lexicographic (a, b): every file spans b's FULL range — a predicate
    // on b alone prunes nothing
    val lin = bounds(lout)
    assert(lin.forall(f => f._4 - f._3 == 255L), s"linear bounds: ${lin.toSeq}")

    // z-order: every file's bounds are narrow in BOTH dimensions — a
    // selective predicate on a alone OR b alone prunes most files. A
    // contiguous Morton chunk of 1/32 of the grid spans ≤ 2 aligned
    // 64×32 tiles even when boundaries misalign.
    val zs = bounds(zout)
    assert(zs.forall(f => f._2 - f._1 <= 160 && f._4 - f._3 <= 160),
      s"z-order bounds: ${zs.toSeq}")
    // and pruning a mid-range point predicate on the NON-leading dim
    // really skips most files
    val containing = zs.count(f => f._3 <= 130L && 130L <= f._4)
    assert(containing * 4 <= zs.length, s"b=130 hits $containing of ${zs.length} files")

    // content preserved exactly
    val x = sp.read.parquet(in).orderBy($"a", $"b").collect()
    val y = sp.read.parquet(zout).orderBy($"a", $"b").collect()
    assert(x.sameElements(y))
  }
}
