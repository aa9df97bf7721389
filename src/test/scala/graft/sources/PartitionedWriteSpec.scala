package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.TestSpark

/** Directory-partitioned layout — the other half of the 100 TB scan story
  * next to Compaction's file clustering. `Tables`' scaladoc promises the
  * loaders read a partitioned layout unchanged; this pins that promise:
  * a `partitionBy` write produces hive-style dirs, a partition-key filter
  * is answered from the DIRECTORY LISTING (scan's partitionFilters, zero
  * data files of other partitions touched), and the partition column is
  * reconstructed on read. */
class PartitionedWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitionBy write + partition-key filter prunes to one directory") {
    val sp = spark
    import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = graft.core.Tables.documents(sp, "/root/testdata/sf0.01")

    docs.write.partitionBy("lang").mode("overwrite").parquet(base)
    val langs = new java.io.File(base).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langs.length > 1, s"expected hive-style lang= dirs, got ${langs.toSeq}")

    val q = sp.read.parquet(base).filter($"lang" === "en")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))

    // the lang predicate must be a PARTITION filter (directory pruning),
    // not a data filter evaluated per row-group
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"lang not in partitionFilters: ${scan.partitionFilters}")
    // after pruning, only the en directory's files are selected
    val selected = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files.map(_.getPath.toString))
    assert(selected.nonEmpty && selected.forall(_.contains("lang=en")),
      s"scan touches non-pruned files: ${selected.toSeq}")

    // partition column reconstructed; content round-trips
    val expected = docs.filter($"lang" === "en").count()
    assert(q.count() == expected)
  }
}
