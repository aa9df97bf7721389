package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-files maintenance for parquet sinks — at 100 TB a table is
  * written by thousands of tasks across thousands of micro-batches, and
  * scan cost becomes dominated by file-open overhead and footer reads
  * long before data volume. Compaction rewrites a directory into
  * size-targeted files:
  *
  *  - the shuffle is a `REBALANCE` hint, i.e. AQE's advisory-size
  *    coalescing/splitting (`spark.sql.adaptive.advisoryPartitionSizeInBytes`)
  *    — skewed output partitions are SPLIT, small ones merged, at
  *    runtime, with no row-count guesswork;
  *  - `maxRecordsPerFile` caps the residual worst case per task;
  *  - optional `clusterBy` columns turn the rebalance into a range
  *    re-clustering: rows are range-partitioned and sorted by the
  *    cluster key, so each output file owns a narrow min/max band and
  *    parquet row-group statistics prune file reads for selective
  *    predicates on that key (the poor man's Z-order — exact for a
  *    single-column key, prefix-ordered for composites).
  */
object Compaction {

  /** Rewrite `inDir` (parquet) into `outDir` as size-targeted files.
    * Returns the number of files written. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              advisoryBytes: Long = 128L * 1024 * 1024,
              maxRecordsPerFile: Long = 0L,
              clusterBy: Seq[String] = Nil): Long = {
    val prev = spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisoryBytes.toString)
    try {
      val df = spark.read.parquet(inDir)
      val shaped: DataFrame =
        if (clusterBy.isEmpty) df.hint("rebalance")
        else df.repartitionByRange(clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      val writer = shaped.write.mode("overwrite")
      (if (maxRecordsPerFile > 0)
         writer.option("maxRecordsPerFile", maxRecordsPerFile)
       else writer)
        .parquet(outDir)
      countFiles(spark, outDir)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
        case None    => spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
    }
  }

  /** Parquet data files under `dir` (driver-side listing — maintenance
    * metadata, not a data path). */
  def countFiles(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
