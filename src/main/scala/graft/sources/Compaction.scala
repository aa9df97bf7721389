package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ZOrderOps

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
  *    predicates on that key (exact for a single-column key,
  *    prefix-ordered for composites — the trailing columns span their
  *    full range in every file);
  *  - optional `zOrderBy` columns cluster on a space-filling curve
  *    instead: each column is bucketed linearly over its [min, max]
  *    (one cheap agg job for the bounds) and the bucket ids are
  *    bit-interleaved by the codegen'd [[graft.functions.ZOrderKey]];
  *    range-partitioning + sorting on the Morton key gives every file
  *    narrow min/max bounds in EVERY clustered dimension, so
  *    selective predicates on ANY of them prune files — the
  *    multi-column pruning a lexicographic sort cannot provide.
  */
object Compaction {

  /** Rewrite `inDir` (parquet) into `outDir` as size-targeted files.
    * Returns the number of files written. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              advisoryBytes: Long = 128L * 1024 * 1024,
              maxRecordsPerFile: Long = 0L,
              clusterBy: Seq[String] = Nil,
              zOrderBy: Seq[String] = Nil): Long = {
    require(clusterBy.isEmpty || zOrderBy.isEmpty,
      "pass clusterBy (range) or zOrderBy (space-filling curve), not both")
    // The advisory size is set on a CLONED session (same SparkContext,
    // isolated SQL conf): a long compaction must not re-plan every
    // concurrent AQE query in the caller's session with its advisory
    // size, and overlapping compact() calls must not race a shared
    // save/restore. The clone INHERITS the caller's runtime confs —
    // session timezone, ANSI mode, AQE tweaks — so compaction runs under
    // the caller's SQL semantics, just with its own advisory size
    // (newSession alone starts from builder-time config and would
    // silently drop them; cloneSession is private[sql], so the copy is
    // explicit — modifiable runtime confs only, non-settable statics
    // skipped).
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try s.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisoryBytes.toString)
    locally {
      val df = s.read.parquet(inDir)
      val shaped: DataFrame =
        if (zOrderBy.nonEmpty) {
          val z = "__graft_z"
          df.withColumn(z, zKey(df, zOrderBy))
            .repartitionByRange(col(z))
            .sortWithinPartitions(col(z))
            .drop(z) // projection above the sort — file order/bounds keep
        }
        else if (clusterBy.isEmpty) df.hint("rebalance")
        else df.repartitionByRange(clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      val writer = shaped.write.mode("overwrite")
      (if (maxRecordsPerFile > 0)
         writer.option("maxRecordsPerFile", maxRecordsPerFile)
       else writer)
        .parquet(outDir)
      countFiles(spark, outDir)
    }
  }

  /** Morton key for `cols`: each column linearly bucketed over its
    * global [min, max] (ONE agg job for all bounds — O(cols) values on
    * the driver), bucket count capped so every id fits its interleaved
    * bit budget. Nulls bucket to 0 (they cluster together at the curve
    * origin). */
  private def zKey(df: DataFrame, cols: Seq[String]): Column = {
    // fail fast on non-orderable-as-double columns — a silent all-null
    // cast would drop the dimension from the curve while the caller
    // believes files are bounded in it (same contract as Prefix.sliceKey)
    cols.foreach { c =>
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType => ()
        case org.apache.spark.sql.types.TimestampType | org.apache.spark.sql.types.DateType => ()
        case other => throw new IllegalArgumentException(
          s"zOrderBy column '$c' must be numeric, timestamp, or date (got $other)")
      }
    }
    val nBuckets = 1L << math.min(16, 63 / cols.length)
    // one pass for all columns' bounds
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c).cast("double")).as(s"mn$i"), max(col(c).cast("double")).as(s"mx$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) lit(0L) // empty/all-null
      else {
        val mn = row.getDouble(2 * i)
        val mx = row.getDouble(2 * i + 1)
        if (mx <= mn) lit(0L) // constant column: single bucket
        else {
          val wb = width_bucket(col(c).cast("double"), lit(mn), lit(mx), lit(nBuckets)) - 1
          coalesce(least(greatest(wb, lit(0L)), lit(nBuckets - 1)), lit(0L))
        }
      }
    }
    ZOrderOps.zOrderKey(buckets: _*)
  }

  /** Parquet data files under `dir` (driver-side listing — maintenance
    * metadata, not a data path). */
  def countFiles(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
