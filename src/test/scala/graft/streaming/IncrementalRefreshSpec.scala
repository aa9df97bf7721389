package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Incremental materialized-aggregate maintenance without a table
  * format: a streaming feed upserts a partitioned parquet aggregate via
  * foreachBatch + DYNAMIC partition overwrite — each micro-batch reads
  * the stored values for the partitions it touches, merges the batch
  * delta, and rewrites ONLY those partitions. Untouched partitions'
  * files are never rewritten (asserted on the physical file listing) —
  * at 100 TB that is the difference between rewriting a table and
  * rewriting one bucket. The maintained table stays equal to the
  * from-scratch batch aggregate after every micro-batch. */
class IncrementalRefreshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dynamic partition overwrite upserts only the touched buckets") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val table = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val prevMode = sp.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    sp.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // seed: totals for users 1..4 across buckets 0..3 (bucket = id % 4)
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
        .toDF("user_id", "total")
        .withColumn("bucket", ($"user_id" % 4).cast("int"))
        .write.mode("overwrite").partitionBy("bucket").parquet(table)

      val mem = MemoryStream[(Long, Double)]
      val q = mem.toDS().toDF("user_id", "amount").writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          val delta = df.groupBy($"user_id").agg(sum($"amount").as("add"))
            .withColumn("bucket", ($"user_id" % 4).cast("int"))
          val touched = delta.select($"bucket").distinct().as[Int].collect().toSeq
          val existing = sp.read.parquet(table)
            .filter($"bucket".isin(touched: _*))
          // materialize BEFORE the write: the merge reads the same path
          // the overwrite replaces (the classic self-overwrite hazard)
          val merged = existing.as("e")
            .join(delta.as("d"), Seq("user_id", "bucket"), "full_outer")
            .select($"user_id",
              (coalesce($"e.total", lit(0.0)) + coalesce($"d.add", lit(0.0)))
                .as("total"),
              $"bucket")
            .localCheckpoint()
          // dynamic mode: overwrite replaces ONLY partitions present in
          // `merged` — the other buckets' files stay as they are
          merged.write.mode("overwrite").partitionBy("bucket").parquet(table)
          ()
        }.start()

      def files(bucket: Int): Set[String] = {
        val dir = java.nio.file.Paths.get(table, s"bucket=$bucket")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(dir).iterator().asScala
          .map(p => p.getFileName.toString + ":" + java.nio.file.Files.size(p))
          .filter(_.contains("parquet")).toSet
      }
      val bucket0Before = files(0)
      val bucket3Before = files(3)

      try {
        // touches users 1 and 5 -> bucket 1 only
        mem.addData((1L, 5.0), (5L, 7.0))
        q.processAllAvailable()
        // touches user 2 -> bucket 2 only
        mem.addData((2L, 1.0))
        q.processAllAvailable()
      } finally q.stop()

      val got = sp.read.parquet(table)
        .select($"user_id", $"total").as[(Long, Double)]
        .collect().toMap
      assert(got == Map(1L -> 15.0, 2L -> 21.0, 3L -> 30.0, 4L -> 40.0, 5L -> 7.0))

      // buckets 0 and 3 were never touched: identical physical files
      assert(files(0) == bucket0Before)
      assert(files(3) == bucket3Before)
    } finally {
      prevMode match {
        case Some(m) => sp.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => sp.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
