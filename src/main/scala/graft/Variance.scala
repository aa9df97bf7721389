package graft

import org.apache.spark.sql.SparkSession

/** Run-to-run variance probe: the recurring confusion across rounds has
  * been wall-time DRIFT on unchanged queries (suite totals 104.6 s vs
  * 123.6 s in back-to-back same-code sessions; the hot-key probe's
  * absolute seconds moving ~25% between runs while every ordering
  * held). This measures the noise instead of re-litigating it: each
  * named query runs `reps` times isolated (state reset + GC between
  * runs, same discipline as [[Bench]]'s isolated re-measure), and the
  * artifact reports min/median/max + spread per query. Numbers within
  * the measured spread are machine noise, not regressions — the
  * comparison a reviewer should make is against MIN (steady-state plan
  * cost), with median−min as the session-noise band.
  *
  *   SPARK_GRAFT_SF_DIR=… runMain graft.Variance 5 q115_pagerank q134_…
  */
object Variance {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q115_pagerank", "q134_ivfpq_trained", "q127_triangles",
        "q91_sketch_error", "q145_image_resize", "q1_pricing_summary")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def reset(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      System.gc()
    }
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)

    val rows = names.map { q =>
      val fn = SparkEntry.queries(q)
      // one unmeasured warmup (JIT + codegen + file-index caches)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[variance] warmup $q: ${e.getMessage}") }
      reset()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        reset()
        s
      }.sorted
      // true median: average the two middle elements when reps is even
      // (times(n/2) alone is the upper-middle — biased high for reps=4/6)
      val med =
        if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2

      val row = s"""{"query":"$q","reps":$reps,"min":${fmt(times.head)},""" +
        s""""median":${fmt(med)},"max":${fmt(times.last)},""" +
        s""""spread_pct":${fmt((times.last / times.head - 1) * 100)},""" +
        s""""times":[${times.map(fmt).mkString(",")}]}"""
      println(row)
      row
    }
    sys.env.get("SPARK_GRAFT_VARIANCE_OUT").foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        s"""{"sf":"$sfDir","reps":$reps,"queries":[\n${rows.mkString(",\n")}\n]}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
