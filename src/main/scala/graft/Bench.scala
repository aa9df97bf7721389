package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query executed end-to-end
  * against SPARK_GRAFT_SF_DIR, full materialization through the `noop`
  * sink (unlike `.count()`, noop cannot prune projections or skip
  * window/sort work), one JSON line on stdout. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val warmup = pass().map(_._2).sum // JVM/codegen/classloading warm-up
    val results = pass()              // steady-state, reported
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warmup_sec":$warmup,"sf":"$sfDir"}""")
    spark.stop()
  }
}
