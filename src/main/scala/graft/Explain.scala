package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: `sbt "runMain graft.Explain q2_join_revenue ..."`
  * prints the formatted physical plan of each named query (all queries
  * when no args) against SPARK_GRAFT_SF_DIR. Used to keep every operator
  * on its intended plan shape: pushed filters, pruned schemas, broadcast
  * dims, single-shuffle windows, WindowGroupLimit top-k. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Tables.configure(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"======== $q")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
