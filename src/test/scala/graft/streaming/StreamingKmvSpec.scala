package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming KMV ≡ batch sketch over every stream prefix: after each
  * micro-batch, the per-group estimate must equal the independently
  * re-derived min-k estimator over all rows seen so far — bounded state
  * (≤ 64 longs per group) standing in for unbounded count(DISTINCT). */
class StreamingKmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val P = 2147483647.0

  /** Independent re-derivation (plain Scala, not the operator's code):
    * k smallest distinct hashes → (k-1)·P/h_k, exact below k. */
  private def expected(hs: Seq[Long]): (Double, Int) = {
    val mink = hs.distinct.sorted.take(64)
    val est =
      if (mink.length < 64) mink.length.toDouble
      else (63.0 * P) / mink.last.toDouble
    (est, mink.length)
  }

  test("streaming per-group estimates match batch sketch after every micro-batch") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(5)
    // 3 waves per group: group "a" crosses the k=64 boundary (estimator
    // path), group "b" stays exact; duplicates across waves on purpose
    def wave(g: String, n: Int): Seq[(String, Long)] =
      Seq.fill(n)((g, rnd.nextInt(Int.MaxValue).toLong))
    val w1 = wave("a", 50) ++ wave("b", 10)
    val w2 = wave("a", 60) ++ w1.filter(_._1 == "a").take(20) // replays dups
    val w3 = wave("a", 40) ++ wave("b", 20)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val mem = MemoryStream[(String, Long)]
    val got = scala.collection.mutable.Map.empty[String, (Double, Int)]
    val q = StreamingKmv.estimates(mem.toDF().toDF("group", "h"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[StreamingKmv.KmvEstimate], _: Long) =>
        ds.collect().foreach(e => got(e.group) = (e.est_distinct, e.sketch_size))
      }
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      var seen = Seq.empty[(String, Long)]
      for (w <- Seq(w1, w2, w3)) {
        mem.addData(w: _*)
        q.processAllAvailable()
        seen ++= w
        for (g <- Seq("a", "b")) {
          val hs = seen.collect { case (`g`, h) => h }
          if (hs.nonEmpty)
            assert(got(g) == expected(hs), s"group $g after ${seen.size} rows")
        }
      }
      // the crossing really happened: "a" is on the estimator path with
      // full sketch, "b" still exact
      assert(got("a")._2 == 64 && got("b")._2 < 64)
    } finally q.stop()
  }
}
