package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[QualityClassifier]] learns when signal EXISTS — the property the
  * q164 fixture gate cannot show (the driver fixture's sources share one
  * token distribution; an exact NB log-odds-sum reference also scores
  * ~52% held-out there, so chance-level is the honest fixture result).
  * Here the two classes draw from genuinely different vocabularies and
  * the trained scorer must separate held-out docs near-perfectly, with
  * the intercept doing its job even under 4:1 class imbalance and
  * 3:1 document-length skew (the regime where the untrained
  * posterior-½ cut degenerates to keep-everything). */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  /** Deterministic word-soup generator: doc i of class `vocab` samples
    * `len` words by a fixed affine hash — no RNG, reproducible. */
  private def doc(vocab: IndexedSeq[String], i: Int, len: Int): String =
    (0 until len).map(k => vocab(((i * 31 + k * 17 + i * k) % vocab.size + vocab.size) % vocab.size))
      .mkString(" ")

  test("separates held-out docs when class vocabularies differ (imbalanced, length-skewed)") {
    // "curated" vocabulary vs "crawl" vocabulary: 12 shared words +
    // 12 class-specific each — overlapping but genuinely different
    // distributions (roughly half of each doc's tokens are class-unique).
    val shared = (0 until 12).map(i => s"common$i")
    val posV = shared ++ (0 until 12).map(i => s"curated$i")
    val negV = shared ++ (0 until 12).map(i => s"spam$i")
    // 4:1 imbalance and 3:1 length skew: 40 long positive docs, 160
    // short negative docs. Even ids train, odd ids evaluate.
    val rows =
      (0 until 40).map(i => (i.toLong, doc(posV, i, 90), 1)) ++
      (0 until 160).map(i => (1000L + i, doc(negV, i, 30), -1))
    val docs = rows.toDF("doc_id", "text", "label")

    val bt = QualityClassifier.bucketed(docs)
    val w = QualityClassifier.weights(spark, bt,
      col("label") =!= 0 && col("doc_id") % 2 === 0)
    val sc = QualityClassifier.score(bt, w)
    val trainLabels = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), (col("label") === 1).as("is_pos"))
    val thr = QualityClassifier.threshold(sc, trainLabels)
    val thrV = thr.head().getLong(0)

    val heldOut = docs.filter(col("doc_id") % 2 === 1)
      .join(sc, "doc_id")
      .select(col("label"), (col("score_ppm") >= thrV).as("keep"))
      .collect()
    val (pos, neg) = heldOut.partition(_.getInt(0) == 1)
    val posRecall = pos.count(_.getBoolean(1)).toDouble / pos.length
    val negReject = neg.count(!_.getBoolean(1)).toDouble / neg.length
    assert(pos.length == 20 && neg.length == 80)
    assert(posRecall >= 0.9, s"positive recall $posRecall (threshold $thrV)")
    assert(negReject >= 0.9, s"negative rejection $negReject (threshold $thrV)")
  }

  test("weight table is complete, bounded, and prior-valued on unseen buckets") {
    val docs = Seq(
      (0L, "alpha alpha beta", 1),
      (1L, "gamma delta delta", -1),
      (2L, "alpha beta gamma unseen", 0)).toDF("doc_id", "text", "label")
    val w = QualityClassifier.weights(spark, QualityClassifier.bucketed(docs),
      col("label") =!= 0)
    assert(w.count() == QualityClassifier.Buckets)
    val (lo, hi) = w.agg(min("w"), max("w")).as[(Long, Long)].head()
    assert(lo >= 0L && hi <= 1000000L)
    // both seed classes saw 3 tokens → an untouched bucket's weight is
    // the symmetric prior: (1·(3+B)·1e6) div ((3+B) + (3+B)) = 500000
    val unseen = w.join(
      QualityClassifier.bucketed(docs).select("b").distinct(),
      Seq("b"), "left_anti")
    assert(unseen.filter(col("w") =!= 500000L).count() == 0)
  }

  test("a corpus with zero labeled docs RAISES at threshold time, not a silent reject-all") {
    // ADVICE r9: a null threshold made `score_ppm >= thr` evaluate null
    // downstream — keep_flag=0 for every document, a silent reject-all.
    // threshold() now raises in-plan when either class has 0 docs.
    val docs = Seq((0L, "alpha beta", 0), (1L, "gamma", 0))
      .toDF("doc_id", "text", "label")
    val bt = QualityClassifier.bucketed(docs)
    val w = QualityClassifier.weights(spark, bt, col("label") =!= 0)
    val sc = QualityClassifier.score(bt, w)
    val labels = docs.filter(col("label") =!= 0)
      .select(col("doc_id"), (col("label") === 1).as("is_pos"))
    val e = intercept[Exception] {
      QualityClassifier.threshold(sc, labels).head()
    }
    assert(e.getMessage.contains("training class has 0 labeled docs"))
  }
}
