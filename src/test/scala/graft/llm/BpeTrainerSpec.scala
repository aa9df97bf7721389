package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** BPE trainer semantics: the bracketed-symbol string encoding must make
  * literal `replace` EQUAL greedy list-BPE merging. A scalar reference
  * implementation (symbol lists, the published algorithm) runs next to
  * the operator on fixtures chosen to break naive encodings:
  *  - overlap:  `aaa` merges only the FIRST `(a,a)` (greedy)
  *  - adjacency: `abab` merges BOTH `(a,b)` pairs in one pass
  *  - suffix false-match: pair `(a,b)` must not fire inside `ba b`
  *  - merged-symbol pairs: later rounds merge against earlier outputs
  */
class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scalar greedy list-BPE: the published algorithm, word-count
    * weighted, ties broken on the wrapped `<l><r>` string ascending. */
  private def referenceBpe(words: Seq[String], merges: Int): Seq[(Int, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupBy(identity).map { case (w, ws) =>
        w.toVector.map(_.toString) -> ws.size.toLong
      }
    (1 to merges).map { step =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      assert(counts.nonEmpty, s"reference exhausted at step $step")
      val (l, r) = counts.toSeq
        .minBy { case ((l, r), n) => (-n, s"<$l><$r>") }._1
      val n = counts((l, r))
      vocab = vocab.groupMapReduce { case (syms, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }(_._2)(_ + _)
      (step, s"<$l><$r>", n)
    }
  }

  private def trainOn(words: Seq[String], merges: Int): Seq[(Int, String, Long)] = {
    import spark.implicits._
    val docs = Seq(1L -> words.mkString(" ")).toDF("doc_id", "text")
    BpeTrainer.train(docs, merges)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
  }

  test("greedy overlap: aaa merges only the first pair per pass") {
    // 3 copies of "aaa": round 1 pair (a,a) has count 2*3=6 (greedy:
    // one merge per word), leaving [aa, a]; round 2 merges (aa, a).
    val words = Seq.fill(3)("aaa")
    val got = trainOn(words, 2)
    assert(got == referenceBpe(words, 2))
    assert(got == Seq((1, "<a><a>", 6L), (2, "<aa><a>", 3L)))
  }

  test("adjacent repeats: abab merges both (a,b) pairs in one pass") {
    // "abab" x2 + tiebreak fodder: (a,b) count = 2 per word (both
    // occurrences merge in the same pass — a shared-separator string
    // encoding would merge only one).
    val words = Seq.fill(2)("abab")
    val got = trainOn(words, 2)
    assert(got == referenceBpe(words, 2))
    assert(got.head == ((1, "<a><b>", 4L)))
    // after round 1 every word is [ab, ab] -> round 2 merges (ab, ab)
    assert(got(1) == ((2, "<ab><ab>", 2L)))
  }

  test("suffix false-match: pair (a,b) never fires inside <ba><b>") {
    // Corpus: "ab" x3 makes (a,b) win round 1; "bab" x2 tokenizes to
    // [b,a,b] whose (a,b) AT POSITION 2 is legit, but after its own
    // merge the word is [b, ab] — and "bab"'s leading (b,a) must not
    // be corrupted. A raw (unbracketed) replace of "ab" would also hit
    // the "b ab" boundary string. Reference and operator must agree
    // on every round.
    val words = Seq.fill(3)("ab") ++ Seq.fill(2)("bab")
    val got = trainOn(words, 2)
    assert(got == referenceBpe(words, 2))
    assert(got.head == ((1, "<a><b>", 5L))) // 3 from "ab", 2 from "bab"
    assert(got(1) == ((2, "<b><ab>", 2L))) // the bab remnant
  }

  test("merged symbols pair in later rounds and ties break on pair string") {
    val words = Seq.fill(4)("stst") ++ Seq.fill(4)("stop") ++ Seq.fill(3)("post")
    val got = trainOn(words, 4)
    assert(got == referenceBpe(words, 4))
    // round 1: (s,t) appears in every word: 2*4 + 4 + 3 = 15
    assert(got.head == ((1, "<s><t>", 15L)))
  }

  test("encodeCounts matches a scalar encode with the learned merges") {
    import spark.implicits._
    val docsWords = Seq(
      1L -> Seq("stst", "stop", "stop", "post"),
      2L -> Seq("post", "stst", "ab"),
      3L -> Seq("ab", "ab", "ab"))
    val docs = docsWords
      .map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
    val merges = BpeTrainer.learnMerges(docs, 3)
    // scalar greedy application of the same merges, in order
    def encode(w: String): Vector[String] =
      merges.foldLeft(w.toVector.map(_.toString)) { case (syms, (_, pr, _)) =>
        val Array(l, r) = pr.stripPrefix("<").stripSuffix(">").split("><")
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }
    val want = docsWords.map { case (id, ws) =>
      (id, ws.size.toLong, ws.map(_.length.toLong).sum,
        ws.map(w => encode(w).size.toLong).sum)
    }.sortBy(_._1)
    val got = BpeTrainer.encodeCounts(docs, merges)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == want)
    // tokens strictly compressed vs chars, never below word count
    got.foreach { case (_, nw, nc, nt) => assert(nt < nc && nt >= nw) }
  }

  test("matches the committed q154 oracle end-to-end on the fixture corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    import spark.implicits._
    val got = BpeTrainer.train(docs, 4).as[(Int, String, Long)].collect().toSeq
    // reference on the same tokenization (letter runs of lower(text))
    val words = docs
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .as[String].collect().toSeq
    assert(got == referenceBpe(words, 4))
  }
}
