package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[SubstringDedup]] contract pins, on hand-computable fixtures (the
  * q157/q159/q160 oracles gate the end-to-end forms; this spec pins the
  * operator semantics a user programs against). */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("windowHashes: positions are 0-based, short docs contribute nothing") {
    val w = SubstringDedup.windowHashes(
      docs(1L -> "a b c d", 2L -> "a b c"), 3).collect()
    assert(w.count(_.getLong(0) == 1L) == 2) // 4 tokens, n=3 -> pos 0,1
    assert(w.count(_.getLong(0) == 2L) == 1)
    assert(w.filter(_.getLong(0) == 1L).map(_.getLong(1)).sorted.toSeq == Seq(0L, 1L))
    // identical windows hash identically across docs ("a b c" at pos 0)
    val h1 = w.filter(r => r.getLong(0) == 1L && r.getLong(1) == 0L).head.getLong(2)
    val h2 = w.filter(r => r.getLong(0) == 2L).head.getLong(2)
    assert(h1 == h2)
  }

  test("mergeSpans: overlap and touching coalesce, a gap > n splits") {
    // n=3: positions 0,2 overlap; 5 touches 2 (5-2<=3); 9 is a gap (9-5>3)
    val spans = SubstringDedup.mergeSpans(
      Seq((1L, 0L), (1L, 2L), (1L, 5L), (1L, 9L)).toDF("doc_id", "pos"), 3)
      .orderBy($"span_start").collect()
    assert(spans.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0L, 8L, 8L), (9L, 12L, 3L))) // [0,8) then [9,12)
    assert(spans.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // span_id in order
  }

  test("dupSpans counts intra-doc repeats as duplication") {
    // "x y z" appears twice INSIDE doc 1 (pos 0 and 4); nothing cross-doc
    val wins = SubstringDedup.windowHashes(
      docs(1L -> "x y z q x y z", 2L -> "p q r s t"), 3)
    val spans = SubstringDedup.dupSpans(wins, 3).collect()
    assert(spans.map(_.getLong(0)).toSet == Set(1L))
    // pos 0 and 4: gap 4 > 3 -> two spans [0,3) and [4,7)
    assert(spans.map(r => (r.getLong(2), r.getLong(3))).toSet ==
      Set((0L, 3L), (4L, 7L)))
  }

  test("survivorCuts: first occurrence by (doc_id, pos) keeps its copy") {
    val wins = SubstringDedup.windowHashes(docs(
      1L -> "a b c d e",   // canonical holder of "a b c" (doc 1 < doc 2)
      2L -> "a b c d e",   // full duplicate -> every window non-canonical
      3L -> "z z z z z"), 3)
    val cuts = SubstringDedup.survivorCuts(wins, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!cuts.contains(1L)) // canonical: nothing removed
    assert(cuts(2L) == 5L) // windows 0,1,2 merge -> [0, 5): whole doc
    // doc 3: "z z z" at pos 0,1,2 — pos 0 is canonical, 1 and 2 are cut
    assert(cuts(3L) == 4L) // [1, 5)
  }

  test("applyCuts: splice, byte-identical round-trip, full cut, empty tokens") {
    val corpus = docs(
      1L -> "a b c d e",     // canonical — untouched
      2L -> "a b c d e",     // full duplicate — fully cut
      3L -> "p  q r",        // no cuts + CONSECUTIVE separators: empty token
      4L -> "x y a b c d e z w") // interior duplicate of doc 1's window
    val wins = SubstringDedup.windowHashes(corpus, 3)
    val spans = SubstringDedup.survivorSpans(wins, 3)
    val out = SubstringDedup.applyCuts(corpus, spans).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("a b c d e", 5L))) // canonical: byte-identical
    assert(out(2L) == (("", 0L))) // fully cut -> empty string, 0 kept
    assert(out(3L) == (("p  q r", 4L))) // empty token preserved exactly
    // doc 4: windows at pos 2..4 ("a b c".."c d e") are non-canonical
    // -> span [2, 7) cut; survivors "x y" + "z w"
    assert(out(4L) == (("x y z w", 4L)))
    // SQL surface + arity failure
    val row = spark.sql(
      """SELECT remove_token_spans('a b c d',
        |  array(named_struct('s', 1L, 'e', 3L))) AS t""".stripMargin)
      .collect().head
    assert(row.getString(0) == "a d")
    val e = intercept[Exception](
      spark.sql("SELECT remove_token_spans('a')"))
    assert(e.getMessage.contains("remove_token_spans"))
  }

  test("detect -> cut iterates to a duplication-free fixpoint") {
    // Cutting can CREATE new windows (the bytes on either side of a cut
    // become adjacent), so one pass is not guaranteed dup-free — the
    // production pipeline iterates. Pin that the loop terminates and
    // the fixpoint has ZERO duplicated windows, on a corpus built to
    // need more than one round: docs 2 and 3 share "m1 m2 m3" only
    // AFTER their different middles are cut as duplicates of doc 1.
    val n = 3
    var corpus = docs(
      1L -> "a b c d e f g h",
      2L -> "m1 a b c d e m2 m3",
      3L -> "m1 d e f g h m2 m3")
    var rounds = 0
    var done = false
    while (!done && rounds < 6) {
      val wins = SubstringDedup.windowHashes(corpus, n)
      val spans = SubstringDedup.survivorSpans(wins, n)
      if (spans.isEmpty) done = true
      else {
        corpus = SubstringDedup.applyCuts(corpus, spans)
          .select($"doc_id", $"clean_text".as("text"))
        rounds += 1
      }
    }
    assert(done, s"no fixpoint within $rounds rounds")
    assert(rounds >= 1) // the fixture genuinely required cutting
    // fixpoint property: no window occurs twice anywhere
    val residual = SubstringDedup.dupSpans(
      SubstringDedup.windowHashes(corpus, n), n).count()
    assert(residual == 0L)
    // canonical doc 1 survived untouched through every round
    val d1 = corpus.filter($"doc_id" === 1L).collect().head.getString(1)
    assert(d1 == "a b c d e f g h")
  }

  test("contaminationSpans: only benchmark-matching ranges are flagged") {
    val train = docs(10L -> "a b c d e f", 11L -> "u v w x y z")
    val bench = docs(99L -> "c d e")
    val wins = SubstringDedup.windowHashes(train, 3)
    val idx = SubstringDedup.windowIndex(bench, 3)
    val spans = SubstringDedup.contaminationSpans(wins, idx, 3).collect()
    assert(spans.length == 1)
    val r = spans.head
    assert((r.getLong(0), r.getLong(2), r.getLong(3)) == ((10L, 2L, 5L)))
  }
}
