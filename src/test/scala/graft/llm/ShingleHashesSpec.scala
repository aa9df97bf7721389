package graft.llm

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash

/** [[graft.functions.ShingleHashes]] parity: the single-scan byte-slice
  * hasher must agree EXACTLY with the composed-builtin formulation it
  * replaced in the MinHash chain (`split` → `transform`/`concat_ws` →
  * md5→hex→conv→mod per shingle), which is still what the DuckDB
  * oracle's `shinglesSql` + `md5ModSql` computes — including empty
  * tokens from consecutive / leading / trailing separators, multi-byte
  * UTF-8, and the under-n-tokens empty-array contract. */
class ShingleHashesSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val adversarial = Seq(
    "",
    " ",
    "   ",
    "a",
    "a b",
    "a b c",
    "a  b  c", // empty tokens participate in shingles
    " a b c ",
    "a b c d e",
    "the cat sat on the mat",
    "héllo wörld über straße",
    "日本語 テスト です よ",
    "mixed 日本 text é! ok",
    "a\tb c\nd e", // non-space whitespace stays inside tokens
    "trailing space x ",
    "  leading x",
    (1 to 300).map(i => s"tok$i").mkString(" "),
    ("dup gram dup " * 50).trim)

  private val bulk: Seq[String] = {
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "ab c1 .é   XY 9"
    (1 to 400).map { _ =>
      val len = rnd.nextInt(120)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
  }

  private def docs = (adversarial ++ bulk).toDF("text")

  /** The composed formulation — verbatim what `minsExpr`/`shingles` used
    * before the byte-scan expression. */
  private def composedHashes(n: Int) = {
    val w = split($"text", " ")
    when(size(w) >= n,
      transform(
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", slice(w, i, lit(n)))),
        s => PortableHash.md5Mod(s)))
      .otherwise(typedLit(Seq.empty[Long]))
  }

  test("shingle_hashes matches the split + concat_ws + md5 formulation, n=3") {
    val both = docs.select($"text",
        composedHashes(3).as("composed"),
        call_function("shingle_hashes", $"text", lit(3)).as("scanned"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"shingle_hashes mismatch on '${r.getString(0).take(60)}'")
    }
  }

  test("n=1 (unigrams) and n=2 (bigrams) agree too") {
    Seq(1, 2).foreach { n =>
      val both = docs.select($"text",
          composedHashes(n).as("composed"),
          call_function("shingle_hashes", $"text", lit(n)).as("scanned"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n mismatch on '${r.getString(0).take(60)}'")
      }
    }
  }

  test("values are the local md5ModLocal of the joined shingle") {
    val out = Seq("the cat sat on").toDF("text")
      .select(call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .collect().head.getSeq[Long](0)
    assert(out == Seq(
      PortableHash.md5ModLocal("the cat sat"),
      PortableHash.md5ModLocal("cat sat on")))
  }

  test("null text yields null, short docs yield empty arrays") {
    val out = Seq[(Integer, String)]((1, null), (2, "a b"), (3, "a b c"))
      .toDF("id", "text")
      .select($"id", call_function("shingle_hashes", $"text", lit(3)).as("hs"))
      .orderBy($"id")
      .collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getSeq[Long](1).isEmpty)
    assert(out(2).getSeq[Long](1).size == 1)
  }

  test("space_segments matches the sequence + slice + concat_ws formulation") {
    Seq(1, 3, 10).foreach { n =>
      val composed = docs.select($"text",
          expr(s"""transform(sequence(0, CAST(ceil(size(split(text, ' ')) / $n.0) AS INT) - 1),
                  |          i -> concat_ws(' ', slice(split(text, ' '), i * $n + 1, $n)))""".stripMargin)
            .as("segs"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      docs.select($"text",
          expr(s"transform(space_segments(text, $n), x -> x.seg)").as("segs"),
          expr(s"transform(space_segments(text, $n), x -> x.h)").as("hs"))
        .collect().foreach { r =>
          val t = r.getString(0)
          val segs = r.getSeq[String](1)
          assert(segs == composed(t), s"n=$n segments mismatch on '${t.take(60)}'")
          // hash = the portable md5 % P of the segment string
          assert(r.getSeq[Long](2) == segs.map(PortableHash.md5ModLocal),
            s"n=$n hashes mismatch on '${t.take(60)}'")
          // reassembly contract: joining all segments reproduces the doc
          assert(segs.mkString(" ") == t, s"n=$n round-trip broke on '${t.take(60)}'")
        }
    }
  }

  test("space_segments: empty text yields one empty segment, null stays null") {
    val out = Seq[(Integer, String)]((1, null), (2, ""), (3, "a"))
      .toDF("id", "text")
      .select($"id", call_function("space_segments", $"text", lit(10)).as("sa"))
      .orderBy($"id")
      .collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getSeq[Any](1).size == 1)
    assert(out(2).getSeq[Any](1).size == 1)
  }

  test("SQL surface and analysis-time failure modes") {
    val row = spark.sql("SELECT shingle_hashes('a b c d', 3) AS hs")
      .collect().head
    assert(row.getSeq[Long](0).size == 2)
    val e1 = intercept[Exception](spark.sql("SELECT shingle_hashes('a')"))
    assert(e1.getMessage.contains("shingle_hashes"))
    val e2 = intercept[AnalysisException] {
      Seq(("a", 2)).toDF("text", "n")
        .select(call_function("shingle_hashes", $"text", $"n")).collect()
    }
    assert(e2.getMessage.contains("foldable"))
    val e3 = intercept[AnalysisException] {
      spark.sql("SELECT shingle_hashes('a b c', 0)").collect()
    }
    assert(e3.getMessage.contains(">= 1"))
    val e4 = intercept[AnalysisException] {
      Seq(1L).toDF("x")
        .select(call_function("shingle_hashes", $"x", lit(3))).collect()
    }
    assert(e4.getMessage.contains("string"))
  }
}
