package graft.llm

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.SubwordStats]] / [[graft.functions.SpaceTokenStats]]
  * parity: the single-pass byte-scan expressions must agree EXACTLY with
  * the composed-builtin formulations they replaced in q39/q41/q75 (which
  * are still what the DuckDB oracle runs), on adversarial strings and on
  * bulk pseudo-random text — including empty tokens, repeated bigrams,
  * uppercase folding, multi-byte UTF-8, and documents big enough to force
  * the open-addressing tables through their growth path. */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val adversarial = Seq(
    "",
    " ",
    "   ",
    "a",
    "a b",
    "a  b",
    " a b ",
    "a a a a",
    "the cat the cat the cat",
    "ab12cd 12ab 999 7 7 7",
    "Hello WORLD hello world HELLO",
    "!!! ??? !!! a-b_c",
    "héllo wörld héllo",
    "ÉÉ éé Éé",
    "日本語 テスト 日本語",
    "mixed 日本 text é!",
    "a\tb\nc", // non-space whitespace is NOT a separator for either form
    "0a1b2c3",
    "trailing space ",
    "  leading",
    // force SliceTable growth (>64 distinct tokens / bigrams)
    (1 to 300).map(i => s"tok$i").mkString(" "),
    // heavy repetition: dup-token + top-bigram paths
    ("spam ham " * 200).trim)

  private val bulk: Seq[String] = {
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "ab c1 .é   XY 9"
    (1 to 400).map { _ =>
      val len = rnd.nextInt(120)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
  }

  private def docs = (adversarial ++ bulk).toDF("text")

  test("subword_stats matches the regex + list-lambda formulation") {
    val composed = docs
      .select($"text",
        regexp_extract_all(lower($"text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)).as("toks"))
      .select($"text",
        size($"toks").cast("long").as("n_subtokens"),
        size(array_distinct($"toks")).cast("long").as("n_distinct"),
        array_max(transform($"toks", t => length(t))).cast("long").as("max_token_len"),
        size(filter($"toks", t => t.rlike("^[0-9]+$"))).cast("long").as("n_numeric"))
    val scanned = docs
      .select($"text", call_function("subword_stats", $"text").as("st"))
      .select($"text", $"st.n_subtokens", $"st.n_distinct",
        $"st.max_token_len", $"st.n_numeric")
    val exp = composed.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    scanned.collect().foreach { r =>
      assert(r.toSeq.tail == exp(r.getString(0)),
        s"subword_stats mismatch on ${r.getString(0).take(60)}")
    }
  }

  test("space_token_stats matches the explode + aggregate formulation") {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "on")
    val composed = docs
      .select($"text", split($"text", " ").as("w"))
      .select($"text",
        size($"w").cast("long").as("n_tok"),
        size(array_distinct($"w")).cast("long").as("n_distinct"),
        size(filter($"w", t => t.isin(stops.map(lit): _*))).cast("long").as("stop_hits"),
        when(size($"w") >= 2, // sequence(1, 0) is DESCENDING in Spark — guard n_tok < 2
          array_max(transform( // per-bigram count via the array forms
            expr("transform(sequence(1, size(w) - 1), i -> concat_ws(' ', slice(w, i, 2)))"),
            bg => size(filter(
              expr("transform(sequence(1, size(w) - 1), i -> concat_ws(' ', slice(w, i, 2)))"),
              x => x === bg))))).cast("long").as("top_bg"))
    val scanned = docs
      .select($"text", call_function("space_token_stats", $"text",
        typedLit(stops)).as("st"))
      .select($"text", $"st.n_tok", $"st.n_distinct", $"st.stop_hits", $"st.top_bg")
    val exp = composed.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    scanned.collect().foreach { r =>
      assert(r.toSeq.tail == exp(r.getString(0)),
        s"space_token_stats mismatch on ${r.getString(0).take(60)}")
    }
  }

  test("space_token_counts matches the explode + GROUP BY formulation") {
    // duplicate texts exist in the fixture — key by doc, not text value
    val ids = (adversarial ++ bulk).zipWithIndex.map(_.swap).toDF("id", "text")
    val composed = ids
      .select($"id", explode(split($"text", " ")).as("term"))
      .groupBy($"id", $"term").agg(count(lit(1)).as("tf"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (t, rows) =>
        t -> rows.map(r => (r.getString(1), r.getLong(2))).toSet
      }
    val scanned = ids
      .select($"id",
        explode(call_function("space_token_counts", $"text")).as("tc"))
      .select($"id", $"tc.term", $"tc.tf")
      .collect()
      .groupBy(_.getInt(0))
      .map { case (t, rows) =>
        t -> rows.map(r => (r.getString(1), r.getLong(2))).toSet
      }
    assert(scanned.keySet == composed.keySet)
    scanned.foreach { case (t, pairs) =>
      assert(pairs == composed(t), s"space_token_counts mismatch on doc $t")
    }
    // element order is deterministic for identical input
    val twice = Seq("b a b c a", "b a b c a").toDF("text")
      .select(call_function("space_token_counts", $"text").as("tc"))
      .collect()
    assert(twice(0).getSeq[Any](0) == twice(1).getSeq[Any](0))
  }

  test("space_bigram_counts matches the slide + explode + GROUP BY formulation") {
    val ids = (adversarial ++ bulk).zipWithIndex.map(_.swap).toDF("id", "text")
    val composed = ids
      .select($"id", split($"text", " ").as("w"))
      .filter(size($"w") >= 2) // sequence(1, 0) is DESCENDING in Spark
      .select($"id", explode(
        expr("transform(sequence(1, size(w) - 1), i -> concat_ws(' ', slice(w, i, 2)))")).as("bg"))
      .groupBy($"id", $"bg").agg(count(lit(1)).as("tf"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (t, rows) =>
        t -> rows.map(r => (r.getString(1), r.getLong(2))).toSet
      }
    val scanned = ids
      .select($"id",
        explode(call_function("space_bigram_counts", $"text")).as("bc"))
      .select($"id", $"bc.bg", $"bc.tf")
      .collect()
      .groupBy(_.getInt(0))
      .map { case (t, rows) =>
        t -> rows.map(r => (r.getString(1), r.getLong(2))).toSet
      }
    assert(scanned.keySet == composed.keySet) // <2-token docs absent from BOTH
    scanned.foreach { case (t, pairs) =>
      assert(pairs == composed(t), s"space_bigram_counts mismatch on doc $t")
    }
    // element order is deterministic for identical input
    val twice = Seq("b a b a c", "b a b a c").toDF("text")
      .select(call_function("space_bigram_counts", $"text").as("bc"))
      .collect()
    assert(twice(0).getSeq[Any](0) == twice(1).getSeq[Any](0))
    // SQL surface + arity failure
    val row = spark.sql("SELECT space_bigram_counts('a b a b') AS b").collect().head
    assert(row.getSeq[Any](0).size == 2) // 'a b' (tf 2), 'b a' (tf 1)
    val e = intercept[Exception](spark.sql("SELECT space_bigram_counts('a', 2)"))
    assert(e.getMessage.contains("space_bigram_counts"))
  }

  test("null text yields null structs, not errors") {
    val df = Seq[(Integer, String)]((1, null), (2, "a b")).toDF("id", "text")
    val out = df.select(
        call_function("subword_stats", $"text").as("sw"),
        call_function("space_token_stats", $"text", typedLit(Seq.empty[String])).as("sp"))
      .orderBy($"sw".isNull.desc)
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(!out(1).isNullAt(0) && !out(1).isNullAt(1))
  }

  test("SQL surface and analysis-time failure modes") {
    val row = spark.sql(
      """SELECT s.*, p.* FROM (SELECT subword_stats('Ab1 !!') AS s,
        |  space_token_stats('a a b', array('a')) AS p)""".stripMargin)
      .collect().head
    assert(row.toSeq == Seq(4L, 3L, 2L, 1L, 3L, 2L, 2L, 1L))
    // wrong arity fails at analysis naming the function
    val e1 = intercept[Exception](spark.sql("SELECT subword_stats('a', 'b')"))
    assert(e1.getMessage.contains("subword_stats"))
    // non-foldable stopwords fail at analysis, not at runtime
    val e2 = intercept[AnalysisException] {
      Seq("a").toDF("text")
        .select(call_function("space_token_stats", $"text", array($"text")))
        .collect()
    }
    assert(e2.getMessage.contains("foldable"))
    // wrong input type fails at analysis
    val e3 = intercept[AnalysisException] {
      Seq(1L).toDF("x").select(call_function("subword_stats", $"x")).collect()
    }
    assert(e3.getMessage.contains("string"))
  }
}
