package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries._

/** Distributed BPE tokenizer TRAINING — the iterative half of the BPE
  * story (q39 applies a BPE-ish pre-tokenizer; q109 computes ONE
  * iteration's pair statistic; this learns the merge table itself, the
  * artifact a 100 TB corpus run exists to produce).
  *
  * Classic word-level BPE (Sennrich et al. 2016, public algorithm):
  * start from characters, repeatedly merge the most frequent adjacent
  * symbol pair, re-tokenize, repeat. The distributed shape:
  *
  *  1. ONE corpus-sized pass builds the word-frequency table — and it
  *     rides [[graft.functions.SpaceTokenCounts]], so the exchange
  *     carries per-document DISTINCT (term, tf) pairs, never raw text
  *     (the §8.12 discipline). Everything after runs on the vocabulary,
  *     which is sublinear in corpus size (Heaps' law) and stays
  *     DISTRIBUTED — at web scale the vocab is tens of millions of
  *     rows, far too big to collect, which is why single-node trainers
  *     stop scaling and this one exists.
  *  2. Per merge step: a map-side-combined pair count over the vocab
  *     (pair space bounded by observed adjacencies), a
  *     TakeOrderedAndProject argmax (ONE row to the driver — the merge
  *     decision itself, never data), and a map-only re-tokenization.
  *     K steps = K tiny bounded jobs; no step's cost depends on the
  *     corpus, only on the vocabulary.
  *
  * Tokenization state rides a flat string, each symbol wrapped as
  * `<sym>`: applying a merge is then ONE literal string `replace`
  * (codegen'd, no per-symbol array churn), and the wrapping makes
  * left-to-right non-overlapping string replacement EQUAL list-BPE
  * greedy merging — matches can never share characters (each match
  * consumes both full symbols including their own brackets), so
  * `<a><b><a><b>` merges BOTH pairs in one pass, `<a><a><a>` merges
  * only the first (greedy), and a pair `(a,b)` can never false-match
  * the SUFFIX of a longer symbol like `<ba><b>`. BpeTrainerSpec pins
  * all three adversarial cases against a hand-computed list-BPE.
  *
  * Determinism contract (shared with the DuckDB oracle, which unrolls
  * the same K rounds as MATERIALIZED CTEs): words are
  * `lower(text)` split on ' ' filtered to `^[a-z]+$` (so the bracket
  * alphabet is disjoint from symbols), argmax ties break on the
  * wrapped pair string ascending — binary collation in both engines.
  *
  * Returns the learned merge table: (step INT, pair STRING — the
  * wrapped `<l><r>` form, n BIGINT — the pair's corpus frequency when
  * it won).
  */
object BpeTrainer {

  /** The distributed word-frequency table with initial character
    * tokenization: (cnt BIGINT, toks STRING like `<f><a><s><t>`). */
  private[llm] def vocabulary(docs: DataFrame): DataFrame =
    docs
      .select(explode(call_function("space_token_counts", lower($"text"))).as("tc"))
      .select($"tc.term".as("word"), $"tc.tf".cast("long").as("tf"))
      .filter($"word".rlike("^[a-z]+$"))
      .groupBy($"word").agg(sum($"tf").as("cnt"))
      .select($"cnt", regexp_replace($"word", "(.)", "<$1>").as("toks"))

  /** Adjacent-pair frequencies over a tokenization state: (pr, n). */
  private[llm] def pairStats(vocab: DataFrame): DataFrame =
    vocab
      .select($"cnt", expr("regexp_extract_all(toks, '<([a-z]+)>', 1)").as("syms"))
      .filter(size($"syms") >= 2)
      .select($"cnt", explode(expr(
        """transform(sequence(1, size(syms) - 1),
          |  i -> concat('<', element_at(syms, i), '><', element_at(syms, i + 1), '>'))"""
          .stripMargin)).as("pr"))
      .groupBy($"pr").agg(sum($"cnt").as("n"))

  /** Learn `merges` BPE merges over the documents' `text` column. */
  def train(docs: DataFrame, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    // The vocab is the whole working set of every round — cache once.
    // (Bench/Verify clear caches between queries.)
    var vocab = vocabulary(docs).cache()
    val learned = Seq.newBuilder[(Int, String, Long)]
    for (step <- 1 to merges) {
      val top = pairStats(vocab).orderBy($"n".desc, $"pr".asc).limit(1).collect()
      require(top.nonEmpty, s"BPE merges exhausted before step $step: " +
        "every word is a single symbol; ask for fewer merges")
      val pr = top(0).getString(0)
      val n = top(0).getLong(1)
      learned += ((step, pr, n))
      // `<l><r>` -> `<lr>`: one literal replace, map-only.
      vocab = vocab.withColumn("toks",
        call_function("replace", $"toks", lit(pr), lit(pr.replace("><", ""))))
    }
    import spark.implicits._
    learned.result().toDF("step", "pair", "n")
  }

  /** The DuckDB oracle: the same K rounds unrolled as MATERIALIZED CTEs
    * (inlined CTEs would re-evaluate the whole prefix per round). */
  def oracleSql(merges: Int): String = {
    def round(i: Int): String =
      s"""p$i AS MATERIALIZED (SELECT pr, CAST(sum(cnt) AS BIGINT) AS n FROM (
         |    SELECT cnt, unnest(list_transform(generate_series(1, len(syms) - 1),
         |      i -> '<' || syms[i] || '><' || syms[i+1] || '>')) AS pr
         |    FROM (SELECT cnt, regexp_extract_all(toks, '<([a-z]+)>', 1) AS syms FROM t${i - 1})
         |    WHERE len(syms) >= 2) GROUP BY pr),
         |b$i AS MATERIALIZED (SELECT pr, n FROM p$i ORDER BY n DESC, pr LIMIT 1),
         |t$i AS MATERIALIZED (SELECT cnt, replace(toks, (SELECT pr FROM b$i),
         |    (SELECT replace(pr, '><', '') FROM b$i)) AS toks FROM t${i - 1})""".stripMargin
    val union = (1 to merges)
      .map(i => s"SELECT CAST($i AS INT) AS step, pr AS pair, n FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""WITH words AS MATERIALIZED (
       |  SELECT w AS word, count(*) AS cnt
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY w),
       |t0 AS MATERIALIZED (SELECT cnt, regexp_replace(word, '(.)', '<\\1>', 'g') AS toks FROM words),
       |${(1 to merges).map(round).mkString(",\n")}
       |$union ORDER BY step""".stripMargin
  }
}
