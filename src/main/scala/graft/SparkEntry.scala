package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-domain modules:
  *  - [[graft.queries.Relational]]    — scans/joins/aggs/windows/setops/json/arrays
  *  - [[graft.queries.AspSemantics]]  — the reference's event-stream semantics
  *    (replay ordering, timers, call_later, merge, as-of, running aggs, VWAP)
  *  - [[graft.llm.LlmQueries]]        — dedup / similarity / text analysis /
  *    multimodal extensions mandated by the north star
  */
object SparkEntry {
  private def allSpecs: Seq[QuerySpec] =
    Relational.specs ++ AspSemantics.specs ++ graft.llm.LlmQueries.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
