package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle run by
  * the driver on the same parquet tables (see /root/repo/SparkEntry
  * contract). Column names/types must match the oracle exactly — the
  * driver sorts columns by name and hashes values.
  *
  * Numeric discipline for hash-stable oracles:
  *  - money sums go through DECIMAL(18,2) (exact in both engines; no
  *    float-association drift between Spark's partial aggregation and
  *    DuckDB's);
  *  - timestamps are emitted as epoch microseconds BIGINT (`unix_micros`
  *    vs `epoch_us`) — no string-format or timezone ambiguity;
  *  - double outputs are restricted to expressions whose IEEE evaluation
  *    order is identical on both sides (elementwise ratios, literals),
  *    never order-free parallel sums.
  */
/** @param calibration when set, this query is a CALIBRATION/contrast
  *   case: it deliberately carries a non-scale-safe form (an unbounded
  *   pair enumeration, an uncapped cell self-join) to measure, in-gate,
  *   what its production counterpart's bound costs in recall/survivors.
  *   The string names the production operator a user should run at
  *   scale. The shuffle gate's superlinearity allowlist is DERIVED from
  *   this tag ([[graft.SparkEntry.calibrationQueries]]) — a new
  *   superlinear query cannot hide behind a hand-maintained list. */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    calibration: Option[String] = None)

object QuerySpec {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, None)
}
