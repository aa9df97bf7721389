package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change feed → SCD2 versioned dimension (the q118 shape as a
  * reusable operator). Two steps, ONE shuffle:
  *
  *  1. CDC compaction — drop rows whose attribute equals the previous
  *     row's (lag window), so storage scales with the VERSION count,
  *     not the event count;
  *  2. validity intervals — `valid_from` = change ts, `valid_to` = next
  *     change's ts (lead window over survivors), `is_current` = no
  *     successor. Open-end sentinel is Long.MaxValue so the standard
  *     point-in-time predicate `valid_from <= t AND t < valid_to`
  *     works unmodified on current versions.
  *
  * Both windows partition on the dimension key with the same
  * (ts, tieBreak) order, so Catalyst computes them from one hash
  * exchange + sort (plan-checked by q118). Point-in-time lookups
  * against the result are [[AsOfJoin]]; the LIVE form of step 1 is
  * [[graft.streaming.Machines.ChangeMachine]] (CdcParitySpec proves the
  * three forms equal).
  *
  * `ts` must be an integer epoch column (the q36 µs discipline) — the
  * sentinel and interval predicates are integer comparisons.
  *
  * Nullable-attribute caveat (deliberate, parity-locked): the filter is
  * the standard warehouse lag-window idiom `prev IS NULL OR attr <>
  * prev`, which DROPS a transition TO null (`attr <> prev` is SQL NULL)
  * and KEEPS a row after a null (`prev IS NULL`). All three forms —
  * this operator, the q118 oracle, and the live
  * [[graft.streaming.Machines.ChangeMachine]] — implement exactly these
  * semantics and CdcParitySpec pins them, nulls included. For
  * dimensions whose attribute is genuinely nullable, compact with the
  * null-safe variant instead: `lag(struct(attr))` + keep when the lag
  * struct IS NULL or `!(attr <=> prev.attr)` (IS DISTINCT FROM). */
object Scd2 {
  def build(df: DataFrame, key: String, ts: String, tieBreak: String,
            attr: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val ver = df.withColumn("graft_prev", lag(col(attr), 1).over(w))
      .filter(col("graft_prev").isNull || col(attr) =!= col("graft_prev"))
    ver.withColumn("graft_vt", lead(col(ts), 1).over(w))
      .select(col(key), col(attr), col(ts).as("valid_from"),
        coalesce(col("graft_vt"), lit(Long.MaxValue)).as("valid_to"),
        col("graft_vt").isNull.cast("int").as("is_current"))
  }
}
