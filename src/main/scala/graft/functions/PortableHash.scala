package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing used by the dedup / fingerprint
  * operators: a 60-bit integer derived from the md5 hex digest. Portable
  * because md5 is bit-identical everywhere, unlike engine-native `hash()`
  * (Spark Murmur3 vs DuckDB's internal hash) — so the same value is
  * computable in the DuckDB oracle (`('0x' || substr(md5(x),1,15))::BIGINT`)
  * and in any other engine a user cross-checks against.
  *
  * md5 here is a partitioning/sketch hash, not a security boundary.
  * Codegen: `md5`/`conv`/`substring` are all built-in codegen'd
  * expressions, so this stays inside WholeStageCodegen (no UDF).
  */
object PortableHash {
  /** Large Mersenne-ish prime used for sketch arithmetic: (a*h+b) stays
    * within int64 for h < P and a < 2^32. */
  val P: Long = 2147483647L // 2^31 - 1

  /** 60-bit integer from md5(col) — first 15 hex chars. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Same value mod P — the sketch-domain hash. */
  def md5Mod(c: Column): Column = md5Long(c) % P

  /** DuckDB SQL rendering of [[md5Long]] for oracle queries. */
  def md5LongSql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  def md5ModSql(expr: String): String =
    s"(${md5LongSql(expr)} % $P)"

  /** JVM-local evaluation of [[md5Long]]/[[md5Mod]] — bit-identical to
    * the column/SQL forms; used to pre-compute constants (e.g. LSH plane
    * weights) that both the Spark plan and the oracle re-derive. */
  def md5LongLocal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }
  def md5ModLocal(s: String): Long = md5LongLocal(s) % P

  /** Key → shard assignment shared by every sharded streaming operator
    * (Bloom dedup, CMS, ...). ONE definition: a forked copy would
    * silently diverge shard assignment between operators that pipelines
    * assume shard identically. */
  def shardOf(key: Long, nShards: Int): Int =
    (md5ModLocal(s"shard|$key") % nShards).toInt
}
