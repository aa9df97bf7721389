package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Distributed Lloyd k-means on the quantized integer domain — the
  * codebook TRAINER behind the IVF index (q55 probes a codebook; q92 is
  * one refinement step; this runs the full bounded-iteration loop).
  *
  * Scale shape per round (the only one that works at 100 TB):
  *  - ASSIGN is a single projection pass — the codebook (k·dims longs)
  *    is folded into the row expression as literals, each row computes
  *    its k cosines and takes the argmax in place. No crossJoin row
  *    explosion, no per-round window, ZERO shuffle.
  *  - UPDATE is one posexplode + groupBy (cell, dim) integer-sum — one
  *    hash shuffle whose map-side partials reduce every partition to at
  *    most k·dims rows before the exchange.
  *  - The k·dims codebook collects to the driver between rounds (it is
  *    small BY DEFINITION — that is what makes it broadcastable).
  *
  * All arithmetic follows the [[VectorOps.QScale]] portability
  * contract: components quantize ONCE up front into a long-array
  * column (scanned by every round — no per-round requantization), sums
  * and norms are exact integer math, centroid means truncate
  * identically in every engine, and the cosine is a fixed IEEE double
  * sequence — so the trained codebook and final assignment hash-gate
  * bit-exact. */
object KMeans {

  /** A trained centroid: quantized components + integer square norm. */
  final case class Centroid(cell: Long, c: IndexedSeq[Long], nrm: Long)

  private def quantDot(xq: Column, c: Centroid): Column =
    // native codegen'd loop (r10): the aggregate(zip_with(...)) form ran
    // interpreted per (row, centroid) — k allocations + lambda dispatch
    // per row in the assignment pass, the hottest loop of every round
    VectorOps.dotLong(xq, typedLit(c.c))

  /** argmax-cosine cell over codebook literals, ties to the smallest
    * cell id (max of struct(cosine, -cell) — the q92 tie rule).
    * Public: this IS the assignment rule — serving paths (e.g. the
    * streaming ANN probe) must call it, not re-derive it, so a tie-rule
    * or quantization change cannot desynchronize them. `xq` is the
    * quantized long-array column ([[VectorOps.quant]] per element). */
  def bestCell(xq: Column, nrm: Column, cb: Seq[Centroid]): Column = {
    require(cb.nonEmpty, "k-means codebook is empty — no seed vectors found")
    val cands = cb.map { c =>
      val cos = quantDot(xq, c).cast("double") /
        sqrt(nrm.cast("double") * lit(c.nrm.toDouble))
      // zero-norm guard: 0/0 is NaN and Spark orders NaN ABOVE every
      // real cosine, so an all-zero centroid (empty-doc embedding among
      // the seeds, or a cell whose means all truncate to 0) would win
      // argmax for EVERY row and silently capture the whole dataset.
      // Score the degenerate pair below any real cosine instead; ties
      // still resolve to the lowest cell id.
      val safe =
        if (c.nrm == 0L) lit(-2.0)
        else when(nrm === 0L, lit(-2.0)).otherwise(cos)
      struct(safe.as("cosine"), lit(-c.cell).as("negCell"))
    }
    -array_max(array(cands: _*)).getField("negCell")
  }

  /** Deterministic seeding: the k LOWEST vec_ids, taken from the
    * already-quantized base (works for sparse/offset id spaces). */
  private def seedCodebook(base: DataFrame, k: Int): Seq[Centroid] =
    base.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("xq"))
      .collect()
      .map { r =>
        val q = r.getSeq[Long](1).toIndexedSeq
        Centroid(r.getLong(0), q, q.map(v => v * v).sum)
      }.sortBy(_.cell).toSeq

  /** `emb`: (vec_id: Long, embedding: Array[Float]) — float32 as the
    * embeddings table stores them — with uniform dimension. Returns the
    * final (codebook, assignment (vec_id, cell)) after `iterations`
    * Lloyd rounds seeded from the k lowest-id vectors. Cells that lose
    * every member drop out of the codebook (the standard empty-cluster
    * contraction — deterministic on both engines). */
  def train(emb: DataFrame, k: Int, iterations: Int): (Seq[Centroid], DataFrame) = {
    // quantize ONCE: every round's assign and update read the same
    // checkpointed long-array column
    val base = emb.select(col("vec_id"),
        transform(col("embedding"), x => VectorOps.quant(x)).as("xq"),
        VectorOps.sqNormQ(col("embedding")).as("nrm"))
      .transform(graft.Materialize.eager(_))
    var cb = seedCodebook(base, k)
    for (_ <- 1 to iterations) {
      val assign = base.select(col("vec_id"), col("xq"),
        bestCell(col("xq"), col("nrm"), cb).as("cell"))
      // per-(cell, dim) exact integer sums; truncated mean = new centroid
      val sums = assign
        .select(col("cell"), posexplode(col("xq")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("cnt"))
        .collect()
      cb = sums.groupBy(_.getLong(0)).toSeq.map { case (cell, rows) =>
        val c = rows.sortBy(_.getInt(1))
          // double-divide-then-truncate ON PURPOSE, not exact integer
          // division: the DuckDB oracle computes trunc(s::DOUBLE / cnt)
          // (lloydSql), and IEEE division is bit-deterministic on both
          // engines at ANY magnitude — the cross-engine hash holds even
          // where |s| > 2^53 makes the value differ from the exact
          // integer mean (a sub-ulp centroid nudge, irrelevant to Lloyd)
          .map(r => (r.getLong(2).toDouble / r.getLong(3).toDouble).toLong)
          .toIndexedSeq
        Centroid(cell, c, c.map(v => v * v).sum)
      }.sortBy(_.cell)
    }
    val assign = base.select(col("vec_id"),
      bestCell(col("xq"), col("nrm"), cb).as("cell"))
    (cb, assign)
  }
}
