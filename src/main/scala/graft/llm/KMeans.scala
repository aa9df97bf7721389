package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * All arithmetic follows the [[LlmQueries]] portability discipline:
  * components quantize to int64 (×1e7, truncate toward zero), sums and
  * norms are exact integer math, centroid means truncate identically in
  * every engine, and the cosine is a fixed IEEE double sequence — so
  * the trained codebook and final assignment hash-gate bit-exact. */
object KMeans {

  /** A trained centroid: quantized components + integer square norm. */
  final case class Centroid(cell: Long, c: IndexedSeq[Long], nrm: Long)

  private val QScale = 1.0e7

  private def quantDot(emb: Column, c: Centroid): Column =
    aggregate(
      zip_with(emb, typedLit(c.c), (x, w) => (x.cast("double") * QScale).cast("long") * w),
      lit(0L), (acc, v) => acc + v)

  /** argmax-cosine cell over codebook literals, ties to the smallest
    * cell id (max of struct(cosine, -cell) — the q92 tie rule). */
  private def bestCell(emb: Column, nrm: Column, cb: Seq[Centroid]): Column = {
    val cands = cb.map { c =>
      val cos = quantDot(emb, c).cast("double") /
        sqrt(nrm.cast("double") * lit(c.nrm.toDouble))
      struct(cos.as("cosine"), lit(-c.cell).as("negCell"))
    }
    -array_max(array(cands: _*)).getField("negCell")
  }

  /** Quantized seed centroids taken from the vectors themselves
    * (deterministic seeding — the k lowest ids, the q55 codebook). */
  private def seedCodebook(emb: DataFrame, k: Int): Seq[Centroid] =
    emb.filter(col("vec_id") < k)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map { r =>
        // embeddings are float32 on disk; the column path casts
        // float→double before quantizing — mirror it exactly
        val q = r.getSeq[Float](1).map(x => (x.toDouble * QScale).toLong).toIndexedSeq
        Centroid(r.getLong(0), q, q.map(v => v * v).sum)
      }.sortBy(_.cell).toSeq

  /** `emb`: (vec_id: Long, embedding: Array[Double]) with uniform
    * dimension. Returns the final (codebook, assignment) after
    * `iterations` Lloyd rounds from the k lowest-id seed vectors.
    * Cells that lose every member drop out of the codebook (the
    * standard empty-cluster contraction — deterministic on both
    * engines). */
  def train(emb: DataFrame, k: Int, iterations: Int): (Seq[Centroid], DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(col("vec_id"), col("embedding"),
        graft.functions.VectorOps.sqNormQ(col("embedding")).as("nrm"))
      .localCheckpoint() // scanned once per round; never recomputed
    var cb = seedCodebook(base, k)
    for (_ <- 1 to iterations) {
      val assign = base.select(col("vec_id"), col("embedding"),
        bestCell(col("embedding"), col("nrm"), cb).as("cell"))
      // per-(cell, dim) exact integer sums; truncated mean = new centroid
      val sums = assign
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("cell"), col("pos"),
          (col("x").cast("double") * QScale).cast("long").as("xq"))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("xq")).as("s"), count(lit(1)).as("cnt"))
        .collect()
      cb = sums.groupBy(_.getLong(0)).toSeq.map { case (cell, rows) =>
        val c = rows.sortBy(_.getInt(1))
          .map(r => (r.getLong(2).toDouble / r.getLong(3).toDouble).toLong)
          .toIndexedSeq
        Centroid(cell, c, c.map(v => v * v).sum)
      }.sortBy(_.cell)
    }
    val assign = base.select(col("vec_id"),
      bestCell(col("embedding"), col("nrm"), cb).as("cell"))
    (cb, assign)
  }
}
