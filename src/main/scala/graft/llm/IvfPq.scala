package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for the IVF-PQ index (q129_ivfpq_ann) and its online
  * serving path (StreamingIvfPqSpec): residual computation, per-subspace
  * encode, ADC tables, and the code-keyed distance lookup. ONE
  * definition — the [[KMeans.bestCell]] discipline extended to the
  * compressed index: an online prober that re-derived any of these
  * (subspace layout, tie rule, cid keying) could silently desynchronize
  * from the offline build, and nothing would fail loudly.
  *
  * `cents` / `cw` are driver-collected component arrays (k·dims longs —
  * broadcastable by definition); all arithmetic is the exact int64
  * quantized domain, so offline build, batch probe, and live probe are
  * bit-identical. */
object IvfPq {

  /** r = xq − centroid(cell), componentwise. `cents` must be indexed by
    * cell id (position c = cell c — assert upstream, q108 discipline). */
  def residual(xq: Column, cell: Column,
               cents: IndexedSeq[IndexedSeq[Long]]): Column =
    zip_with(xq, element_at(typedLit(cents), cell.cast("int") + 1),
      (a, b) => a - b)

  /** ‖r_s − cw_s‖² over subspace `sI` of width `width` (exact int64). */
  def subD2(r: Column, cwRow: IndexedSeq[Long], sI: Int, width: Int): Column =
    aggregate(zip_with(slice(r, 1 + width * sI, width),
        typedLit(cwRow.slice(width * sI, width * sI + width)),
        (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)

  /** Per-subspace code: argmin distance, ties to the LOWER cid. */
  def codeFor(r: Column, cw: IndexedSeq[IndexedSeq[Long]], sI: Int,
              width: Int): Column =
    array_min(array(cw.indices.map(cid =>
      struct(subD2(r, cw(cid), sI, width).as("d2"), lit(cid).as("cid"))): _*))
      .getField("cid")

  /** ADC table for one subspace: array of (cid, d2) structs — keyed by
    * cid, never by array position. */
  def dtab(qr: Column, cw: IndexedSeq[IndexedSeq[Long]], sI: Int,
           width: Int): Column =
    array(cw.indices.map(cid => struct(
      lit(cid).as("cid"), subD2(qr, cw(cid), sI, width).as("d2"))): _*)

  /** Candidate distance: Σ_s dtab_s[code_s].d2 (cid-keyed lookups). */
  def adc(codes: Seq[Column], dtabs: Seq[Column]): Column =
    codes.zip(dtabs).map { case (code, tab) =>
      element_at(filter(tab, x => x.getField("cid") === code), 1)
        .getField("d2")
    }.reduce(_ + _)
}
