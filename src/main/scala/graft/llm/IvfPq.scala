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

  /** ALL per-subspace codes in one pass: element s = argmin distance in
    * subspace s, ties to the LOWER cid. Rides the native codegen'd
    * `pq_codes` (r10): the previous per-subspace
    * `array_min(array(struct(aggregate(zip_with(slice(...` chain ran its
    * lambdas interpreted and allocated two scratch arrays per
    * (row, subspace, codeword) — the encode pass over every vector is
    * the PQ hot loop, the [[graft.functions.LshPlaneBits]] lesson. */
  def codes(r: Column, cw: IndexedSeq[IndexedSeq[Long]], width: Int): Column =
    graft.functions.VectorOps.pqCodes(r, cw, width)

  /** Per-subspace code, from the one-pass [[codes]] array (whole-stage
    * codegen's subexpression elimination shares the array across the
    * m extractions in one projection). */
  def codeFor(r: Column, cw: IndexedSeq[IndexedSeq[Long]], sI: Int,
              width: Int): Column =
    element_at(codes(r, cw, width), sI + 1)

  /** ADC table for one subspace: array of (cid, d2) structs — keyed by
    * cid, never by array position. (Built per QUERY row — bounded
    * cardinality — so the interpreted subD2 here is not a hot path.) */
  def dtab(qr: Column, cw: IndexedSeq[IndexedSeq[Long]], sI: Int,
           width: Int): Column =
    array(cw.indices.map(cid => struct(
      lit(cid).as("cid"), subD2(qr, cw(cid), sI, width).as("d2"))): _*)

  /** Candidate distance: Σ_s dtab_s[code_s].d2 (cid-keyed lookups, via
    * the native `adc_lookup` — this runs per CANDIDATE row, and the
    * previous `element_at(filter(tab, ...))` form allocated a filtered
    * array + dispatched its lambda interpreted per lookup). */
  def adc(codes: Seq[Column], dtabs: Seq[Column]): Column =
    codes.zip(dtabs).map { case (code, tab) =>
      graft.functions.VectorOps.adcLookup(tab, code)
    }.reduce(_ + _)
}
