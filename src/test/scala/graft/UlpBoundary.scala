package graft

/** Shared measurement for the documented quantization hazard at every
  * `ROUND(x·10⁶)` model edge (Retrieval.quant's scaladoc): the
  * cross-engine "bit-deterministic" claim assumes the JVM's
  * ln/cos/sqrt and DuckDB's libm agree to the last bit BEFORE the
  * round, so a raw value within cross-libm drift (~1e-10 in x·1e6
  * units) of a `.5` boundary would flip the integer on a libm upgrade
  * and read as a phantom engine bug. Each family's spec feeds every
  * raw value its model edge ever quantizes ON THE ORACLE SF through
  * [[minMargin]] and asserts it clears [[Floor]] — two orders above
  * the drift — so if a hash ever flips, the failing gate names the
  * hazard instead of leaving a mystery mismatch.
  *
  * Gated edges: q154/q30 cosines + q153-class ln weights
  * (RetrievalSpec), q170 QL lns (RetrievalSpec), q167 NLL
  * (QualityBucketsSpec), q161 WordPiece scores (WordPieceSpec),
  * q153 NB weights/priors + q157/q160 DSIR λ and Gumbel keys
  * (QuantBoundarySpec).
  */
object UlpBoundary {

  /** Required clearance: two orders of magnitude above cross-libm
    * drift in quantized units.
    */
  val Floor = 1e-8

  /** Distance of x (ALREADY in quantized units, i.e. the value whose
    * ROUND the engines must agree on) to the nearest `.5` rounding
    * boundary.
    */
  def margin(x: Double): Double = math.abs(math.abs(x - math.floor(x)) - 0.5)

  /** Min boundary distance over every value a model edge quantizes.
    * Double.MaxValue on empty input — an empty edge has no hazard,
    * but callers should assert nonEmpty to keep the gate honest.
    */
  def minMargin(xs: IterableOnce[Double]): Double =
    xs.iterator.foldLeft(Double.MaxValue)((m, x) => math.min(m, margin(x)))
}
