package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Buffer: a level-0 insert buffer (fixed capacity, `l0n` valid) plus
  * the compacted items as parallel (value, level) arrays — an item at
  * level h carries weight 2^h. `err` is the SELF-CERTIFIED rank-error
  * bound: the exact sum of the weights of every compaction performed on
  * this sketch's history (each compaction at level h perturbs any rank
  * estimate by at most 2^h — Munro-Paterson/Manku accounting).
  */
case class MrlBuf(l0: Array[Double], l0n: Int,
                  vals: Array[Double], lvls: Array[Int],
                  n: Long, err: Long)

/** Deterministic mergeable multi-level (MRL/Munro-Paterson-style)
  * quantile sketch — the second mergeable-summary family next to GK
  * (q51/q98): GK is NOT mergeable in general (its per-partition
  * sketches merge only through Spark's internal implementation), while
  * this one merges losslessly w.r.t. its guarantee under ANY merge
  * tree — the store-sketches-per-slice, roll-up-anywhere shape q61's
  * HLL and q73's Misra-Gries already demonstrate for distincts and
  * heavy hitters (Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Rule: values enter a level-0 buffer; a full level (≥ k items) is
  * sorted and its odd-indexed items promoted with doubled weight
  * (deterministic — no coin flips, so the WORST-CASE bound below is
  * unconditional, unlike randomized KLL's with-high-probability bound).
  * An odd leftover stays at its level, so total weight always equals n.
  *
  * Guarantee (self-certified, the q220 gate's contract): for any
  * quantile q, the true rank of the returned cut lies within
  * q·n ± (err + maxWeight), where `err` is the exact accumulated
  * compaction error of THIS sketch's history and maxWeight the largest
  * item weight — both carried in the output, so the gate's tolerance is
  * the sketch's own accounting, never an empirical fudge. Holds under
  * every partitioning/merge order; SketchSpec pins it across forced
  * repartitionings and the q220 oracle asserts it per cut.
  */
class MrlSketch(k: Int, qs: Seq[Double])
    extends Aggregator[Double, MrlBuf, (Seq[Double], Long, Long)] {
  require(k >= 2 && k % 2 == 0, "buffer size must be even and >= 2")
  require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1))

  override def zero: MrlBuf =
    MrlBuf(Array.empty, 0, Array.empty, Array.empty, 0L, 0L)

  override def reduce(b: MrlBuf, x: Double): MrlBuf = {
    val l0 = if (b.l0.length == k) b.l0 else java.util.Arrays.copyOf(b.l0, k)
    l0(b.l0n) = x
    val nb = b.copy(l0 = l0, l0n = b.l0n + 1, n = b.n + 1)
    if (nb.l0n == k) flushL0(nb) else nb
  }

  /** Move the level-0 insert buffer into the leveled arrays + cascade. */
  private def flushL0(b: MrlBuf): MrlBuf = {
    if (b.l0n == 0) return b
    val vals = new Array[Double](b.vals.length + b.l0n)
    val lvls = new Array[Int](b.lvls.length + b.l0n)
    System.arraycopy(b.vals, 0, vals, 0, b.vals.length)
    System.arraycopy(b.lvls, 0, lvls, 0, b.lvls.length)
    var i = 0
    while (i < b.l0n) {
      vals(b.vals.length + i) = b.l0(i)
      lvls(b.lvls.length + i) = 0
      i += 1
    }
    val (cv, cl, e) = cascade(vals, lvls)
    MrlBuf(b.l0, 0, cv, cl, b.n, b.err + e)
  }

  /** Compact every level holding ≥ k items (promoting odd-indexed of
    * the sorted level; odd leftover stays) until all levels are under
    * capacity. Returns the new arrays + the rank error introduced.
    */
  private def cascade(vals0: Array[Double], lvls0: Array[Int]): (Array[Double], Array[Int], Long) = {
    var vals = vals0; var lvls = lvls0; var err = 0L
    var h = 0
    while (h <= (if (lvls.isEmpty) -1 else lvls.max)) {
      val cnt = lvls.count(_ == h)
      if (cnt >= k) {
        val level = new ArrayBuffer[Double](cnt)
        val keepV = new ArrayBuffer[Double](vals.length)
        val keepL = new ArrayBuffer[Int](vals.length)
        var i = 0
        while (i < vals.length) {
          if (lvls(i) == h) level += vals(i)
          else { keepV += vals(i); keepL += lvls(i) }
          i += 1
        }
        val sorted = level.toArray
        java.util.Arrays.sort(sorted)
        val pairs = sorted.length / 2
        var j = 0
        while (j < pairs) {
          keepV += sorted(2 * j + 1); keepL += h + 1
          j += 1
        }
        if (sorted.length % 2 == 1) { keepV += sorted.last; keepL += h }
        err += 1L << h
        vals = keepV.toArray; lvls = keepL.toArray
        // the promoted items may overflow level h+1 — re-examine it,
        // but never re-descend (level h is now under capacity)
      } else h += 1
    }
    (vals, lvls, err)
  }

  override def merge(a: MrlBuf, b: MrlBuf): MrlBuf = {
    val fa = flushL0(a); val fb = flushL0(b)
    val vals = fa.vals ++ fb.vals
    val lvls = fa.lvls ++ fb.lvls
    val (cv, cl, e) = cascade(vals, lvls)
    MrlBuf(Array.empty, 0, cv, cl, fa.n + fb.n, fa.err + fb.err + e)
  }

  /** (cuts at `qs`, n, tolerance): cut(q) = first sketch item whose
    * cumulative weight reaches q·n in value order; tolerance =
    * err + maxWeight (the walk lands within one item-weight of the
    * target, and every estimate is within `err` of a true rank).
    */
  override def finish(r: MrlBuf): (Seq[Double], Long, Long) = {
    val b = flushL0(r)
    if (b.n == 0) return (Seq.empty, 0L, 0L)
    val order = b.vals.indices.sortBy(b.vals(_))
    val maxW = 1L << (if (b.lvls.isEmpty) 0 else b.lvls.max)
    val cuts = qs.map { q =>
      val target = q * b.n
      var cum = 0L
      var pick = b.vals(order.last)
      var i = 0
      var found = false
      while (i < order.length && !found) {
        cum += 1L << b.lvls(order(i))
        if (cum >= target) { pick = b.vals(order(i)); found = true }
        i += 1
      }
      pick
    }
    (cuts, b.n, b.err + maxW)
  }

  override def bufferEncoder: Encoder[MrlBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MrlBuf]()

  override def outputEncoder: Encoder[(Seq[Double], Long, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Long, Long)]()
}

object MrlSketch {
  /** Column-function form: `MrlSketch(1024, Seq(.25,.5,.75))(col)`. */
  def apply(k: Int, qs: Seq[Double]): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MrlSketch(k, qs), Encoders.scalaDouble)
}

/** The RAW-BUFFER form of [[MrlSketch]]: same reduce/merge machinery,
  * but `finish` returns the normalized mergeable buffer itself instead
  * of quantile cuts — the store-per-slice shape (q61's HLL registers,
  * q73's MG counters): each slice's sketch is a stored value, and any
  * later rollup is an explicit [[MrlSketch.merge]], never a rescan.
  * q228 uses it to make mergeability a driver-hash-gated FACT: two
  * half-corpus buffers built independently, merged once at the model
  * edge, gated against the full-corpus exact quantiles.
  */
class MrlSketchRaw(k: Int) extends Aggregator[Double, MrlBuf, MrlBuf] {
  private val inner = new MrlSketch(k, Seq(0.5))
  override def zero: MrlBuf = inner.zero
  override def reduce(b: MrlBuf, x: Double): MrlBuf = inner.reduce(b, x)
  override def merge(a: MrlBuf, b: MrlBuf): MrlBuf = inner.merge(a, b)
  // merge-with-zero flushes the level-0 insert buffer, so the emitted
  // value is in canonical leveled form (l0 empty) — stable to persist
  override def finish(r: MrlBuf): MrlBuf = inner.merge(r, inner.zero)
  override def bufferEncoder: Encoder[MrlBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MrlBuf]()
  override def outputEncoder: Encoder[MrlBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MrlBuf]()
}

object MrlSketchRaw {
  def apply(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MrlSketchRaw(k), Encoders.scalaDouble)
}
