package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch: a MERGEABLE k-counter summary of a
  * string stream — the frequent-items companion to q61's HLL rollup
  * (store a few-KB sketch per slice, merge any set of slices losslessly
  * w.r.t. the sketch guarantee, never rescan). Spark ships no built-in
  * frequent-items aggregate (`approx_count_distinct` counts distincts,
  * not heavy hitters), so this is a typed `Aggregator`: partial+final
  * two-phase with one O(k) buffer per group.
  *
  * Guarantee (Misra-Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): with k counters over n items, every surviving
  * counter UNDERcounts its item by at most n/(k+1), and any item with
  * true count > n/(k+1) is guaranteed to survive — arbitrary merge trees
  * included. AnalyticsSpec pins both properties against the exact q59.
  *
  * Buffer = parallel key/count arrays mutated in place (an immutable Map
  * per row would churn the young gen at stream rates); lookups are an
  * O(k) linear scan, fine for sketch-sized k (tens to hundreds).
  */
class FreqSketch(k: Int) extends Aggregator[String, (Array[String], Array[Long]), Map[String, Long]] {
  require(k > 0, "sketch size must be positive")

  override def zero: (Array[String], Array[Long]) =
    (Array.empty[String], Array.empty[Long])

  override def reduce(b: (Array[String], Array[Long]), x: String): (Array[String], Array[Long]) = {
    if (x == null) return b
    val (keys, counts) = b
    var i = 0
    while (i < keys.length) {
      if (keys(i) == x) { counts(i) += 1L; return b }
      i += 1
    }
    if (keys.length < k)
      (keys :+ x, counts :+ 1L)
    else {
      // classic MG step: a miss with full counters decrements everyone;
      // zeroed counters free their slot for later items
      var j = 0
      while (j < counts.length) { counts(j) -= 1L; j += 1 }
      compact(keys, counts)
    }
  }

  override def merge(a: (Array[String], Array[Long]), b: (Array[String], Array[Long])): (Array[String], Array[Long]) = {
    if (a._1.isEmpty) return b
    if (b._1.isEmpty) return a
    // combine counters, then shrink back to k by subtracting the
    // (k+1)-th largest combined count from every counter (the mergeable-
    // summaries rule — error stays <= n/(k+1) under any merge tree)
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < a._1.length) { m.update(a._1(i), m.getOrElse(a._1(i), 0L) + a._2(i)); i += 1 }
    i = 0
    while (i < b._1.length) { m.update(b._1(i), m.getOrElse(b._1(i), 0L) + b._2(i)); i += 1 }
    if (m.size > k) {
      val cut = m.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val kept = m.iterator.collect { case (t, c) if c - cut > 0 => (t, c - cut) }.toArray
      (kept.map(_._1), kept.map(_._2))
    } else
      (m.keys.toArray, m.values.toArray)
  }

  override def finish(r: (Array[String], Array[Long])): Map[String, Long] =
    r._1.iterator.zip(r._2.iterator).toMap

  private def compact(keys: Array[String], counts: Array[Long]): (Array[String], Array[Long]) = {
    val keep = counts.count(_ > 0L)
    if (keep == keys.length) (keys, counts)
    else {
      val ks = new Array[String](keep)
      val cs = new Array[Long](keep)
      var i = 0; var o = 0
      while (i < keys.length) {
        if (counts(i) > 0L) { ks(o) = keys(i); cs(o) = counts(i); o += 1 }
        i += 1
      }
      (ks, cs)
    }
  }

  override def bufferEncoder: Encoder[(Array[String], Array[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[String], Array[Long])]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

/** Second-level rollup: merge STORED sketches (the map form FreqSketch
  * emits) without touching the raw stream again — q61's
  * store-then-union pattern for heavy hitters. Any grouping of slices
  * merges losslessly w.r.t. the n/(k+1) guarantee.
  */
class FreqSketchMerge(k: Int) extends Aggregator[Map[String, Long], (Array[String], Array[Long]), Map[String, Long]] {
  private val inner = new FreqSketch(k)
  override def zero: (Array[String], Array[Long]) = inner.zero
  override def reduce(b: (Array[String], Array[Long]), m: Map[String, Long]): (Array[String], Array[Long]) =
    if (m == null || m.isEmpty) b
    else inner.merge(b, (m.keys.toArray, m.values.toArray))
  override def merge(a: (Array[String], Array[Long]), b: (Array[String], Array[Long])): (Array[String], Array[Long]) =
    inner.merge(a, b)
  override def finish(r: (Array[String], Array[Long])): Map[String, Long] = inner.finish(r)
  override def bufferEncoder: Encoder[(Array[String], Array[Long])] = inner.bufferEncoder
  override def outputEncoder: Encoder[Map[String, Long]] = inner.outputEncoder
}

object FreqSketch {
  /** Column-function form: `FreqSketch(64)(col)` usable in any groupBy. */
  def apply(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new FreqSketch(k), Encoders.STRING)

  /** Column-function form of the stored-sketch rollup. */
  def merge(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new FreqSketchMerge(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]())
}
