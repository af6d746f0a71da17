package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

private[expressions] object SketchTypeCheck {
  def arrayOfString(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<string>, got ${other.catalogString}")
    }
  def arrayOfLong(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<bigint>, got ${other.catalogString}")
    }
}

/** Sketch signatures as single-pass native expressions. The HOF
  * formulation (`transform` × 32 permutations, or 64 `aggregate` calls
  * for SimHash bits) re-traverses the token array once per
  * permutation/bit and allocates intermediates; these do all permutations
  * in one pass. Eval-based (CodegenFallback) is fine here: the per-call
  * work is O(tokens × perms), so interpretation overhead is noise.
  *
  * Token hashing uses Spark's own XxHash64Function with the SQL-default
  * seed 42 — identical values to the `xxhash64()` SQL function, stable
  * across partitionings and cluster sizes.
  */

/** MinHash signature: array<string> shingles → array<long> of
  * `numPerms` minima of h_j(x) = (a_j·x + b_j) mod prime over
  * x = xxhash64(shingle) mod prime. Null input → null; empty input →
  * array of `prime` sentinels (no shingles ⇒ no collisions).
  */
case class MinHashSignature(child: Expression, numPerms: Int, prime: Long,
    perms: Seq[(Long, Long)])
    extends UnaryExpression with CodegenFallback {
  require(perms.length == numPerms)
  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeCheck.arrayOfString(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val as = perms.map(_._1).toArray
  private val bs = perms.map(_._2).toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerms)(prime)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = java.lang.Math.floorMod(
        XxHash64Function.hash(s, StringType, 42L), prime)
      var j = 0
      while (j < numPerms) {
        val p = java.lang.Math.floorMod(h * as(j) + bs(j), prime)
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** Word n-gram shingles: array<string> tokens → array<string> of
  * space-joined n-grams. `distinct = true` (the dedup/LSH form) keeps
  * first occurrences only — same contract as
  * `array_distinct(transform(...))` but one pass, no per-position
  * interpreted expression tree (the HOF formulation costs ~1.7 ms/doc
  * at 300 tokens; this is ~100× cheaper). `distinct = false` keeps the
  * full ordered multiset — repetition signals (top-n-gram fraction,
  * duplicate-n-gram fraction) need occurrence counts, not set
  * membership.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeCheck.arrayOfString(child, prettyName)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val total = arr.numElements()
    if (total < n) new GenericArrayData(Array.empty[Any])
    else {
      val words = new Array[String](total)
      var i = 0
      while (i < total) {
        val w = arr.getUTF8String(i)
        words(i) = if (w == null) "" else w.toString
        i += 1
      }
      // LinkedHashSet preserves first-occurrence order for the distinct
      // form; the multiset form appends every position's gram verbatim
      val seen: java.util.Collection[String] =
        if (distinct) new java.util.LinkedHashSet[String](total * 2)
        else new java.util.ArrayList[String](total - n + 1)
      i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i <= total - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      i = 0
      while (it.hasNext) {
        out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** 64-bit SimHash: array<string> tokens → long whose bit i is set iff
  * Σ over tokens of (bit i of xxhash64(token) ? +1 : −1) > 0.
  */
case class SimHash(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeCheck.arrayOfString(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash =
    copy(child = c)
}

/** `width`-bit SimHash over PRE-HASHED tokens (array<long>): bit b set
  * iff Σ over elements of ((h >>> b) & 1 ? +1 : −1) > 0, for b < width.
  * [[SimHash]]'s vote/pack machinery factored over an explicit hash
  * column, so a DuckDB oracle can replay it bit-for-bit with portable
  * hashes (q223's 48-bit md5-prefix contract) and a differential spec
  * can pin `SimHash(toks) == SimHashBits(transform(toks, xxhash64), 64)`
  * — which is what upgrades q28's rows-only signature from
  * spec-gated to driver-hash-gated. SimHash itself stays the
  * single-pass internal-hash fast path (no per-row hash-array
  * materialization in q28's hot loop).
  */
case class SimHashBits(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeCheck.arrayOfLong(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](width)
    var i = 0
    while (i < n) {
      // a null element is SKIPPED (absent token), never read: ArrayData
      // .getLong on a null slot silently returns 0, which would cast a
      // full down-vote on every bit and skew the signature instead of
      // failing. Current callers (q223's contract gates) never produce
      // null hashes; this pins the latent case.
      if (arr.isNullAt(i)) { i += 1 }
      else {
      val h = arr.getLong(i)
      var b = 0
      while (b < width) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < width) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHashBits =
    copy(child = c)
}
