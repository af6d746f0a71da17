package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q227 behavior pins: the count-grain merge must reproduce the
  * from-scratch flag table exactly — including a flag FLIP on a digest
  * the batch shares with the base corpus (the non-doc-local case q224's
  * gram manifest never exercises) — and the equivalence fingerprint
  * must actually trip on a corrupted merge.
  */
class ShingleDeltaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private def fpOf(flags: org.apache.spark.sql.DataFrame): (Long, String) = {
    val r = ops.ShingleDelta.flagTotals(flags, "n", "fp").head()
    (r.getLong(0), r.getDecimal(1).toString)
  }

  private def mergeCounts(base: org.apache.spark.sql.DataFrame,
                          delta: org.apache.spark.sql.DataFrame) = {
    val affected = delta.select(col("gd")).distinct()
    base.join(broadcast(affected), Seq("gd"), "left_anti")
      .unionByName(base.join(broadcast(affected), Seq("gd"), "left_semi")
        .unionByName(delta)
        .groupBy("gd", "split").agg(sum(col("cnt")).as("cnt")))
  }

  test("a landed batch flips a shared digest's flag; merged flags == from-scratch flags") {
    // split classes by md5 prefix: doc 1 -> 'c' (validation), doc 3 ->
    // 'e' (test). The "batch" (doc 3) SHARES the 3-gram "red green
    // blue" with base doc 1, so the shared digest's in_test must flip
    // false -> true through the count-grain merge — the non-doc-local
    // propagation a flag-grain store cannot do.
    val baseDocs = docs(
      1L -> "red green blue yellow purple",      // some split
      2L -> "alpha beta gamma delta epsilon")
    val deltaDocs = docs(3L -> "red green blue crimson")
    val base = ops.ShingleDelta.countsOf(baseDocs)
    val delta = ops.ShingleDelta.countsOf(deltaDocs)
    val merged = mergeCounts(base, delta)
    val scratch = ops.ShingleDelta.countsOf(
      baseDocs.unionByName(deltaDocs))
    // count-grain equality (the stored artifact itself)
    val m = merged.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val s0 = scratch.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(m == s0)
    // flag-grain equality by fingerprint (the audit the query ships)
    assert(fpOf(ops.ShingleDelta.flagsOf(merged)) ==
      fpOf(ops.ShingleDelta.flagsOf(scratch)))
    // sensitivity: dropping the delta breaks the fingerprint — and the
    // shared digest demonstrably gained a split it lacked in the base
    assert(fpOf(ops.ShingleDelta.flagsOf(base)) !=
      fpOf(ops.ShingleDelta.flagsOf(scratch)))
    val sharedGd = ops.ShingleDelta.countsOf(docs(1L -> "red green blue"))
      .select("gd").head().getString(0)
    val baseSplits = base.filter(col("gd") === sharedGd)
      .select("split").collect().map(_.getString(0)).toSet
    val mergedSplits = merged.filter(col("gd") === sharedGd)
      .select("split").collect().map(_.getString(0)).toSet
    assert(baseSplits != mergedSplits && (baseSplits subsetOf mergedSplits),
      s"the shared digest must gain the batch's split ($baseSplits -> $mergedSplits)")
  }

  test("a corrupted merge (lost count) still matches counts partially but breaks the flag fingerprint") {
    val baseDocs = docs(10L -> "one two three four", 11L -> "five six seven eight")
    val deltaDocs = docs(12L -> "nine ten eleven twelve")
    val base = ops.ShingleDelta.countsOf(baseDocs)
    val delta = ops.ShingleDelta.countsOf(deltaDocs)
    val scratch = ops.ShingleDelta.countsOf(baseDocs.unionByName(deltaDocs))
    assert(fpOf(ops.ShingleDelta.flagsOf(mergeCounts(base, delta))) ==
      fpOf(ops.ShingleDelta.flagsOf(scratch)))
    // corrupt: drop one delta digest row entirely
    val firstGd = delta.select("gd").orderBy("gd").head().getString(0)
    val corrupted = mergeCounts(base, delta.filter(col("gd") =!= firstGd))
    assert(fpOf(ops.ShingleDelta.flagsOf(corrupted)) !=
      fpOf(ops.ShingleDelta.flagsOf(scratch)))
  }

  test("q227 on the corpus: equivalent, train-class delta present, digests add up") {
    val r = SparkEntry.queries("q227_shingle_delta_merge")(spark, "/root/testdata/sf0.001")
      .head()
    assert(r.getAs[Boolean]("equivalent"))
    assert(r.getAs[Long]("n_delta_docs") > 0, "the hex-prefix rule must sample a batch")
    assert(r.getAs[Long]("gd_affected") > 0)
    // merged digest count = base digests + delta digests NEW to the base
    assert(r.getAs[Long]("n_merged") >= r.getAs[Long]("gd_base"))
    assert(r.getAs[Long]("n_merged") == r.getAs[Long]("n_scratch"))
    assert(r.getAs[String]("fp_merged") == r.getAs[String]("fp_scratch"))
  }
}
