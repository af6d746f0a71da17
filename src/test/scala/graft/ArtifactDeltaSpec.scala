package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q224 behavior pins: the manifest MERGE must equal a from-scratch
  * rebuild bit-for-bit — including the UPSERT case the corpus split
  * cannot produce (a re-ingested doc whose content changed), and the
  * equivalence verdict must actually trip on a corrupted merge.
  */
class ArtifactDeltaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private def totals(manifest: org.apache.spark.sql.DataFrame): (Long, String) = {
    val r = manifest.agg(sum(col("n_rows")),
      (sum(col("fp_mod")) % lit(ops.LakehouseOps.Mod64))
        .cast("decimal(38,0)").cast("string")).head()
    (r.getLong(0), r.getString(1))
  }

  test("merge with an overwritten doc + a new doc equals the from-scratch manifest") {
    val v1a = "the quick brown fox jumps over the lazy dog"
    val v1b = "pack my box with five dozen liquor jugs"
    val v2b = "sphinx of black quartz judge my vow fresh content"
    val newC = "how vexingly quick daft zebras jump around"
    val base = ops.ArtifactDelta.manifestOf(docs(1L -> v1a, 2L -> v1b))
    val delta = ops.ArtifactDelta.manifestOf(docs(2L -> v2b, 3L -> newC))
    val merged = ops.ArtifactDelta.mergeManifests(base, delta)
    val scratch = ops.ArtifactDelta.manifestOf(docs(1L -> v1a, 2L -> v2b, 3L -> newC))
    // row-level equality, not just totals: the upsert must REPLACE doc 2
    val m = merged.collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toString)).toSet
    val s0 = scratch.collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toString)).toSet
    assert(m == s0)
    assert(totals(merged) == totals(scratch))
    // the stale base row for doc 2 must NOT equal the fresh one (the
    // sensitivity that makes the equality above meaningful)
    val stale = base.filter(col("doc_id") === 2L).head().getDecimal(2).toString
    val fresh = delta.filter(col("doc_id") === 2L).head().getDecimal(2).toString
    assert(stale != fresh)
  }

  test("a corrupted merge (dropped delta doc) breaks the equivalence totals") {
    val base = ops.ArtifactDelta.manifestOf(docs(1L -> "the quick brown fox jumps over it"))
    val delta = ops.ArtifactDelta.manifestOf(docs(2L -> "pack my box with five dozen jugs"))
    val merged = ops.ArtifactDelta.mergeManifests(base, delta)
    val corrupted = ops.ArtifactDelta.mergeManifests(base,
      delta.filter(col("doc_id") =!= 2L))
    val scratch = ops.ArtifactDelta.manifestOf(
      docs(1L -> "the quick brown fox jumps over it", 2L -> "pack my box with five dozen jugs"))
    assert(totals(merged) == totals(scratch))
    assert(totals(corrupted) != totals(scratch))
  }

  test("q224 on the corpus: equivalent, disjoint delta, rows add up") {
    val r = SparkEntry.queries("q224_artifact_delta_merge")(spark, "/root/testdata/sf0.001")
      .head()
    assert(r.getAs[Boolean]("equivalent"))
    assert(r.getAs[Long]("n_delta_docs") > 0, "the hex-prefix rule must sample a delta")
    assert(r.getAs[Long]("rows_base") + r.getAs[Long]("rows_delta")
      == r.getAs[Long]("rows_merged"))
    assert(r.getAs[Long]("rows_merged") == r.getAs[Long]("rows_scratch"))
    assert(r.getAs[String]("fp_merged") == r.getAs[String]("fp_scratch"))
  }
}
