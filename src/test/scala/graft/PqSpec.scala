package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ClusterOps, PqOps}

/** q147 product quantization: code-table invariants plus the gates the
  * oracle hash can't express — ADC (code-only) distance estimation must
  * actually rank like the exact distances it approximates.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private lazy val pts = ClusterOps.quantized(Tables.embeddings(spark, d))
    .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  test("q147 codes: one row per vector, every code a valid centroid id, deterministic") {
    val run1 = SparkEntry.queries("q147_pq_codes")(spark, d).collect()
    assert(run1.length == pts.size)
    run1.foreach { r =>
      (1 to PqOps.SubSpaces).foreach { i =>
        val c = r.getInt(i)
        assert(c >= 0 && c < PqOps.K, s"code $c out of [0, ${PqOps.K})")
      }
    }
    val run2 = SparkEntry.queries("q147_pq_codes")(spark, d).collect()
    assert(run1.map(_.toSeq).toSeq == run2.map(_.toSeq).toSeq,
      "PQ training must be bit-deterministic run-over-run")
  }

  test("q147 ADC: estimates rank close to exact integer distances (recall gate)") {
    val ptsDf = ClusterOps.quantized(Tables.embeddings(spark, d)).localCheckpoint()
    val books = PqOps.trainCodebooks(ptsDf)
    val codes = SparkEntry.queries("q147_pq_codes")(spark, d)
    def exactD2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val queryIds = pts.keys.toSeq.sorted.take(5)
    val (rawRecalls, rerankRecalls) = queryIds.map { qid =>
      val q = pts(qid)
      val exactAll = pts.toSeq.filter(_._1 != qid)
        .map { case (id, v) => id -> exactD2(q, v) }
        .sortBy { case (id, dd) => (dd, id) }
      val exactTop = exactAll.take(10).map(_._1).toSet
      val adcAll = PqOps.adcDistances(codes, books, q.toSeq).collect()
        .filter(_.getLong(0) != qid)
        .map(r => r.getLong(0) -> r.getLong(1))
        .sortBy { case (id, dd) => (dd, id) }
      val adcTop = adcAll.take(10).map(_._1).toSet
      // the DEPLOYED shape: ADC shortlists 50 of 500, exact rerank wins
      val shortlist = adcAll.take(50).map(_._1).toSet
      val reranked = exactAll.filter(p => shortlist(p._1)).take(10).map(_._1).toSet
      ((exactTop & adcTop).size / 10.0, (exactTop & reranked).size / 10.0)
    }.unzip
    val rawMean = rawRecalls.sum / rawRecalls.length
    val rrMean = rerankRecalls.sum / rerankRecalls.length
    info(f"raw ADC recall@10: ${rawRecalls.mkString(", ")} (mean $rawMean%.2f)")
    info(f"shortlist-50 + exact rerank recall@10: ${rerankRecalls.mkString(", ")} (mean $rrMean%.2f)")
    // gates pinned from measurement with margin. Raw ADC certifies the
    // estimates RANK like the exact metric (K=8 codes over 500 vectors
    // measured 0.32); the rerank gate is the deployment contract — ADC
    // only chooses what gets exactly COMPARED (the q74 LSH discipline).
    assert(rawMean >= 0.25, f"mean raw ADC recall@10 $rawMean%.2f below gate")
    assert(rrMean >= 0.60, f"mean shortlist-rerank recall@10 $rrMean%.2f below gate")
  }

  test("q147 ADC: a vector's own-code distance is its quantization error, near the bottom") {
    val ptsDf = ClusterOps.quantized(Tables.embeddings(spark, d)).localCheckpoint()
    val books = PqOps.trainCodebooks(ptsDf)
    val codes = SparkEntry.queries("q147_pq_codes")(spark, d)
    val qid = pts.keys.min
    val adc = PqOps.adcDistances(codes, books, pts(qid).toSeq).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val own = adc(qid)
    val below = adc.values.count(_ < own)
    info(s"own-code ADC distance $own; ${below}/${adc.size} vectors estimate closer")
    assert(own >= 0)
    assert(below <= adc.size / 10,
      s"own quantization error should sit in the bottom decile, got rank $below")
  }
}
