package graft

import org.scalatest.funsuite.AnyFunSuite

/** Retrieval family: the oracle hashes prove engine ≡ SQL replay; these
  * pins prove the operators do their JOBS — BM25 ranks by the formula's
  * intent, and MMR's picked set is actually more diverse than the plain
  * top-k it replaces.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("q149 BM25: contiguous ranks, positive scores, hits bounded by query terms") {
    val rows = SparkEntry.queries("q149_bm25_retrieval")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val ranks = rs.map(_.getInt(3)).sorted
      assert(ranks.toSeq == (1 to ranks.length), s"ranks not contiguous for query $qid")
    }
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.0, "BM25 scores are positive in the +1-idf form")
      val hits = r.getLong(2)
      assert(hits >= 1 && hits <= graft.ops.Retrieval.TermsPerQuery)
    }
  }

  test("q154 MMR: picked set is more diverse than the plain top-k") {
    import graft.ops.{ClusterOps, Retrieval}
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val vecs = Tables.embeddings(spark, d)
      .selectExpr("vec_id", "cast(embedding as array<double>) v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for { i <- ids.indices; j <- i + 1 until ids.length }
        yield cos(vecs(ids(i)), vecs(ids(j)))
      ps.sum / ps.length
    }
    val mmr = SparkEntry.queries("q154_mmr_diversify")(spark, d).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSeq).toMap
    val top5 = SparkEntry.queries("q30_knn_bruteforce")(spark, d).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val qids = mmr.keys.toSeq.sorted
    val (mmrSim, topSim) = (
      qids.map(q => meanPairSim(mmr(q))).sum / qids.length,
      qids.map(q => meanPairSim(top5(q))).sum / qids.length)
    info(f"mean within-set similarity: MMR $mmrSim%.4f vs plain top-5 $topSim%.4f")
    assert(mmrSim < topSim,
      f"MMR set ($mmrSim%.4f) must be more diverse than plain top-5 ($topSim%.4f)")
    // and relevance shouldn't collapse: every MMR pick sits in the
    // candidate shortlist by construction (top-20 by cosine)
    mmr.foreach { case (q, ids) =>
      assert(ids.length == Retrieval.MmrK)
      assert(ids.distinct.length == ids.length, s"duplicate picks for query $q")
    }
  }
}
