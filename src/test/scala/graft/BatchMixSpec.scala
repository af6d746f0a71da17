package graft

import org.scalatest.funsuite.AnyFunSuite
import java.security.MessageDigest

/** q198 behavior pins: conservation laws on the corpus histogram and
  * a full driver brute-force replay of the hash order, batch cut, and
  * histogram.
  */
class BatchMixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q198: histogram equals a driver brute force of the hash shuffle") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ordered = docs.sortBy { case (id, _) => (md5hex(id.toString), id) }
    val perBatch = ordered.grouped(32).map { b =>
      val bySrc = b.groupBy(_._2).map { case (_, v) => v.size.toLong }
      (b.size.toLong, bySrc.size.toLong, bySrc.max)
    }.toSeq
    val expected = perBatch.groupBy(_._2).toSeq.sortBy(_._1).map { case (ds, bs) =>
      val docsN = bs.map(_._1).sum
      val domSum = bs.map(_._3).sum
      (ds, bs.size.toLong, docsN, bs.map(_._3).max, domSum * 1000000L / docsN)
    }
    val got = SparkEntry.queries("q198_batch_mix_audit")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"engine:\n${got.mkString("\n")}\nexpected:\n${expected.mkString("\n")}")
    // conservation: batches and docs add up
    assert(got.map(_._2).sum == (docs.size + 31) / 32)
    assert(got.map(_._3).sum == docs.size.toLong)
  }

  test("q198: the hash shuffle actually mixes — no source-homogeneous full batch on the corpus") {
    val rows = SparkEntry.queries("q198_batch_mix_audit")(spark, "/root/testdata/sf0.01")
      .collect()
    // with 20 roughly-even sources and B=32, a full batch collapsing to
    // 1-2 sources would be a shuffle bug; dominance stays well under B
    for (r <- rows) {
      assert(r.getLong(0) > 2L, s"near-homogeneous batch bucket: $r")
      assert(r.getLong(3) < 16L, s"dominant source >= half the batch: $r")
    }
  }
}
