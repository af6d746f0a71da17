package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{LabelProp, PqOps, Sampling}

/** q191 behavior pins: one-round vote semantics (majority, smallest-
  * label tie-break, clamped seeds, abstention) on a hand graph, the
  * propagation invariants on the corpus, and a full driver brute-force
  * replay of graph + both rounds on sf0.001.
  */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("q191 vote round: majority wins, ties to smallest label, seeds clamp, no-neighbor abstains") {
    // graph: 10 -> {1,2,3}; 11 -> {1,2}; 12 -> {13}; seed labels:
    // 1->7, 2->5, 3->5; 13 unlabeled; 20 labeled seed (clamped).
    val knn = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L), (11L, 2L),
      (12L, 13L)).toDF("src", "nbr")
    val prev = Seq((1L, Some(7)), (2L, Some(5)), (3L, Some(5)),
      (10L, None), (11L, None), (12L, None), (13L, None), (20L, Some(9)))
      .toDF("vec_id", "lab")
    val got = LabelProp.propagate(knn, prev).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got(10L) == Some(5), "majority 5 over 7")             // 2 votes 5, 1 vote 7
    assert(got(11L) == Some(5), "tie 5 vs 7 -> smallest label")  // 1 vote each
    assert(got(12L) == None, "only unlabeled neighbor -> abstain")
    assert(got(13L) == None, "no in-graph votes -> stays null")
    assert(got(20L) == Some(9), "labeled node is clamped")
  }

  test("q191 corpus invariants: seeds clamped, labels monotone, labeled-by-r2 needs a seeded cell") {
    val rows = SparkEntry.queries("q191_label_propagation")(spark, "/root/testdata/sf0.01")
      .collect()
    val seedCells = rows.filter(_.getString(3) == "train").map(_.getInt(1)).toSet
    var nonSeedLabeled = 0
    for (r <- rows) {
      val (cell, lab, split) = (r.getInt(1), r.getInt(2), r.getString(3))
      val lp1 = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val lp2 = if (r.isNullAt(5)) None else Some(r.getInt(5))
      if (split == "train") assert(lp1 == Some(lab) && lp2 == Some(lab), s"seed drifted: $r")
      if (lp1.isDefined) assert(lp2 == lp1, s"labeled node re-voted: $r")
      if (lp2.isDefined && split != "train") {
        nonSeedLabeled += 1
        assert(seedCells.contains(cell), s"label crossed a cell boundary: $r")
      }
    }
    assert(nonSeedLabeled > 10, s"propagation reached only $nonSeedLabeled non-seeds")
  }

  test("q191: engine equals a driver brute-force replay of graph + 2 rounds") {
    val sf = "/root/testdata/sf0.001"
    val cells = PqOps.residCodes(spark, sf).select("vec_id", "coarse").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qs = PqOps.quantizedPts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val splits = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), Sampling.splitOf(col("vec_id")).as("split"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    val ids = qs.keys.toSeq.sorted
    val knn: Map[Long, Seq[Long]] = ids.map { i =>
      val nbrs = ids.filter(j => j != i && cells(j) == cells(i))
        .map { j =>
          val d2 = qs(i).zip(qs(j)).map { case (x, y) => (x - y) * (x - y) }.sum
          (d2, j)
        }.sorted.take(LabelProp.K).map(_._2)
      i -> nbrs
    }.toMap
    def round(prev: Map[Long, Option[Int]]): Map[Long, Option[Int]] =
      prev.map {
        case (v, Some(l)) => v -> Some(l)
        case (v, None) =>
          // .toSeq BEFORE mapping: a Map keyed by -count collapses ties
          val votes = knn(v).flatMap(prev(_)).groupBy(identity).toSeq
            .map { case (l, vs) => (-vs.size, l) }.sorted
          v -> votes.headOption.map(_._2)
      }
    val l0: Map[Long, Option[Int]] = ids.map { v =>
      v -> (if (splits(v)._2 == "train") Some(splits(v)._1) else None)
    }.toMap
    val l1 = round(l0); val l2 = round(l1)
    val got = SparkEntry.queries("q191_label_propagation")(spark, sf).collect()
    assert(got.length == ids.size)
    for (r <- got) {
      val v = r.getLong(0)
      val lp1 = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val lp2 = if (r.isNullAt(5)) None else Some(r.getInt(5))
      assert(lp1 == l1(v) && lp2 == l2(v), s"vec $v: engine ($lp1,$lp2) vs brute (${l1(v)},${l2(v)})")
    }
  }
}
