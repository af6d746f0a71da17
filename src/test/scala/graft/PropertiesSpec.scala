package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Medallion, StarOps}
import graft.ops.ScaleOps

/** Property-based invariants (raw ScalaCheck driven from ScalaTest — the
  * scalatestplus bridge isn't on the offline classpath). Small frame
  * sizes keep each Spark job cheap; 20 cases per property.
  */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(20).withWorkers(1)

  private def check(name: String)(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  private val kvGen: Gen[List[(Int, Int, Double)]] =
    Gen.listOfN(30, for {
      k <- Gen.chooseNum(1, 5)
      t <- Gen.chooseNum(1, 4)
      v <- Gen.chooseNum(-100, 100).map(_.toDouble)
    } yield (k, t, v))

  test("upsertFact is idempotent and key-complete for any frames") {
    check("upsertFact") {
      Prop.forAll(kvGen, kvGen) { (base0, upd0) =>
        // one row per pk on each side (merge contract)
        val base = base0.distinctBy(r => (r._1, r._2))
        val upd = upd0.distinctBy(r => (r._1, r._2))
        val b = base.toDF("k", "t", "v")
        val u = upd.toDF("k", "t", "v")
        val once = StarOps.upsertFact(b, u, Seq("k", "t")).cache()
        val twice = StarOps.upsertFact(once, u, Seq("k", "t"))
        val idempotent = twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty
        val keys = once.select("k", "t").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
        val expectKeys = base.map(r => (r._1, r._2)).toSet ++ upd.map(r => (r._1, r._2)).toSet
        val updatesWin = upd.forall { case (k, t, v) =>
          once.filter(col("k") === k && col("t") === t)
            .collect().headOption.exists(_.getDouble(2) == v)
        }
        idempotent && keys == expectKeys && updatesWin
      }
    }
  }

  test("saltedSum equals plain sum for any frame and salt count") {
    check("saltedSum") {
      Prop.forAll(kvGen, Gen.chooseNum(1, 16)) { (rows, salts) =>
        val df = rows.toDF("k", "t", "v")
        val plain = df.groupBy("k").agg(sum("v").as("sum_v"))
        val salted = ScaleOps.saltedSum(df, Seq("k"), "v", salts)
        salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty
      }
    }
  }

  test("cleaning is idempotent: cleaning clean data changes nothing") {
    check("cleanIdempotent") {
      Prop.forAll(Gen.listOfN(15, for {
        d <- Gen.chooseNum(1, 28)
        r <- Gen.oneOf("North", "South")
        s <- Gen.oneOf("Gas", "Oil")
        c <- Gen.chooseNum(0, 1000000).map(_.toDouble)
        t <- Gen.chooseNum(-40, 60).map(_.toDouble)
      } yield (f"2023-01-$d%02d", r, s, c.toString, t.toString))) { rows =>
        val bronze = rows.toDF("date", "region", "energy_source",
          "consumption_mwh", "temperature_c")
        val once = Medallion.cleanEnergy(bronze)
        val twice = Medallion.cleanEnergy(
          once.select(date_format(col("date"), "yyyy-MM-dd").as("date"),
            col("region"), col("energy_source"),
            col("consumption_mwh").cast("string"),
            col("temperature_c").cast("string")))
        twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty
      }
    }
  }

  test("dedupComponents matches a union-find oracle on random graphs") {
    // differential check of the distributed pointer-jumping loop against
    // a driver-side union-find on random edge lists — covers shapes the
    // hand-built chain/island tests don't (cycles, stars, cross-links).
    // 8 seeded graphs keep the Spark-job cost bounded; ScalaCheck's 20
    // cases x several rounds each would dominate the suite's runtime.
    val rng = new scala.util.Random(7)
    (1 to 8).foreach { trial =>
      val n = 2 + rng.nextInt(24)
      val edges = (1 to n).map(_ =>
        (rng.nextInt(20).toLong, rng.nextInt(20).toLong, 0.9))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        // union-find oracle
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b, _) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(x => x -> find(x)).toMap
        val got = ops.Dedup.dedupComponents(
          edges.toDF("doc_a", "doc_b", "jaccard"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == want, s"trial $trial (${edges.size} edges): $got vs $want")
      }
    }
  }

  test("Misra-Gries bound holds for any stream and any merge split") {
    // driver-side property over the raw Aggregator (no Spark job): for
    // ANY token stream and ANY split into two partial sketches, every
    // estimate undercounts, the error is <= n/(k+1), and every item
    // with true count > n/(k+1) survives
    val streamGen = Gen.listOfN(120,
      Gen.frequency(5 -> Gen.const("hotA"), 3 -> Gen.const("hotB"),
        4 -> Gen.chooseNum(1, 40).map(i => s"t$i")))
    check("misra-gries") {
      Prop.forAll(streamGen, Gen.chooseNum(0, 120), Gen.chooseNum(2, 8)) {
        (stream, splitAt, k) =>
          val sk = new graft.functions.FreqSketch(k)
          val (l, r) = stream.splitAt(math.min(splitAt, stream.size))
          val est = sk.finish(sk.merge(
            l.foldLeft(sk.zero)(sk.reduce), r.foldLeft(sk.zero)(sk.reduce)))
          val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val bound = stream.size.toLong / (k + 1)
          est.forall { case (t, c) => c <= exact(t) && exact(t) - c <= bound } &&
            exact.forall { case (t, c) => c <= bound || est.contains(t) }
      }
    }
  }

  test("rolling md5 fingerprint equals a brute-force reference on random docs") {
    // the q120 plan (narrow HOF digests + slice-sum windows) vs a straight
    // Scala computation of the same spec: h = first 12 hex chars of
    // md5(token) as a long; windows = 8-token sums at starts
    // 0..max(n-8, 0); signature = (min, max)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def reference(toks: List[String]): (Long, Long, Int) = {
      val h = toks.map(t => java.lang.Long.parseLong(md5hex(t).take(12), 16))
      val sums = (0 to math.max(h.size - 8, 0))
        .map(i => h.slice(i, i + 8).sum)
      (sums.min, sums.max, toks.size)
    }
    val tokGen = Gen.chooseNum(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty),
        Gen.oneOf("the", "a", "spark", "join", "x"))))
    check("rollingFingerprintMd5")(
      Prop.forAll(Gen.listOfN(5, tokGen)) { docs0 =>
        val docs = docs0.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
        val df = docs.toDF("doc_id", "text")
        val got = graft.ops.TextAnalysis.rollingFingerprintMd5(df)
          .collect().map(r => r.getLong(0) ->
            (r.getLong(3), r.getLong(4), r.getInt(2), r.getString(1))).toMap
        docs0.zipWithIndex.forall { case (toks, i) =>
          val (mn, mx, n) = reference(toks)
          val (gmn, gmx, gn, gmd5) = got(i.toLong)
          gmn == mn && gmx == mx && gn == n &&
            gmd5 == md5hex(toks.mkString(" "))
        }
      })
  }

  test("minhash band agreement is monotone in true jaccard") {
    // not a strict property of single draws - check on expectation with
    // fixed pairs: supersets agree at least as much as subsets
    val base = (1 to 40).map(i => s"s$i")
    val near = base.take(38) ++ Seq("x1", "x2")
    val far = (100 to 140).map(i => s"v$i")
    val df = Seq((base.toArray, near.toArray, far.toArray)).toDF("a", "b", "c")
    val r = df.select(
      graft.ops.Dedup.minhashSignature(col("a")).as("sa"),
      graft.ops.Dedup.minhashSignature(col("b")).as("sb"),
      graft.ops.Dedup.minhashSignature(col("c")).as("sc")).collect()(0)
    def agree(x: Seq[Long], y: Seq[Long]) = x.zip(y).count(p => p._1 == p._2)
    val sa = r.getSeq[Long](0); val sb = r.getSeq[Long](1); val sc = r.getSeq[Long](2)
    assert(agree(sa, sb) > agree(sa, sc))
    assert(agree(sa, sc) <= 2) // disjoint sets: near-zero agreement
  }
}
