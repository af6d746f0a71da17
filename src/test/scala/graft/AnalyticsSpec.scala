package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential + regression coverage for the analytics extras:
  *
  *   - the INTERSECT/EXCEPT retention twin must produce exactly the
  *     single-scan q39 answer (keeps `.intersect`/`.except` live-covered
  *     without paying 6 orders scans in the registered query surface);
  *   - q40's raw HLL estimate is pinned (the registered query only
  *     oracle-compares the within-10% claim, which would hide any
  *     regression that stays inside the band — HLL++ at fixed rsd on
  *     fixed data is deterministic, so the exact estimate is assertable).
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.01"

  test("retention set-op twin matches the single-scan q39 form") {
    val setOps = ops.AnalyticsExtras.retentionSetOps(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val oneScan = SparkEntry.queries("q39_retention_setops")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(setOps.nonEmpty)
    assert(setOps == oneScan)
  }

  test("q58 native session windows agree with the lag-based q33 sessions") {
    // identical gap semantics except at EXACTLY-30-min gaps (>= vs >),
    // which the continuous-timestamp testdata never hits: per-user
    // session counts and event totals must match
    val sw = SparkEntry.queries("q58_session_window")(spark, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val lagForm = SparkEntry.queries("q33_sessionize")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sw.nonEmpty && sw == lagForm)
  }

  test("q60 exploded centroids equal the typed VectorMean aggregator path") {
    // the registered (oracle-portable) posexplode form vs the scale path:
    // one VectorMean array buffer per label, no 64x row blowup
    val meanVec = udaf(graft.functions.VectorMean)
    val typed = Tables.embeddings(spark, d)
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .groupBy("label").agg(meanVec(col("v")).as("c"))
      .select(col("label"), posexplode(col("c")).as(Seq("pos", "v")))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val exploded = SparkEntry.queries("q60_label_centroids")(spark, d)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(typed.keySet == exploded.keySet && typed.nonEmpty)
    // exploded values carry ROUND(.,6); the paths differ only by FP
    // accumulation order, far inside the rounding grain
    typed.foreach { case (k, v) =>
      assert(math.abs(v - exploded(k)) <= 5.1e-7, s"cell $k: $v vs ${exploded(k)}")
    }
  }

  test("q61 sketches track the q121 exact twin; daily union equals the global sketch") {
    val out = SparkEntry.queries("q61_sketch_rollup")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ground truth = the REGISTERED oracle-checked exact twin, not an
    // inline recompute: the gate and the driver now verify one query
    val exact = SparkEntry.queries("q121_distinct_rollup_exact")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size == out.size && exact.keySet == out.keySet,
      "sketch and exact rollups must cover identical periods")
    // every estimate (per-day AND the ALL rollup) within 5% of exact
    exact.foreach { case (period, n) =>
      assert(math.abs(out(period) - n).toDouble / n < 0.05,
        s"$period: ${out(period)} vs $n")
    }
    // HLL unions are LOSSLESS register-max merges: the union of per-day
    // sketches must estimate identically to one sketch of everything
    val global = Tables.events(spark, d)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
      .collect().head.getLong(0)
    assert(out("ALL") == global,
      s"union-of-daily ${out("ALL")} != global sketch $global")
  }

  test("Misra-Gries sketch: heavy hitters survive eviction within n/(k+1)") {
    import spark.implicits._
    // k=4 forces real decrement/eviction churn: 40×hot1, 25×hot2, 30
    // singleton tail → n=95, error bound n/(k+1)=19
    val stream = Seq.fill(40)("hot1") ++ Seq.fill(25)("hot2") ++
      (1 to 30).map(i => s"tail$i")
    // deterministic interleave so the sketch can't ride a sorted stream
    val shuffled = stream.zipWithIndex
      .sortBy { case (t, i) => (i * 2654435761L) & 0xffffffffL }.map(_._1)
    val est = shuffled.toDF("t").repartition(4)
      .agg(graft.functions.FreqSketch(4)(col("t")).as("sk"))
      .select(explode(col("sk"))).as[(String, Long)].collect().toMap
    val bound = stream.size / 5
    assert(est.contains("hot1") && est.contains("hot2"),
      s"guaranteed heavy hitters evicted: $est")
    assert(est("hot1") <= 40 && 40 - est("hot1") <= bound, s"hot1: $est")
    assert(est("hot2") <= 25 && 25 - est("hot2") <= bound, s"hot2: $est")
  }

  test("q73 sketch top tokens track the exact q59 counts") {
    val exact = SparkEntry.queries("q59_top_tokens")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val sketch = SparkEntry.queries("q73_top_tokens_sketch")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Tables.documents(spark, d)
      .select(explode(split(trim(col("text")), "\\s+"))).count()
    val bound = n / 65 // k = 64 across the per-source and merge levels
    // the exact top-5 are far above the error floor here — each must
    // survive the per-source sketches AND the merge, estimated within
    // the Misra-Gries bound and never overcounted
    exact.take(5).foreach { case (tok, c) =>
      assert(sketch.contains(tok), s"exact top token '$tok' missing from q73")
      assert(sketch(tok) <= c, s"MG must undercount: $tok ${sketch(tok)} > $c")
      assert(c - sketch(tok) <= bound, s"$tok error ${c - sketch(tok)} > $bound")
    }
  }

  test("q107 gap fill: dense spine, zero-filled sums, carried-forward state") {
    // sf0.001 is sparse enough that real gaps exist (measured: 1000
    // events over 720 hours x several types)
    val sf = "/root/testdata/sf0.001"
    val filled = SparkEntry.queries("q107_gap_fill")(spark, sf).collect()
    val nTypes = Tables.events(spark, sf)
      .select("event_type").distinct().count()
    assert(filled.length == 720 * nTypes, "spine must be dense: 720 hours x types")
    val gaps = filled.filter(_.getLong(2) == 0)
    assert(gaps.nonEmpty, "degenerate test: no gaps to fill at this SF")
    gaps.foreach { r =>
      assert(r.getDouble(3) == 0.0, s"gap hour must zero-fill total: $r")
    }
    // forward fill: per type, walk hours in order; last_seen_total must
    // equal the most recent observed total (null before the first)
    filled.groupBy(_.getString(1)).foreach { case (_, rows) =>
      var lastSeen: Option[Double] = None
      rows.sortBy(_.getTimestamp(0).getTime).foreach { r =>
        if (r.getLong(2) > 0) lastSeen = Some(r.getDouble(3))
        (lastSeen, if (r.isNullAt(4)) None else Some(r.getDouble(4))) match {
          case (Some(e), Some(g)) => assert(e == g, s"ffill mismatch: $r")
          case (None, None) => ()
          case other => fail(s"ffill presence mismatch $other at $r")
        }
      }
    }
  }

  test("q40 raw HLL estimate is deterministic and pinned at rsd=0.02") {
    val est = Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // pinned values: a regression in the sketch (rsd plumbing, hashing,
    // estimator constants) that stays inside q40's 10% band is invisible
    // to the oracle compare but visible here
    assert(est == Seq(("A", 2019L, 2000L), ("N", 2019L, 2000L), ("R", 2019L, 2000L)),
      s"HLL estimate drifted: $est")
  }

  test("q115 BM25 matches an independent scalar reimplementation bit-for-bit") {
    // recompute everything (tokenization, tf, df, avgdl, scores, top-10)
    // in plain Scala from the raw text — same double formula, same
    // association order — and require exact row equality including the
    // rounded score. Catches any drift in the columnar expression shape.
    val small = "/root/testdata/sf0.001"
    val terms = graft.ops.TextAnalysis.BM25QueryTerms
    val raw = Tables.documents(spark, small)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val toks = raw.map { case (id, t) => (id, t.trim.split("\\s+").toSeq) }
    val n = toks.length.toLong
    val sumDl = toks.map(_._2.length.toLong).sum
    val avgdl = sumDl.toDouble / n
    val tf = toks.map { case (id, w) =>
      (id, w.length.toLong, terms.map(q => w.count(_ == q).toLong))
    }
    val df = terms.indices.map(i => tf.count(_._3(i) > 0).toLong)
    def score(dl: Long, tfs: Seq[Long]): Double =
      terms.indices.map { i =>
        val t = tfs(i).toDouble
        val idf = math.log((n - df(i) + 0.5) / (df(i) + 0.5) + 1.0)
        idf * (t * 2.2) / (t + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      }.reduce(_ + _)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = tf.map { case (id, dl, tfs) =>
      (id, dl, tfs(0), tfs(1), tfs(2), r6(score(dl, tfs)))
    }.sortBy { case (id, _, _, _, _, s) => (-s, id) }.take(10).toSeq
    val got = SparkEntry.queries("q115_bm25_retrieval")(spark, small)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.exists(_._6 > 0.0), "testdata trap: all-zero BM25 scores")
  }
}
