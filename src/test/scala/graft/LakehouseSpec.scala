package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q80 SCD2 history + q87 incremental gold: interval invariants, the
  * incremental-equals-full differential, and the one-exchange plan pin.
  */
class LakehouseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q80 intervals tile each customer's timeline") {
    val h = SparkEntry.queries("q80_scd2_history")(spark, sf)
      .select("custkey", "version", "valid_from", "valid_to", "is_current")
    val rows = h.collect()
    assert(rows.nonEmpty)
    // exactly one open (is_current) interval per customer
    val openPerCust = h.groupBy("custkey")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("open"))
      .filter(col("open") =!= 1).count()
    assert(openPerCust == 0, "each customer must have exactly one current row")
    // versions are contiguous from 1
    val badVersions = h.groupBy("custkey")
      .agg(min("version").as("lo"), max("version").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(badVersions == 0, "versions must be 1..n with no gaps")
    // each interval closes exactly where the next opens, and never inverts
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("custkey").orderBy("version")
    val chain = h
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull)
    assert(chain.filter(col("valid_to") =!= col("next_from")).count() == 0,
      "valid_to must equal the next version's valid_from")
    assert(chain.filter(col("valid_to") < col("valid_from")).count() == 0,
      "intervals must not invert")
  }

  test("q80 run-length encoding matches a per-customer replay") {
    // independent oracle: replay one customer's orders in date order and
    // run-length encode the priorities imperatively
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        col("o_orderkey"), col("o_orderpriority"))
      .collect()
      .groupBy(_.getLong(0))
    val history = SparkEntry.queries("q80_scd2_history")(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
    assert(history.keySet == orders.keySet)
    history.foreach { case (cust, rows) =>
      val expected = orders(cust)
        .sortBy(r => (r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
        .map(_.getString(3))
        .foldLeft(List.empty[(String, Int)]) {
          case (acc @ ((p, n) :: tail), cur) if p == cur => (p, n + 1) :: tail
          case (acc, cur) => (cur, 1) :: acc
        }.reverse
      val got = rows.sortBy(_.getInt(1))
        .map(r => (r.getString(2), r.getLong(5).toInt)).toList
      assert(got == expected, s"run mismatch for customer $cust")
    }
  }

  test("q80 shares one exchange across lag, running sum, agg, and lead") {
    val p = SparkEntry.queries("q80_scd2_history")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"expected exactly 1 hash exchange (custkey reused throughout), got $exchanges:\n$p")
  }

  test("q87 incremental merge equals the one-pass full recompute") {
    val merged = SparkEntry.queries("q87_incremental_gold")(spark, sf)
    val full = ops.LakehouseOps.goldFull(spark, sf)
    assert(merged.count() == full.count())
    // exact equality both ways (decimal partial-merge is lossless)
    assert(merged.except(full).count() == 0)
    assert(full.except(merged).count() == 0)
  }

  test("q87 batch-side scan pushes the cutoff predicate") {
    val p = SparkEntry.queries("q87_incremental_gold")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"), s"no pushed filters:\n$p")
    assert(p.contains("o_orderdate"), s"cutoff not visible at the scan:\n$p")
  }

  test("q99 incremental SCD2 splice equals the full rebuild (q80)") {
    val full = SparkEntry.queries("q80_scd2_history")(spark, sf)
    val inc = SparkEntry.queries("q99_scd2_incremental")(spark, sf)
    assert(inc.count() == full.count())
    assert(inc.except(full).count() == 0)
    assert(full.except(inc).count() == 0)
    // the batch actually touches some customers AND leaves some alone,
    // or the splice proves nothing
    import org.apache.spark.sql.functions._
    val touched = Tables.orders(spark, sf)
      .filter(to_date(col("o_orderdate")) >= lit("2001-01-01").cast("date"))
      .select("o_custkey").distinct().count()
    val allCusts = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(touched > 0 && touched < allCusts,
      s"degenerate split: $touched of $allCusts customers touched")
  }

  test("mergeAdditive folds many partials to the full recompute with a stable schema") {
    import org.apache.spark.sql.functions._
    // split the fact 5 ways by key hash, merge the partials one at a
    // time (the nightly-batch cadence) — equality must be exact and
    // the measure types must not widen across merges
    val partials = (0 until 5).map { i =>
      ops.LakehouseOps.goldMonthly(spark, sf, pmod(col("o_orderkey"), lit(5)) === i)
    }
    val folded = partials.reduce { (acc, next) =>
      ops.LakehouseOps.mergeAdditive(acc, next,
        Seq("region_name", "year", "month"), Seq("revenue", "n_orders"))
    }
    val full = ops.LakehouseOps.goldMonthly(spark, sf, lit(true))
    assert(folded.schema("revenue").dataType ==
      partials.head.schema("revenue").dataType, "measure type drifted")
    assert(folded.count() == full.count())
    assert(folded.except(full).count() == 0)
    assert(full.except(folded).count() == 0)
  }

  test("q109 snapshots place each existing customer in exactly one interval") {
    val census = SparkEntry.queries("q109_dim_snapshot")(spark, sf)
      .collect().groupBy(_.getDate(0).toString)
    assert(census.keySet == Set("1996-01-01", "1998-01-01", "2000-01-01"))
    // per probe date, the census total must equal the number of
    // customers whose history had started — interval tiling (pinned in
    // the q80 test) makes membership exactly-one for those, zero before
    val firstSeen = SparkEntry.queries("q80_scd2_history")(spark, sf)
      .groupBy("custkey").agg(min("valid_from").as("first_from"))
      .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate)
    census.foreach { case (snap, rows) =>
      val d = java.time.LocalDate.parse(snap)
      val expected = firstSeen.count(!_._2.isAfter(d))
      val got = rows.map(_.getLong(2)).sum
      assert(got == expected, s"census at $snap: $got != $expected existing customers")
      assert(got > 0, s"degenerate probe date $snap")
    }
  }

  test("q102 diff applied to snapshot A reproduces snapshot B exactly") {
    // the defining CDC invariant: apply(A, diff(A,B)) == B
    val a = ops.LakehouseOps.orderState(spark, sf,
      col("l_shipdate") <= lit("1998-06-30 23:59:59").cast("timestamp"))
      .collect().map(r => r.getLong(0) -> (r.getDecimal(1), r.getDecimal(2)))
      .toMap
    val b = ops.LakehouseOps.orderState(spark, sf,
      col("l_returnflag") =!= "R")
      .collect().map(r => r.getLong(0) -> (r.getDecimal(1), r.getDecimal(2)))
      .toMap
    val diff = SparkEntry.queries("q102_snapshot_diff")(spark, sf).collect()
    assert(diff.nonEmpty)
    val byType = diff.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(Set("insert", "delete", "update").subsetOf(byType.keySet),
      s"expected all three change types at this SF, got $byType")
    val applied = diff.foldLeft(a) { (state, r) =>
      val k = r.getLong(0)
      r.getString(1) match {
        case "delete" =>
          assert(state.contains(k)); state - k
        case "insert" =>
          assert(!state.contains(k))
          state + (k -> (BigDecimal(r.getDouble(3)).bigDecimal
            .setScale(2), BigDecimal(r.getDouble(5)).bigDecimal.setScale(2)))
        case "update" =>
          assert(state.contains(k))
          state + (k -> (BigDecimal(r.getDouble(3)).bigDecimal
            .setScale(2), BigDecimal(r.getDouble(5)).bigDecimal.setScale(2)))
      }
    }
    assert(applied == b, "diff application must reconstruct snapshot B")
  }

  test("q102 plans one co-partitioned full-outer join, no fact broadcast") {
    val plan = SparkEntry.queries("q102_snapshot_diff")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("BroadcastHashJoin"),
      "neither snapshot side may broadcast — both are fact-sized")
    // each side partial-aggregates before its exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      "expected two-phase aggregation on both snapshot sides")
  }

  test("q103 fingerprint is row-order invariant and mergeable") {
    def fps(df: org.apache.spark.sql.DataFrame): Map[String, (Long, BigInt)] =
      df.collect().map(r =>
        r.getString(0) -> (r.getLong(1), BigInt(r.getString(2)))).toMap
    val full = fps(SparkEntry.queries("q103_table_fingerprint")(spark, sf))
    assert(full.nonEmpty)
    // permutation invariance: a shuffled layout fingerprints identically
    val docs = Tables.documents(spark, sf)
    def fpOf(df: org.apache.spark.sql.DataFrame) = fps(
      df.withColumn("fp", ops.LakehouseOps.rowFingerprint64(
        ops.LakehouseOps.fingerprintInput(Seq(
          col("doc_id"), col("lang"), col("source"),
          col("n_chars"), col("text")))))
        .groupBy("source")
        .agg(count(lit(1)).as("n_rows"),
          (sum(col("fp")) % lit(ops.LakehouseOps.Mod64))
            .cast("decimal(38,0)").cast("string").as("fingerprint")))
    assert(fpOf(docs.repartition(7, col("text"))) == full)
    // mergeability: disjoint halves mod-sum to the full fingerprint
    val mod = BigInt(1) << 64
    val lo = fpOf(docs.filter(col("doc_id") % 2 === 0))
    val hi = fpOf(docs.filter(col("doc_id") % 2 === 1))
    full.foreach { case (src, (n, fp)) =>
      val (nLo, fpLo) = lo.getOrElse(src, (0L, BigInt(0)))
      val (nHi, fpHi) = hi.getOrElse(src, (0L, BigInt(0)))
      assert(nLo + nHi == n)
      assert((fpLo + fpHi) % mod == fp, s"merge mismatch for $src")
    }
    // sensitivity: one edited row flips its source's fingerprint only
    val edited = fpOf(docs.withColumn("text",
      when(col("doc_id") === 0, concat(col("text"), lit("X")))
        .otherwise(col("text"))))
    val editedSrc = docs.filter(col("doc_id") === 0)
      .select("source").head().getString(0)
    assert(edited(editedSrc)._2 != full(editedSrc)._2)
    assert(edited.filterNot(_._1 == editedSrc) ==
      full.filterNot(_._1 == editedSrc))
  }

  test("fingerprintInput is injective across separator and null traps") {
    import spark.implicits._
    // each pair serializes two DIFFERENT logical rows that a naive
    // concat_ws("|", ...) maps to the SAME string
    val traps = Seq(
      (("a|b", "c"), ("a", "b|c")),       // separator inside a field
      (("a\\|b", "c"), ("a\\", "b|c")),   // escape char next to separator
      ((null: String, "x"), ("\\N", "x")),// genuine null vs literal marker
      (("", "x"), (null: String, "x")))   // empty string vs null
    traps.foreach { case ((a1, a2), (b1, b2)) =>
      val out = Seq((a1, a2), (b1, b2)).toDF("f1", "f2")
        .select(ops.LakehouseOps.fingerprintInput(
          Seq(col("f1"), col("f2"))).as("s"))
        .as[String].collect()
      assert(out(0) != out(1),
        s"collision: ($a1, $a2) and ($b1, $b2) both encode to ${out(0)}")
    }
  }

  test("q103 row hash matches an independent JVM md5 lower-64") {
    import spark.implicits._
    val got = Seq("abc", "", "graft|fingerprint|row").toDF("s")
      .select(ops.LakehouseOps.rowFingerprint64(col("s")).cast("string"))
      .as[String].collect().map(BigInt(_))
    val want = Seq("abc", "", "graft|fingerprint|row").map { s =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 to 7).map(i => BigInt(d(8 + i) & 0xff) << (8 * i)).sum
    }
    assert(got.toSeq == want)
  }
}
