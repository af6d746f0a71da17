package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{VectorFunctions => VF}

/** Native Catalyst expressions vs their HOF reference implementations:
  * identical results (same accumulation order ⇒ bitwise-equal doubles),
  * plus SQL registration via GraftExtensions.
  */
class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native dot/cosine bitwise-match the HOF reference on testdata") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50)
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
    val diffs = pairs.select(
      (VF.dot(col("a.v"), col("b.v")) =!= VF.dotHof(col("a.v"), col("b.v"))).as("d1"),
      (VF.cosine(col("a.v"), col("b.v")) =!= VF.cosineHof(col("a.v"), col("b.v"))).as("d2"))
    assert(diffs.filter(col("d1") || col("d2")).isEmpty)
  }

  test("native dot matches a scala left-fold reference on random vectors") {
    val rnd = new scala.util.Random(1234)
    val cases = (1 to 30).map { _ =>
      val n = 1 + rnd.nextInt(100)
      (Array.fill(n)(rnd.nextDouble() * 2000 - 1000),
        Array.fill(n)(rnd.nextDouble() * 2000 - 1000))
    }
    val df = cases.toDF("a", "b")
    val got = df.select(VF.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    val want = cases.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("dot of mismatched lengths is null, not an error") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(df.select(VF.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("a null array element propagates to a null result (codegen + interpreted)") {
    // codegen path: DataFrame projection over a containsNull array
    val df = Seq((Seq(Option(1.0), None), Seq(Option(3.0), Option(4.0))))
      .toDF("a", "b")
    val r = df.select(VF.dot(col("a"), col("b")).as("d"),
      VF.cosine(col("a"), col("b")).as("c")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1),
      "null element must not be read as 0.0 (DuckDB propagates NULL)")
    // interpreted path: direct eval on literal arrays with a null slot
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val arrT = ArrayType(DoubleType, containsNull = true)
    val withNull = Literal.create(Seq[Any](1.0, null), arrT)
    val plain = Literal.create(Seq[Any](3.0, 4.0), arrT)
    assert(graft.expressions.DotProduct(withNull, plain).eval() == null)
    assert(graft.expressions.DotProduct(plain, withNull).eval() == null)
    assert(graft.expressions.CosineSimilarity(withNull, plain).eval() == null)
    assert(graft.expressions.CosineSimilarity(plain, withNull).eval() == null)
    // sanity: the same shapes without the null slot still compute
    assert(graft.expressions.DotProduct(plain, plain).eval() == 25.0)
  }

  test("extensions register SQL functions: cosine_similarity/dot_product/simhash64") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) c,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) d,
        |       simhash64(array('a', 'b', 'a')) s""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
    assert(r.getDouble(1) == 11.0)
    // simhash64 of a fixed token bag is a stable value
    val again = spark.sql("SELECT simhash64(array('a', 'b', 'a'))").collect()(0)
    assert(r.getLong(2) == again.getLong(0))
    // float arrays are coerced via the Cast wrapper
    val f = spark.sql(
      "SELECT dot_product(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
      .collect()(0)
    assert(f.getDouble(0) == 3.0)
    // zorder16: interleave (3, 5) = 0b100111 = 39; int args coerce to long
    val z = spark.sql("SELECT zorder16(3, 5)").collect()(0)
    assert(z.getLong(0) == 39L)
  }

  test("native shingles match the HOF reference on the documents corpus") {
    import graft.functions.{TextFunctions => TF}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
      (TF.shingles(col("text"), 3) =!= TF.shinglesHof(col("text"), 3)).as("d"))
    assert(diff.filter(col("d")).isEmpty)
  }

  test("VectorMean aggregator: element-wise mean with map-side combine") {
    val df = Seq(
      (0, Array(1.0, 2.0, 3.0)),
      (0, Array(3.0, 4.0, 5.0)),
      (1, Array(10.0, 20.0, 30.0))).toDF("g", "v")
      .repartition(3) // force partial buffers to merge
    val meanVec = udaf(graft.functions.VectorMean)
    val r = df.groupBy("g").agg(meanVec(col("v")).as("m"))
      .orderBy("g").collect()
    assert(r(0).getSeq[Double](1) == Seq(2.0, 3.0, 4.0))
    assert(r(1).getSeq[Double](1) == Seq(10.0, 20.0, 30.0))
  }

  test("every custom expression: interpreted path equals the codegen path on real data") {
    // the oracle/specs exercise whatever path Spark picks — codegen, by
    // default — so a divergence between doGenCode and eval would ship
    // silently and only surface when a plan falls back to interpretation
    // (codegen compile failure, >64KB method, SPARK conf drift). Force
    // NO_CODEGEN and compare every custom expression's output frame
    // bit-for-bit against the default-path run.
    val d = "/root/testdata/sf0.001"
    def sample() = {
      val docs = Tables.documents(spark, d).limit(50)
        .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("w"))
      val embs = Tables.embeddings(spark, d).limit(50)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      docs.crossJoin(embs.limit(1).select(col("v").as("v1")))
        .join(embs.limit(2), col("doc_id") % 2 === col("vec_id") % 2)
        .select(
          col("doc_id"), col("vec_id"),
          VF.dot(col("v"), col("v1")).as("dot"),
          VF.cosine(col("v"), col("v1")).as("cos"),
          graft.ops.Dedup.simhash(col("w")).as("sh"),
          graft.ops.Dedup.minhashSignature(col("w")).as("mh"),
          graft.functions.TextFunctions.shingles(concat_ws(" ", col("w")), 3).as("sg"),
          expr("zorder16(cast(doc_id % 65536 as int), cast(vec_id % 65536 as int))").as("z"),
          // decomposed suffix forces the non-trivial normalize branch
          expr("nfc_normalize(concat(concat_ws(' ', w), 'e\\u0301'))").as("nfc"))
    }
    val defaultRows = sample().collect().map(_.toString).sorted
    val conf = spark.conf
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val prevWhole = conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      conf.set("spark.sql.codegen.wholeStage", "false")
      val interpretedRows = sample().collect().map(_.toString).sorted
      assert(interpretedRows.sameElements(defaultRows),
        "interpreted eval diverges from the codegen path")
    } finally {
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
      conf.set("spark.sql.codegen.wholeStage", prevWhole)
    }
  }

  test("nfc_normalize: composes decomposed sequences, passes normalized text through") {
    GraftExtensions.register(spark) // self-sufficient under test filtering
    val cases = Seq(
      ("e\u0301", "\u00e9"),             // e + combining acute -> composed
      ("\u00e9", "\u00e9"),              // already composed: unchanged
      ("plain ascii 42", "plain ascii 42"),
      ("A\u030A", "\u00C5"),             // A + ring above -> Aring
      // canonical ordering + composition: d + dot-above + dot-below
      // reorders (below before above) then composes d+dot-below
      ("d\u0307\u0323", "\u1E0D\u0307"),
      ("\uD834\uDD1E", "\uD834\uDD1E")) // non-BMP passes through intact
    val df = cases.map(_._1).toDF("s")
      .select(col("s"), expr("nfc_normalize(s)").as("n"))
    df.collect().zip(cases).foreach { case (r, (in, want)) =>
      assert(r.getString(1) == want,
        s"nfc('${in.map(c => "%04x".format(c.toInt)).mkString(" ")}') -> " +
          s"'${r.getString(1).map(c => "%04x".format(c.toInt)).mkString(" ")}'")
    }
    // null propagates, non-string is a plan-time error
    assert(Seq[Option[String]](None).toDF("s")
      .select(expr("nfc_normalize(s)")).collect()(0).isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("i").select(expr("nfc_normalize(i)")).collect()
    }
    // the DuckDB contract the q142 oracle leans on: md5 of the composed
    // UTF-8 bytes (duckdb: md5(nfc_normalize('cafe' || chr(769))))
    val m = Seq("cafe\u0301").toDF("s")
      .select(md5(expr("nfc_normalize(s)").cast("binary"))).collect()(0).getString(0)
    assert(m == org.apache.commons.codec.digest.DigestUtils.md5Hex(
      "caf\u00e9".getBytes("UTF-8")))
  }

  test("minhash signature: similar sets share most minima, is deterministic") {
    val sh1 = (1 to 50).map(i => s"s$i")
    val sh2 = (1 to 48).map(i => s"s$i") ++ Seq("x", "y")
    val df = Seq((sh1.toArray, sh2.toArray)).toDF("a", "b")
    val r = df.select(
      graft.ops.Dedup.minhashSignature(col("a")).as("ma"),
      graft.ops.Dedup.minhashSignature(col("b")).as("mb")).collect()(0)
    val ma = r.getSeq[Long](0)
    val mb = r.getSeq[Long](1)
    assert(ma.length == 32)
    val agree = ma.zip(mb).count { case (x, y) => x == y }
    assert(agree >= 24, s"estimated jaccard ${agree / 32.0} too far from 0.92")
    val again = df.select(graft.ops.Dedup.minhashSignature(col("a"))).collect()(0)
    assert(again.getSeq[Long](0) == ma)
  }

  test("gram_hashes: native == the retired HOF polynomial chain; interpreted == codegen; SQL-registered") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.expressions.GramHashes
    val spark2 = spark
    import spark2.implicits._
    // the retired HOF formulation, kept as the cross-check reference
    def hofGrams(df: org.apache.spark.sql.DataFrame) = {
      def gramHash(a: Column, p: Column): Column =
        graft.ops.Winnowing.PolyCoef.zipWithIndex.map { case (coef, o) =>
          element_at(a, p + lit(o)).cast("long") * lit(coef)
        }.reduce(_ + _) % lit(graft.ops.Winnowing.HashMod)
      df.select(col("id"),
        transform(split(col("c"), ""), ch => ascii(ch)).as("a"),
        (length(col("c")) - 7).as("m"))
        .select(col("id"), transform(sequence(lit(1), col("m")),
          p => gramHash(col("a"), p)).as("hs"))
    }
    val fixtures = Seq(
      (1L, "abcdefgh"),                        // exactly one gram
      (2L, "aaaaaaaaaa"),                      // repeated chars: rolling must not drift
      (3L, "thequickbrownfox0123456789"),
      (4L, "z" * 200 + "energy" + "q" * 200))  // long input: many rolling updates
    val df = fixtures.toDF("id", "c")
    val native = df.select(col("id"),
      ColumnBridge.column(GramHashes(ColumnBridge.expression(col("c")))).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = hofGrams(df).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == hof, "native rolling hash diverged from the HOF polynomial")
    // sub-k input yields an EMPTY array, never null
    val short = Seq((9L, "abc")).toDF("id", "c")
      .select(ColumnBridge.column(GramHashes(ColumnBridge.expression(col("c")))).as("hs"))
      .collect()(0).getSeq[Long](0)
    assert(short.isEmpty)
    // interpreted eval == the codegen'd frame path
    val interpreted = GramHashes(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("aaaaaaaaaa")))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    assert(interpreted == native(2L))
    // SQL surface via GraftExtensions
    GraftExtensions.register(spark) // self-sufficient under test filtering
    val viaSql = spark.sql(
      "SELECT gram_hashes('abcdefgh') AS hs").collect()(0).getSeq[Long](0)
    assert(viaSql == native(1L))
  }
}
