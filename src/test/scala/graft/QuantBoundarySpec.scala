package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r15-advice ULP gates for the two micro-nat model edges that
  * lacked one: q153's Naive-Bayes weight grid and q157/q160's DSIR
  * importance model. Both quantize raw doubles with ROUND(x·10⁶) and
  * rely on JVM/DuckDB libm bit-agreement BEFORE the round — the
  * documented hazard at [[graft.ops.Retrieval]].quant, measured here
  * on the ORACLE SF (sf0.01, where the driver hash-compares) via the
  * shared [[UlpBoundary]] helper. If a gate fires after a corpus or
  * libm change, the diagnosis is this boundary, not the engine.
  */
class QuantBoundarySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.01"

  test("q153: no NB weight or prior ln sits near a .5 boundary") {
    import graft.functions.TextFunctions.tokens
    // replay the exact model-edge arithmetic of NaiveBayes.classifierOn:
    // w = ln((c+1)/(tot_s+V))·1e6 over the DENSE vocab × class grid
    // (absent counts smooth to c=0), prior = ln(nd/nTrain)·1e6
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        graft.ops.Sampling.splitOf(col("doc_id")).as("split"), col("text"))
    val trainTok = docs.filter(col("split") === "train")
      .select(col("source"), explode(tokens(col("text"))).as("term"))
    val cnt = trainTok.groupBy("term", "source").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val tots = cnt.groupBy(_._1._2).map { case (s, m) => s -> m.values.sum }
    val vocab = cnt.keysIterator.map(_._1).toSet
    val vSize = vocab.size
    val priors = docs.filter(col("split") === "train")
      .groupBy("source").agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val nTrain = priors.map(_._2).sum
    val weightLns = for (t <- vocab.iterator; (s, tot) <- tots.iterator)
      yield math.log((cnt.getOrElse((t, s), 0L) + 1).toDouble / (tot + vSize)) * 1e6
    val priorLns = priors.iterator.map { case (_, nd) =>
      math.log(nd.toDouble / nTrain) * 1e6 }
    val m = UlpBoundary.minMargin(weightLns ++ priorLns)
    assert(vocab.nonEmpty && priors.nonEmpty)
    info(f"q153 min distance of any weight/prior ln·1e6 to a .5 boundary: $m%.2e")
    assert(m > UlpBoundary.Floor,
      f"an NB model value sits $m%.2e from a rounding boundary — see Retrieval.quant's hazard note")
  }

  test("q157/q160: no DSIR λ or Gumbel key sits near a .5 boundary") {
    import graft.functions.TextFunctions.{ngrams, tokens}
    import graft.ops.Dsir
    // λ_b = (ln((cp+1)/(pTot+B)) − ln((cq+1)/(qTot+B)))·1e6 per bucket:
    // the quantized value is the DIFFERENCE, so the boundary test runs
    // on exactly that expression (per-term margins would over-reject)
    val feats = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        explode(concat(tokens(col("text")), ngrams(col("text"), 2))).as("t"))
      .select(col("source"),
        pmod(conv(substring(md5(col("t").cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(Dsir.Buckets.toLong)).as("b"))
    val perBucket = feats.groupBy("b").agg(
        sum(when(col("source") === Dsir.TargetSource, 1L).otherwise(0L)).as("cp"),
        sum(when(col("source") =!= Dsir.TargetSource, 1L).otherwise(0L)).as("cq"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pTot = perBucket.valuesIterator.map(_._1).sum
    val qTot = perBucket.valuesIterator.map(_._2).sum
    val lamRaw = (0L until Dsir.Buckets.toLong).iterator.map { b =>
      val (cp, cq) = perBucket.getOrElse(b, (0L, 0L))
      (math.log((cp + 1).toDouble / (pTot + Dsir.Buckets).toDouble)
        - math.log((cq + 1).toDouble / (qTot + Dsir.Buckets).toDouble)) * 1e6
    }
    // q160's hash-derived Gumbel noise: u has 2^20 distinct values by
    // construction, so gate the full support, not just this corpus's ids
    val gumbelRaw = (0L until (1L << 20)).iterator.map { h =>
      val u = (h + 0.5) / (1L << 20).toDouble
      -math.log(-math.log(u)) * 1e6
    }
    val mLam = UlpBoundary.minMargin(lamRaw)
    val mG = UlpBoundary.minMargin(gumbelRaw)
    assert(pTot > 0 && qTot > 0)
    info(f"q157 min λ·1e6 boundary distance: $mLam%.2e; q160 Gumbel: $mG%.2e")
    assert(mLam > UlpBoundary.Floor,
      f"a DSIR λ sits $mLam%.2e from a rounding boundary — see Retrieval.quant's hazard note")
    assert(mG > UlpBoundary.Floor,
      f"a Gumbel key sits $mG%.2e from a rounding boundary — see Retrieval.quant's hazard note")
  }
}
