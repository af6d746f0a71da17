package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Product quantization — the memory-compression half of the IVF-PQ
  * design every billion-scale ANN system runs (IVF prunes WHAT to scan,
  * q42; PQ compresses what remains so a 64-dim float vector becomes a
  * few bytes of codebook indices and distance estimation never touches
  * the original vectors). Each vector splits into [[SubSpaces]]
  * sub-vectors; an independent k-means codebook is trained per subspace
  * (Lloyd's, reusing q132's EXACT-INTEGER machinery so training is
  * bit-reproducible across engines and shuffle orders); a vector's code
  * is its per-subspace nearest-centroid ids.
  *
  * Scale shape: training is FUSED across subspaces — per Lloyd round,
  * one narrow pass assigns every subspace's code and one 512-key
  * map-side-combined shuffle updates every codebook (see
  * [[trainCodebooks]]). Code ASSIGNMENT is a single narrow select
  * computing all 8 codes as literal-centroid expressions — no join, no
  * shuffle; at 100 TB the codebooks ride the closure (8 × 8 × 8 longs)
  * and the corpus pays one pass. The ADC search path (estimate distance
  * from codes alone) is spec-gated against exact brute force (PqSpec
  * recall + own-code quantization-error rank); the code TABLE is the
  * oracle-checked anchor (q147), the composed IVF+ADC+rerank search is
  * q148.
  */
object PqOps {

  private[graft] val SubSpaces = 8
  private[graft] val SubDim = 8 // 64 dims / 8 subspaces
  // K=8 (3-bit codes): the oracle's CTE count is K-independent (only
  // the cent tables grow rows), and 8 centroids/subspace lifts ADC
  // recall@10 well above the K=4 draft (0.26 mean — too coarse to
  // certify ranking behavior)
  private[graft] val K = 8
  private[graft] val Iters = 2

  /** Exact integer squared distance from a `q` sub-vector column to a
    * literal centroid (the q132 expression shape).
    */
  private def dist2(qcol: Column, cv: Seq[Long]): Column =
    aggregate(
      zip_with(qcol, typedLit(cv), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  private def subSlice(s: Int): Column =
    slice(col("q"), s * SubDim + 1, SubDim)

  /** (vec_id, q, c0..c7): all 8 codes against the given codebooks in
    * two chained NARROW projections — every per-centroid distance named
    * once, then the 8 argmin when-chains over the named columns. (An
    * inlined draft duplicated each dist2 subtree O(K²) times per code
    * column and spent most of its wall-clock in Catalyst analysis.)
    */
  private def codesFor(pts: DataFrame,
                       books: Seq[Seq[(Int, Seq[Long])]]): DataFrame = {
    val distCols = for {
      (cents, sub) <- books.zipWithIndex
      (c, cv) <- cents.sortBy(_._1)
    } yield dist2(subSlice(sub), cv).as(s"d_${sub}_$c")
    val withD = pts.select(col("vec_id") +: col("q") +: distCols: _*)
    val codeCols = books.zipWithIndex.map { case (cents, sub) =>
      val ids = cents.map(_._1).sorted
      val chain = ids.init.zipWithIndex.foldRight(lit(ids.last): Column) {
        case ((c, i), rest) =>
          val leqLater = ids.drop(i + 1)
            .map(cj => col(s"d_${sub}_$c") <= col(s"d_${sub}_$cj"))
            .reduce(_ && _)
          when(leqLater, lit(c)).otherwise(rest)
      }
      chain.as(s"c$sub")
    }
    withD.select(col("vec_id") +: col("q") +: codeCols: _*)
  }

  /** Train ALL [[SubSpaces]] codebooks simultaneously: per Lloyd round,
    * ONE narrow assignment pass produces every subspace's code, and ONE
    * (sub, cluster, dim) shuffle — SubSpaces·K·SubDim = 512 keys,
    * map-side combined — yields every codebook's update. A
    * subspace-at-a-time draft ran ~24 small jobs (8 seeds + 16
    * assign/update collects) and spent 25+ s in scheduler overhead at
    * sf0.01; this shape is seed + Iters jobs TOTAL, and at 100 TB it is
    * also the only sane plan (one corpus pass per round, not 8).
    * Semantics are identical to per-subspace q132 Lloyd (same seeds,
    * same integer argmin/floor-average, ties to the smaller id) — the
    * q147 oracle replays the per-subspace form and hash-matches.
    */
  private[graft] def trainCodebooks(pts: DataFrame): Seq[Seq[(Int, Seq[Long])]] = {
    val seedRows = pts.orderBy("vec_id").limit(K).collect()
    var books: Seq[Seq[(Int, Seq[Long])]] = (0 until SubSpaces).map { s =>
      seedRows.zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Long](1).slice(s * SubDim, (s + 1) * SubDim))
      }.toSeq
    }
    for (_ <- 1 to Iters) {
      val upd = codesFor(pts, books)
        .select(
          array((0 until SubSpaces).map(s => col(s"c$s")): _*).as("cs"),
          posexplode(col("q")).as(Seq("dim", "qv")))
        .select(
          expr(s"dim div $SubDim").cast("int").as("sub"),
          pmod(col("dim"), lit(SubDim)).as("sdim"),
          element_at(col("cs"),
            (expr(s"dim div $SubDim") + 1).cast("int")).as("cluster"),
          col("qv"))
        .groupBy("sub", "cluster", "sdim")
        .agg(sum(col("qv")).as("sq"), count(lit(1)).as("cnt"))
        .collect()
      books = upd.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (sub, rows) =>
        // clusters sorted so every consumer sees deterministic book order
        // (a sub can never be empty — every vector feeds every dim — so
        // the positional sub alignment below is safe)
        (sub, rows.groupBy(_.getInt(1)).toSeq.sortBy(_._1).map { case (c, dims) =>
          // floor division of non-negative longs == `div`'s semantics
          (c, dims.sortBy(_.getInt(2)).map(r => r.getLong(3) / r.getLong(4)).toSeq)
        })
      }.map(_._2)
    }
    books
  }

  /** The quantized point table, FrameMemo'd — q147, q148, and q117's
    * report all read it.
    */
  private[graft] def quantizedPts(s: SparkSession, d: String): DataFrame =
    FrameMemo.cached(s, d, "pq_pts")(ClusterOps.quantized(Tables.embeddings(s, d)))

  /** The trained codebooks as memoized DRIVER model state (the
    * EmbeddingOps.guardMemo pattern: keyed (applicationId, dir) under
    * FrameMemo's immutable-roots contract — training is deterministic,
    * so a cached model is THE model; mutable dirs retrain per call).
    */
  private val bookMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Seq[Seq[(Int, Seq[Long])]]]()

  private[graft] def booksOf(s: SparkSession, d: String): Seq[Seq[(Int, Seq[Long])]] =
    if (!FrameMemo.memoizable(d)) trainCodebooks(quantizedPts(s, d))
    else {
      val k = (s.sparkContext.applicationId, d)
      // get-then-put (not computeIfAbsent): training runs Spark jobs and
      // must never execute inside the map's lock; a duplicate concurrent
      // build is benign (deterministic — both produce the same model)
      val hit = bookMemo.get(k)
      if (hit != null) hit
      else {
        val built = trainCodebooks(quantizedPts(s, d))
        bookMemo.put(k, built)
        built
      }
    }

  def pqCodes(s: SparkSession, d: String): DataFrame =
    FrameMemo.cached(s, d, "pq_codes")(
      codesWith(quantizedPts(s, d), booksOf(s, d)))
      .orderBy("vec_id")

  /** ADC (asymmetric distance computation): estimate ||query - x||² for
    * every coded vector WITHOUT touching x — sum, over subspaces, of the
    * exact distance from the query's sub-vector to x's assigned
    * centroid. This is the search-time half of PQ: per query the 8×K
    * lookup table folds into literals and the scan reads only the code
    * columns. Exposed for PqSpec's recall/error gates against exact
    * brute force (rows-only by design — the gate IS the check; the code
    * table q147 is the oracle-checked anchor).
    */
  private[graft] def adcDistances(codes: DataFrame,
                                  books: Seq[Seq[(Int, Seq[Long])]],
                                  query: Seq[Long]): DataFrame = {
    val est = (0 until SubSpaces).map { s =>
      val qSub = query.slice(s * SubDim, (s + 1) * SubDim)
      val lut = books(s).sortBy(_._1).map { case (c, cv) =>
        (c, qSub.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      lut.init.foldRight(lit(lut.last._2): Column) { case ((c, v), rest) =>
        when(col(s"c$s") === c, lit(v)).otherwise(rest)
      }
    }.reduce(_ + _)
    codes.select(col("vec_id"), est.as("adc_d2"))
  }

  /** Codes against ALREADY-trained books (q148 composes; q147 trains). */
  private[graft] def codesWith(pts: DataFrame,
                               books: Seq[Seq[(Int, Seq[Long])]]): DataFrame =
    codesFor(pts, books)
      .select(col("vec_id") +: (0 until SubSpaces).map(s => col(s"c$s")): _*)

  /** Per-candidate ADC estimate for a SET of queries: outer when-chain
    * on query_id, inner chain on each code column against the query's
    * precomputed 8×K lookup table — all literals, flat integer whens
    * (cheap for Catalyst, unlike duplicated aggregate subtrees), so the
    * whole multi-query estimate is one codegen-friendly expression over
    * the code columns.
    */
  private[graft] def adcForQueries(qs: Seq[(Long, Seq[Long])],
                                   books: Seq[Seq[(Int, Seq[Long])]]): Column =
    qs.map { case (qid, qvec) =>
      val est = (0 until SubSpaces).map { s =>
        val qSub = qvec.slice(s * SubDim, (s + 1) * SubDim)
        val lut = books(s).sortBy(_._1).map { case (c, cv) =>
          (c, qSub.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum)
        }
        lut.init.foldRight(lit(lut.last._2): Column) { case ((c, v), rest) =>
          when(col(s"c$s") === c, lit(v)).otherwise(rest)
        }
      }.reduce(_ + _)
      (qid, est)
    }.foldRight(lit(Long.MaxValue): Column) { case ((qid, e), rest) =>
      when(col("query_id") === qid, e).otherwise(rest)
    }

  /** How many ADC-ranked candidates survive to the exact rerank. */
  private[graft] val Shortlist = 20

  /** q148: the COMPOSED billion-scale search path — IVF picks WHICH
    * cells to scan (q42's coarse quantizer, nprobe=2), PQ's ADC ranks
    * the probed candidates from CODES ALONE (no vector reads), and only
    * the [[Shortlist]] ADC survivors pay an exact cosine rerank. Same
    * output contract as q42/q31 (top-5 per anchor query). This is the
    * standard IVF-ADC layout (raw-vector codebooks; residual encoding is
    * the production refinement, noted in SCALING.md). Rows-only —
    * iterative float k-means + hash-free but code-ranked search isn't
    * portable SQL; q117's report gains a q148 recall row and PqSpec
    * gates the shortlist behavior.
    */
  def ivfPqSearch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.cosine
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centroids = FrameMemo.cached(s, d, "pq_coarse_centroids")(
      SimilaritySearch.kmeansCentroids(e, k = 16, iters = 2))
    val books = booksOf(s, d)
    // the index: one IVF cell + one PQ code per vector (v kept only for
    // the final shortlist rerank — ADC itself never touches it).
    // FrameMemo'd: this IS the stored index a production system builds
    // once per corpus snapshot and serves many queries from
    val indexed = FrameMemo.cached(s, d, "pq_ivf_index")(
      SimilaritySearch.assignClusters(e, centroids)
        .join(codesWith(quantizedPts(s, d), books), Seq("vec_id")))
    val anchor = e.filter(col("vec_id") < 10)
    val qQuant = quantizedPts(s, d).filter(col("vec_id") < 10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq // 10 rows: model state
    val q = SimilaritySearch.probeClusters(anchor, centroids, nprobe = 2)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cluster"))
    val wAdc = Window.partitionBy("query_id").orderBy(col("adc"), col("vec_id"))
    val w5 = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    broadcast(q).join(indexed, Seq("cluster"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("adc", adcForQueries(qQuant, books))
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= Shortlist)
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w5).cast("int"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos_r"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_pq_codes" -> ((s, d) => pqCodes(s, d)),
    "q148_knn_ivf_pq" -> ((s, d) => ivfPqSearch(s, d)))

  /** The oracle replays the identical per-subspace Lloyd chains as
    * MATERIALIZED CTEs (the q132 design, once per subspace: seed from
    * the K smallest vec_ids, [[Iters]] assign/update rounds, final
    * assignment), then pivots the 8 final assignments onto one row per
    * vector. Integer quantization makes every step bit-equal.
    */
  private def q147OracleSql: String = {
    def assignSql(sub: Int, cent: String): String =
      s"""  SELECT vec_id, cluster FROM (
         |    SELECT p.vec_id, c.cluster,
         |           ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |             ORDER BY SUM((p.q - c.cq) * (p.q - c.cq)), c.cluster) AS rn
         |    FROM pts$sub p JOIN $cent c USING (dim)
         |    GROUP BY p.vec_id, c.cluster
         |  ) WHERE rn = 1""".stripMargin
    def updateSql(sub: Int, a: String): String =
      s"""  SELECT a.cluster, p.dim, CAST(SUM(p.q) // COUNT(*) AS BIGINT) AS cq
         |  FROM $a a JOIN pts$sub p USING (vec_id)
         |  GROUP BY a.cluster, p.dim""".stripMargin
    val chains = (0 until SubSpaces).map { s =>
      val rounds = (1 to Iters).map { i =>
        s"""a${i}_$s AS MATERIALIZED (
           |${assignSql(s, s"c${i - 1}_$s")}
           |), c${i}_$s AS MATERIALIZED (
           |${updateSql(s, s"a${i}_$s")}
           |)""".stripMargin
      }.mkString(",\n")
      s"""pts$s AS MATERIALIZED (
         |  SELECT vec_id, dim - ${s * SubDim} AS dim, q FROM pts
         |  WHERE dim >= ${s * SubDim} AND dim < ${(s + 1) * SubDim}
         |), c0_$s AS MATERIALIZED (
         |  SELECT sd.cluster, p.dim, p.q AS cq
         |  FROM seed sd JOIN pts$s p USING (vec_id)
         |),
         |$rounds,
         |code_$s AS MATERIALIZED (
         |${assignSql(s, s"c${Iters}_$s")}
         |)""".stripMargin
    }.mkString(",\n")
    val joins = (0 until SubSpaces)
      .map(s => s"JOIN code_$s ON code_$s.vec_id = e.vec_id").mkString("\n")
    val cols = (0 until SubSpaces).map(s => s"code_$s.cluster AS c$s").mkString(", ")
    s"""WITH pts AS MATERIALIZED (
       |  SELECT vec_id, CAST(t.i AS INTEGER) AS dim,
       |         CAST(ROUND(CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE) * 1000.0) AS BIGINT) + ${ClusterOps.Offset} AS q
       |  FROM embeddings, range(${ClusterOps.Dims}) t(i)
       |), seed AS MATERIALIZED (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster, vec_id
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $K)
       |),
       |$chains
       |SELECT e.vec_id, $cols
       |FROM embeddings e
       |$joins
       |ORDER BY e.vec_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map("q147_pq_codes" -> q147OracleSql)
  val rowsOnly: Set[String] = Set("q148_knn_ivf_pq")
}
