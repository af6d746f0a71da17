package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph compute over engine-derived edge lists. The dedup
  * connected components (Dedup.scala) cover reachability; PageRank adds
  * the weighted-iteration family — the centrality pass a crawl/corpus
  * pipeline runs to weight sources, here over the k-NN similarity graph
  * (q90), where high rank marks vectors central to dense semantic
  * neighborhoods (prototypes) and low rank marks outliers.
  */
object GraphOps {

  val Damping = 0.85
  val Iters = 10

  /** PageRank over a directed edge list (src, dst). Each iteration is
    * ONE join (ranks → edges on src) + ONE aggregate (sum contributions
    * by dst) + a broadcast-folded dangling-mass scalar — the sparse
    * matrix-vector product in relational form. No driver-side state
    * beyond the two scalars (n, dangling mass); ranks/edges stay
    * partitioned. Lineage is truncated per round (localCheckpoint, the
    * q47 pointer-jumping discipline) so the plan doesn't grow with the
    * iteration count.
    */
  private[graft] def pageRank(edges: DataFrame, nodes: DataFrame,
                              iters: Int = Iters): DataFrame = {
    val n = nodes.count()
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // static per run, materialized once: edges with their source degree,
    // and each node's degree (null deg = dangling — no out-edges)
    val linked = edges.join(outDeg, Seq("src")).localCheckpoint()
    val nodeDeg = nodes
      .join(outDeg.withColumnRenamed("src", "id"), Seq("id"), "left_outer")
      .localCheckpoint()
    var ranks = nodeDeg.select(col("id"), col("deg"), lit(1.0 / n).as("rank"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      // mass leaving via edges; dangling mass redistributes uniformly
      // (the standard correction: without it rank mass drains every
      // iteration). The dangling scalar stays a 1-row broadcast frame —
      // ONE action per round (the checkpoint), no driver-side .head()
      // TWO shuffles per round, not three: edge contributions UNION a
      // zero row per node feed ONE groupBy that both sums inflow and
      // (via max over the zero rows' deg) re-derives each node's
      // degree — so no left-outer join back to the node list is
      // needed. Shuffle joins throughout: broadcast-hinting the O(|V|)
      // rank/contrib frames measured SLOWER here (a driver collect per
      // round) and would cap the operator at driver memory anyway.
      val r = ranks.select(col("id").as("rid"), col("rank"))
      val edgeRows = linked.join(r, col("rid") === col("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .withColumn("deg", lit(null).cast("long"))
      val zeroRows = nodeDeg.select(col("id"), lit(0.0).as("c"), col("deg"))
      val dangling = ranks
        .agg(coalesce(sum(when(col("deg").isNull, col("rank"))), lit(0.0)).as("dm"))
      ranks = edgeRows.unionByName(zeroRows)
        .groupBy("id")
        // max(deg) = the zero row's degree (edge rows carry null); a
        // dangling node's zero row also carries null -> deg stays null
        .agg(sum(col("c")).as("inflow"), max(col("deg")).as("deg"))
        .crossJoin(broadcast(dangling))
        .select(col("id"), col("deg"),
          (lit((1.0 - Damping) / n) + lit(Damping) * col("dm") / n +
            lit(Damping) * col("inflow")).as("rank"))
      // checkpoint EVERY round: the next round's dangling broadcast is
      // its own job, and without a materialization barrier it would
      // re-execute all rounds since the last checkpoint (quadratic
      // re-work — measured 1.4x slower on a 5-round cadence)
      ranks = ranks.localCheckpoint()
    }
    ranks.select(col("id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PageRank over the LSH k-NN graph's directed edges. Rows-only:
    // the fixpoint isn't portable SQL (and double summation order makes
    // ranks reproducible only to ~1e-12); GraphSpec pins mass
    // conservation and a driver-side reference replay instead, and the
    // output rounds to 6 digits so the report is presentation-stable.
    "q93_pagerank" -> ((s, d) => {
      val edges = SimilaritySearch.graphQueries("q90_knn_graph_lsh")(s, d)
        .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      val nodes = graft.Tables.embeddings(s, d).select(col("vec_id").as("id"))
      pageRank(edges, nodes)
        .select(col("id").as("vec_id"), round(col("rank"), 6).as("rank_r"))
        .orderBy("vec_id")
    })
  )

  val oracleSql: Map[String, String] = Map.empty
  val rowsOnly: Set[String] = Set("q93_pagerank")
}
