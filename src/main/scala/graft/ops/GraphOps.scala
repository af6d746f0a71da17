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
    // (src, dst, deg) — static per run; materialized once
    val linked = edges.join(outDeg, Seq("src")).localCheckpoint()
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank")).localCheckpoint()
    for (_ <- 1 to iters) {
      // mass leaving via edges; nodes with no out-edges are dangling —
      // their mass redistributes uniformly (the standard correction:
      // without it rank mass drains every iteration)
      val contrib = ranks.join(linked, ranks("id") === linked("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("inflow"))
      val danglingMass = ranks.join(outDeg, ranks("id") === outDeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val base = (1.0 - Damping) / n + Damping * danglingMass / n
      ranks = nodes.select(col("id"))
        .join(contrib, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(base) + lit(Damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    ranks
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
