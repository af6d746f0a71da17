package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (SURVEY.md §2 inventory plus the
  * training-data-pipeline extensions); `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The longest parity chain (SURVEY §7.2): scan → clean → agg → join →
    * null-safe divide → window top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.ParityQueries.queries("q03_topk_months_per_region")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline extensions (text analysis, dedup, similarity
    * search, events, multimodal).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.ParityQueries.queries ++ ops.TextAnalysis.queries ++
      ops.Dedup.allQueries ++ ops.SimilaritySearch.allQueries ++
      ops.EventsOps.allQueries ++ ops.Multimodal.queries ++
      ops.AnalyticsExtras.queries ++ ops.Sampling.queries ++
      ops.CorpusSignals.queries ++ ops.EmbeddingOps.queries ++
      ops.CorpusPrep.queries ++ ops.LakehouseOps.queries ++
      ops.IntervalOps.queries ++ ops.CorpusReports.queries ++
      ops.GraphOps.queries ++ sources.Layout.queries ++
      sources.DataSkipping.queries ++ ops.ScaleOps.queries ++
      ops.SegmentDedup.queries ++ streaming.StreamingQueries.queries ++
      ops.ProfileOps.queries ++ ops.ClusterOps.queries ++
      ops.LmTokenizer.queries ++ ops.PqOps.queries ++
      ops.Retrieval.queries ++ ops.NaiveBayes.queries ++
      ops.Winnowing.queries ++ ops.UnigramLm.queries ++
      ops.Dsir.queries ++ ops.Mining.queries ++ ops.WordPiece.queries ++
      ops.SymSpell.queries ++ ops.LinearProbe.queries ++ ops.QualityBuckets.queries ++ ops.CountMin.queries ++ ops.Chunking.queries ++ ops.QlRetrieval.queries ++ ops.ExactSubstr.queries ++ ops.EpochAllocation.queries ++ ops.BatchPlan.queries ++ ops.VocabCoverage.queries ++ ops.ClassifierEval.queries ++ ops.NoveltyCurve.queries ++ ops.QualitySweep.queries ++ ops.CentroidMatrix.queries ++ ops.Collocations.queries ++ ops.DataCard.queries ++ ops.VectorCard.queries ++ ops.SplitBalance.queries ++ ops.SourceProfile.queries ++ ops.LabelDispersion.queries ++ ops.SourceEntropy.queries ++ ops.LabelProp.queries ++ ops.ZipfFit.queries ++ ops.HeapsCurve.queries ++ ops.CellValidity.queries ++ ops.VocabOverlap.queries ++ ops.CondEntropy.queries ++ ops.CopyMass.queries ++ ops.BatchMix.queries ++ ops.QualityQuartiles.queries ++ ops.SkewCensus.queries ++ ops.Retention.queries ++ ops.RfmSegments.queries ++ ops.BasketAffinity.queries ++ ops.NumericCorr.queries ++ ops.AbcPareto.queries ++ ops.YoyGrowth.queries ++ ops.GiniConcentration.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.ParityQueries.oracleSql ++ ops.TextAnalysis.oracleSql ++
      ops.Dedup.oracleSql ++ ops.SimilaritySearch.oracleSql ++
      ops.EventsOps.oracleSql ++ ops.Multimodal.oracleSql ++
      ops.AnalyticsExtras.oracleSql ++ ops.Sampling.oracleSql ++
      ops.CorpusSignals.oracleSql ++ ops.EmbeddingOps.oracleSql ++
      ops.CorpusPrep.oracleSql ++ ops.LakehouseOps.oracleSql ++
      ops.IntervalOps.oracleSql ++ ops.CorpusReports.oracleSql ++
      sources.Layout.oracleSql ++ sources.DataSkipping.oracleSql ++
      ops.ScaleOps.oracleSql ++ ops.SegmentDedup.oracleSql ++
      ops.GraphOps.oracleSql ++ streaming.StreamingQueries.oracleSql ++
      ops.ProfileOps.oracleSql ++ ops.ClusterOps.oracleSql ++
      ops.LmTokenizer.oracleSql ++ ops.PqOps.oracleSql ++
      ops.Retrieval.oracleSql ++ ops.NaiveBayes.oracleSql ++
      ops.Winnowing.oracleSql ++ ops.UnigramLm.oracleSql ++
      ops.Dsir.oracleSql ++ ops.Mining.oracleSql ++ ops.WordPiece.oracleSql ++
      ops.SymSpell.oracleSql ++ ops.LinearProbe.oracleSql ++ ops.QualityBuckets.oracleSql ++ ops.CountMin.oracleSql ++ ops.Chunking.oracleSql ++ ops.QlRetrieval.oracleSql ++ ops.ExactSubstr.oracleSql ++ ops.EpochAllocation.oracleSql ++ ops.BatchPlan.oracleSql ++ ops.VocabCoverage.oracleSql ++ ops.ClassifierEval.oracleSql ++ ops.NoveltyCurve.oracleSql ++ ops.QualitySweep.oracleSql ++ ops.CentroidMatrix.oracleSql ++ ops.Collocations.oracleSql ++ ops.DataCard.oracleSql ++ ops.VectorCard.oracleSql ++ ops.SplitBalance.oracleSql ++ ops.SourceProfile.oracleSql ++ ops.LabelDispersion.oracleSql ++ ops.SourceEntropy.oracleSql ++ ops.LabelProp.oracleSql ++ ops.ZipfFit.oracleSql ++ ops.HeapsCurve.oracleSql ++ ops.CellValidity.oracleSql ++ ops.VocabOverlap.oracleSql ++ ops.CondEntropy.oracleSql ++ ops.CopyMass.oracleSql ++ ops.BatchMix.oracleSql ++ ops.QualityQuartiles.oracleSql ++ ops.SkewCensus.oracleSql ++ ops.Retention.oracleSql ++ ops.RfmSegments.oracleSql ++ ops.BasketAffinity.oracleSql ++ ops.NumericCorr.oracleSql ++ ops.AbcPareto.oracleSql ++ ops.YoyGrowth.oracleSql ++ ops.GiniConcentration.oracleSql

  /** Queries intentionally registered WITHOUT oracle SQL (driver records a
    * weaker rows-only check): ops whose semantics aren't expressible in
    * portable ANSI SQL (hash-dependent sketches etc.).
    */
  def rowsOnlyQueries: Set[String] =
    ops.TextAnalysis.rowsOnly ++ ops.Dedup.rowsOnly ++
      ops.SimilaritySearch.rowsOnly ++ ops.EventsOps.rowsOnly ++
      ops.Multimodal.rowsOnly ++ ops.AnalyticsExtras.rowsOnly ++
      ops.CorpusSignals.rowsOnly ++ ops.EmbeddingOps.rowsOnly ++
      ops.CorpusPrep.rowsOnly ++ ops.GraphOps.rowsOnly ++
      ops.CorpusReports.rowsOnly ++ ops.LakehouseOps.rowsOnly ++
      ops.IntervalOps.rowsOnly ++ ops.Sampling.rowsOnly ++
      sources.Layout.rowsOnly ++ sources.DataSkipping.rowsOnly ++
      ops.ScaleOps.rowsOnly ++ ops.SegmentDedup.rowsOnly ++
      streaming.StreamingQueries.rowsOnly ++
      ops.ProfileOps.rowsOnly ++ ops.ClusterOps.rowsOnly ++
      ops.LmTokenizer.rowsOnly ++ ops.PqOps.rowsOnly ++
      ops.Retrieval.rowsOnly ++ ops.NaiveBayes.rowsOnly ++
      ops.Winnowing.rowsOnly ++ ops.UnigramLm.rowsOnly ++
      ops.Dsir.rowsOnly ++ ops.Mining.rowsOnly ++ ops.WordPiece.rowsOnly ++
      ops.SymSpell.rowsOnly ++ ops.LinearProbe.rowsOnly ++ ops.QualityBuckets.rowsOnly ++ ops.CountMin.rowsOnly ++ ops.Chunking.rowsOnly ++ ops.QlRetrieval.rowsOnly ++ ops.ExactSubstr.rowsOnly ++ ops.EpochAllocation.rowsOnly ++ ops.BatchPlan.rowsOnly
}
