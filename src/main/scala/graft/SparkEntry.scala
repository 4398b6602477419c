package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import graft.ml.FraudModel
import graft.multimodal.Multimodal
import graft.streaming.ScoringStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named [[Q]] in
  * one of the query modules; this object flattens them into the
  * driver's `queries` / `oracleSql` maps.
  */
object SparkEntry {

  /** All registered engine queries, grouped by surface. */
  def registry: Seq[Q] =
    FraudAnalytics.all ++ Relational.all ++ TextOps.all ++ Privacy.all ++ DedupGraph.all ++ PageRank.all ++
      Curation.all ++ Similarity.all ++
      MinHashDedup.all ++ LshAnn.all ++ IvfAnn.all ++ PqAnn.all ++ AnnCert.all ++ Kmeans.all ++
      AnnIndexStore.all ++ ScoringStream.all ++
      graft.streaming.ClickAttribution.all ++ graft.streaming.StreamingDedup.all ++
      graft.streaming.StreamingCuration.all ++ graft.streaming.StreamingMixPack.all ++
      graft.streaming.StreamingLineDedup.all ++ graft.streaming.StreamingSpanDedup.all ++
      graft.streaming.StreamingSemDedup.all ++ graft.streaming.StreamingKmeansUpdate.all ++
      graft.streaming.StreamingDrift.all ++ graft.streaming.StreamingEvalBuild.all ++
      graft.streaming.StreamingScd2.all ++
      graft.streaming.StreamingAnnIndex.all ++ graft.streaming.StreamingAnnServe.all ++
      graft.streaming.StreamingCowMerge.all ++ graft.streaming.StreamingMedia.all ++ graft.streaming.StreamingEmit.all ++
      graft.streaming.StreamingMmEmit.all ++
      FraudModel.all ++ graft.ml.MlCert.all ++ graft.ml.QualityModel.all ++
      graft.ml.MediaQualityModel.all ++ Multimodal.all ++
      graft.multimodal.ReleaseBundle.all ++ graft.jobs.Jobs.all ++
      graft.sources.CowMerge.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    FraudAnalytics.dailyMetrics.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
