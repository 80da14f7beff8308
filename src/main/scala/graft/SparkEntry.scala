package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Registry.Entry

/** Driver contract — see SURVEY.md §7 + BASELINE.md.
  *
  * Every operator from SURVEY.md §2B registers one [[Registry.Entry]] in a
  * module under graft.operators / graft.llm / graft.streaming; this object
  * only aggregates them into the driver-facing maps.
  */
object SparkEntry {

  def all: Seq[Entry] =
    operators.Relational.entries ++
      operators.AnalyticsOps.entries ++
      operators.WindowsAndAggs.entries ++
      operators.Scalars.entries ++
      operators.TemporalJoins.entries ++
      operators.Extensions.entries ++
      operators.ScaleOps.entries ++
      operators.MaintenanceOps.entries ++
      operators.PublishGate.entries ++
      operators.PrivacyOps.entries ++
      operators.ChangepointOps.entries ++
      operators.SpatialOps.entries ++
      operators.AvroInterchange.entries ++
      operators.GraphOps.entries ++
      operators.PipelineOps.entries ++
      operators.WildWebQueries.entries ++
      llm.Redact.entries ++
      llm.TextDedup.entries ++
      llm.SpanDedup.entries ++
      llm.LineDedup.entries ++
      llm.Decontaminate.entries ++
      llm.CleanPipeline.entries ++
      llm.CorpusRelease.entries ++
      llm.Perplexity.entries ++
      llm.SequencePack.entries ++
      llm.MixtureResample.entries ++
      llm.SemDedup.entries ++
      llm.DsirResample.entries ++
      llm.TrainPrep.entries ++
      llm.IntKMeans.entries ++
      llm.Chunker.entries ++
      llm.Retrieval.entries ++
      llm.RetrievalEval.entries ++
      llm.Hybrid.entries ++
      llm.Similarity.entries ++
      llm.Ivf.entries ++
      llm.Pq.entries ++
      llm.TextAnalysis.entries ++
      llm.LangId.entries ++
      llm.Multimodal.entries ++
      llm.PerceptualHash.entries ++
      llm.AudioFingerprint.entries ++
      llm.Boilerplate.entries ++
      llm.CompressionQuality.entries ++
      llm.CrossModalAudit.entries ++
      llm.VideoNearDup.entries ++
      llm.BpeTokenize.entries ++
      llm.UnigramTokenize.entries ++
      llm.BpeTrain.entries ++
      llm.UnigramTrain.entries ++
      llm.Quantize.entries ++
      llm.CorpusBudget.entries ++
      llm.QualityClassifier.entries ++
      llm.QualityEnsemble.entries ++
      llm.QualityDrift.entries ++
      llm.NgramLm.entries ++
      llm.ModelReady.entries ++
      llm.TrainLoad.entries ++
      llm.IncrementalDedup.entries ++
      llm.SetSimJoin.entries ++
      llm.ContrastivePairs.entries ++
      llm.FuzzyJoin.entries ++
      llm.EntityResolution.entries ++
      llm.CorpusAnalytics.entries ++
      llm.TextRank.entries ++
      llm.FimTransform.entries ++
      llm.PostingCompress.entries ++
      llm.Snippets.entries ++
      llm.Blocklist.entries ++
      streaming.StreamingBatchTwins.entries ++
      streaming.StreamReplay.entries

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("b17_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(e => e.name -> e.q).toMap

  /** DuckDB-dialect twin for each query (t2 hash-match oracle). Entries
    * without SQL twins (approximate / streaming ops) are omitted → the
    * driver records a weaker rows-only check for them. */
  def oracleSql: Map[String, String] =
    all.flatMap(e => e.oracle.map(sql => e.name -> sql)).toMap

  /** Headline subset timed by Bench at sf0.1. */
  def benchQueries: Seq[Entry] = all.filter(_.bench)
}
