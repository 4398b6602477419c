package graft.streaming

import graft.Q
import graft.queries.Curation
import graft.sources.{Scratch, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The corpus drift monitor OPERATED CONTINUOUSLY — the streaming
  * twin of `text_corpus_drift`: documents arrive as a stream, every
  * micro-batch buckets its rows against the STATIC structural-slice
  * anchors and lands its partial `(slice, feature, bucket, c)` count
  * frame; the drained partials SUM to the batch scan's exact counts
  * (counts are additive, so the monitor composes over any slicing),
  * and the PSI report off the summed frame is byte-identical to the
  * batch query — the twin shares its DuckDB oracle verbatim.
  *
  * No cross-batch store is needed: each partial is keyed by its
  * batch id directory, so a replayed batch OVERWRITES its own
  * partial instead of double-counting (idempotent by construction —
  * the exactly-once story the count-state twins need a FrameStore
  * for comes free when the accumulator is a sum over per-batch
  * sub-aggregates).
  *
  * Scale shape: the per-batch work is one map-side-combinable
  * groupBy on a bounded key alphabet (4 slices × {10 length bands +
  * |langs|}); the drain-time sum and the PSI arithmetic run over ≤ a
  * few dozen rows per batch file.
  */
object StreamingDrift {

  final case class Env(inDir: String, outDir: String, ckpt: String,
                       mn: Long, mx: Long,
                       schema: org.apache.spark.sql.types.StructType)

  def prepare(spark: SparkSession, dir: String): Env = {
    val scratch = Scratch.dir("graft-drift-").toString
    val (mn, mx) = Curation.driftAnchors(spark, dir)
    Env(s"$scratch/in", s"$scratch/counts", s"$scratch/ckpt", mn, mx,
      Tables.documents(spark, dir).schema)
  }

  def processBatch(batch: DataFrame, batchId: Long, env: Env): Unit = {
    Curation.driftBuckets(batch, env.mn, env.mx)
      .groupBy(col("slice"), col("feature"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(s"${env.outDir}/batch=$batchId")
    ()
  }

  def runPass(spark: SparkSession, env: Env): Unit = {
    val q = spark.readStream.schema(env.schema)
      .option("maxFilesPerTrigger", 1).parquet(env.inDir)
      .writeStream
      .option("checkpointLocation", env.ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) processBatch(Tables.normalizeDocuments(batch), batchId, env)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drained partial counts summed back to the batch scan's frame. */
  def drainedCounts(spark: SparkSession, env: Env): DataFrame =
    spark.read.parquet(env.outDir).drop("batch")
      .groupBy(col("slice"), col("feature"), col("bucket"))
      .agg(sum(col("c")).as("c"))

  def runDriftStream(spark: SparkSession, dir: String, slices: Int = 3): DataFrame = {
    val env = prepare(spark, dir)
    StreamingCuration.landOrderedSlices(spark, env.inDir, dir, slices)
    runPass(spark, env)
    Curation.psiReport(spark, drainedCounts(spark, env))
  }

  /** Streaming twin of `text_corpus_drift` — same oracle. */
  val streamCorpusDrift: Q = Q("stream_corpus_drift",
    Curation.corpusDrift.oracle.get) { (s, dir) =>
    runDriftStream(s, dir)
  }

  val all: Seq[Q] = Seq(streamCorpusDrift)
}
