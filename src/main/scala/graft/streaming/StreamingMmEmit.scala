package graft.streaming

import graft.Q
import graft.multimodal.Multimodal
import graft.sources.{FrameStore, Scratch, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The INTERLEAVED multimodal emission OPERATED CONTINUOUSLY — the
  * streaming twin of `mm_curation_emit_ids`: media-caption pairs
  * arrive as a stream, every micro-batch runs the alignment gate
  * against the static embedding store (stream-static equi-joins),
  * prices the kept pairs (media patch block + caption BPE id count
  * against the fixed release symbol table), and places them on the
  * per-shard interleaved token stream at base-offset + within-batch
  * prefix sum — the [[StreamingMixPack]] offset-carry discipline, one
  * modality level up.
  *
  * Cross-batch state is the per-(batch, shard) combined-token-total
  * artifact in a [[FrameStore]] (≤ 4 rows per batch): replay
  * normalization by PROVENANCE (own batch stamp filters out), the
  * append skipped via the batch watermark + stream identity, a killed
  * stream resumes from checkpoint + promoted artifact alone. Because
  * arrivals land in doc_id (ingest) order, per-batch placements
  * concatenate into the batch query's global per-shard order, so the
  * drained windows are EXACTLY the batch emission for any slicing —
  * the twin shares `mm_curation_emit_ids`'s DuckDB oracle verbatim.
  */
object StreamingMmEmit {

  val OffsetsName = "mm_emit_offsets"

  final case class Env(inDir: String, outDir: String, ckpt: String,
                       store: FrameStore, dir: String,
                       schema: org.apache.spark.sql.types.StructType)
      extends graft.Reapable {
    /** The whole stream world lives under the one scratch dir
      * [[prepare]] created — a MEMOIZED env must reap it on eviction
      * per the [[graft.Reapable]] ownership contract (the store is a
      * field, so recursion alone would skip it). */
    def reapRoots: Seq[String] =
      Seq(java.nio.file.Paths.get(outDir).getParent.toString)
  }

  def prepare(spark: SparkSession, dir: String): Env = {
    val scratch = Scratch.dir("graft-mm-emit-").toString
    val docs = Tables.documents(spark, dir)
    val store = new FrameStore(s"$scratch/store")
    store.promote(OffsetsName,
      store.register(spark, OffsetsName,
        docs.filter(lit(false)).select((col("doc_id") % 4).as("shard"))
          .withColumn("batch_tokens", lit(0L))
          .withColumn("batch_id", lit(-1L))))
    Env(s"$scratch/in", s"$scratch/entries", s"$scratch/ckpt", store, dir, docs.schema)
  }

  /** One micro-batch: gate, price, place at base + in-batch offsets,
    * land the positioned entries batchId-deterministically, extend
    * the per-shard totals. IDEMPOTENT under at-least-once replay —
    * own rows filtered by provenance, append skipped by the
    * identity-checked watermark. */
  def processBatch(batch: DataFrame, batchId: Long, env: Env): Unit = {
    val bs = batch.sparkSession
    val placedRaw = Multimodal.mmPositionOf(bs, env.dir,
      Multimodal.mmEmitDocsOf(batch, Tables.embeddings(bs, env.dir))).persist()
    val base = env.store.loadProduction(bs, OffsetsName)
      .getOrElse(sys.error("no production mm emit offsets"))
      .filter(col("batch_id") =!= batchId)
      .groupBy(col("shard")).agg(sum(col("batch_tokens")).as("base_off"))
    placedRaw
      // per-SHARD state is 4 rows by construction — broadcast-bounded
      .join(broadcast(base), Seq("shard"), "left_outer")
      .select(col("shard"), col("doc_id"),
        (col("start_off") + coalesce(col("base_off"), lit(0L))).as("start_off"),
        col("media_tokens"), col("text"))
      .write.mode("overwrite").parquet(s"${env.outDir}/batch=$batchId")
    env.store.appendBatch(bs, OffsetsName,
      placedRaw.groupBy(col("shard")).agg(sum(col("tot")).as("batch_tokens"))
        .withColumn("batch_id", lit(batchId)),
      batchId = Some(batchId), streamId = Some(env.ckpt))
    placedRaw.unpersist()
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

  /** Full loop: prepare, land the corpus in `slices` ordered
    * arrivals, drain, return the accumulated positioned entries
    * (positions are global via the carried base, so the shared
    * window-cut / bounds aggregates reproduce the batch emission).
    * Driven directly by the slicing-parity spec; the gate twins read
    * the memoized single pass below. */
  def runMmEmitStream(spark: SparkSession, dir: String, slices: Int = 3): DataFrame =
    runMmEmitStreamWorld(spark, dir, slices).entries

  /** The drained positioned entries PLUS the stream world that
    * produced them — the env is Reapable, so a memoized world's
    * on-disk scratch tree (arrivals, landed batches, checkpoint,
    * FrameStore) dies with the memo entry instead of leaking until
    * JVM exit. */
  private[streaming] final case class MmEmitStreamWorld(entries: DataFrame, env: Env)
      extends graft.Reapable {
    def reapRoots: Seq[String] = env.reapRoots
  }

  private def runMmEmitStreamWorld(spark: SparkSession, dir: String,
                                   slices: Int): MmEmitStreamWorld = {
    val env = prepare(spark, dir)
    StreamingCuration.landOrderedSlices(spark, env.inDir, dir, slices)
    runPass(spark, env)
    env.store.compact(spark, OffsetsName)
    env.store.gc(OffsetsName, keep = 1)
    MmEmitStreamWorld(spark.read.parquet(env.outDir).drop("batch"), env)
  }

  private val entriesMemo = graft.SessionCaches.register(
    scala.collection.concurrent.TrieMap.empty[String, MmEmitStreamWorld])

  /** ONE interleaved-emission stream pass per (application, sf dir),
    * memoized — both streaming twins (windows + boundary manifest)
    * read its drained positioned entries instead of each draining
    * their own stream (the unifiedRun consolidation rule; attributed
    * by the `cache_warm_mm_emit_stream` bench entry). */
  def streamedEntries(spark: SparkSession, dir: String): DataFrame =
    entriesMemo.getOrElseUpdate(spark.sparkContext.applicationId + "#" + dir, {
      // gate default 2 slices: slicing robustness is pinned separately
      // in MultimodalSpec (2/5 slices), so the per-round warm pays
      // carry-vs-batch semantics once, not a third alignment pass
      val world = runMmEmitStreamWorld(spark, dir, slices = 2)
      val df = world.entries.persist()
      df.count()
      world.copy(entries = df)
    }).entries

  /** Streaming twin of `mm_curation_emit_ids` — same oracle: the
    * continuously-assembled interleaved training stream must cut
    * byte-identical windows to the batch emission for any ingest-
    * ordered slicing. */
  val streamMmEmitIds: Q = Q("stream_mm_emit_ids",
    Multimodal.mmEmitIds.oracle.get) { (s, dir) =>
    Multimodal.mmEmitWindows(s, dir, streamedEntries(s, dir))
      .orderBy(col("shard"), col("seq_id"))
  }

  /** Streaming twin of `mm_emit_doc_bounds` — same oracle: the
    * record-boundary manifest is a content-determined rollup of the
    * positioned entries, so the continuously-landed entries must
    * yield the byte-identical manifest the batch emission publishes
    * beside its shards. */
  val streamMmEmitBounds: Q = Q("stream_mm_emit_bounds",
    Multimodal.mmEmitBounds.oracle.get) { (s, dir) =>
    Multimodal.mmEmitBoundsOf(streamedEntries(s, dir))
  }

  /** Streaming twin of `mm_emit_id_freq` — same oracle: the id
    * distribution a continuously-publishing multimodal release
    * monitors, weighed from the drained entries against the same
    * gate-independent symbol table. */
  val streamMmEmitIdFreq: Q = Q("stream_mm_emit_id_freq",
    Multimodal.mmEmitIdFreq.oracle.get) { (s, dir) =>
    Multimodal.mmEmitIdFreqOf(s, dir, streamedEntries(s, dir))
  }

  val all: Seq[Q] = Seq(streamMmEmitIds, streamMmEmitBounds, streamMmEmitIdFreq)
}
