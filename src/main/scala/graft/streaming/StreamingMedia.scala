package graft.streaming

import graft.Q
import graft.multimodal.Multimodal
import graft.sources.{FrameStore, Scratch, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The multimodal operators OPERATED CONTINUOUSLY.
  *
  * [[streamAudioDecode]] is a stateless per-record decode (each
  * clip's fields depend on that clip alone), so it rides
  * [[StreamingCuration.runStatelessTwin]]'s checkpoint+commit-log
  * exactly-once story and shares the batch oracle verbatim.
  *
  * [[streamImageDedup]] is STATEFUL: a near-dup pair `(d1 < d2)` is
  * emitted when its LATER member arrives, checked against every
  * image seen so far — the [[StreamingDedup]] incremental-index
  * discipline applied to the banded dHash index. Because the pair
  * list is an arrival-order-independent FACT (membership depends
  * only on the two hashes; the emit batch is the later member's),
  * the drained output equals the batch `mm_image_dedup` exactly for
  * ANY slicing, so the twin shares the batch oracle verbatim.
  * Cross-batch state is the banded hash index in a [[FrameStore]]
  * with batch provenance (replayed batches filter their own stamp —
  * the [[StreamingCuration]] normalization).
  */
object StreamingMedia {

  val BandIdx = "media_bands"

  final case class Env(inDir: String, outDir: String, ckpt: String,
                       store: FrameStore,
                       schema: org.apache.spark.sql.types.StructType,
                       hashBands: DataFrame => DataFrame)

  /** Stream world for a banded-fingerprint dedup: `hashBands` maps a
    * documents frame to its `(doc_id, dh, band, bv)` band rows — the
    * image dHash and the audio frame-energy signature both fit the
    * contract, so the whole incremental machinery is shared. */
  def prepare(spark: SparkSession, dir: String,
              hashBands: DataFrame => DataFrame): Env = {
    val scratch = Scratch.dir("graft-mediadedup-").toString
    val docs = Tables.documents(spark, dir)
    val store = new FrameStore(s"$scratch/store")
    store.promote(BandIdx,
      store.register(spark, BandIdx,
        hashBands(docs.filter(lit(false))).withColumn("batch_id", lit(-1L))))
    Env(s"$scratch/in", s"$scratch/pairs", s"$scratch/ckpt", store, docs.schema,
      hashBands)
  }

  def processBatch(batch: DataFrame, batchId: Long, env: Env): Unit = {
    val bs = batch.sparkSession
    // one arrival file = one input split; the fingerprint pass is the
    // expensive per-row work, so spread it across the session's
    // shuffle width (the StreamingCuration.processBatch discipline)
    val bands = env.hashBands(
      batch.repartition(bs.sessionState.conf.numShufflePartitions)).persist()
    val seen = env.store.loadProduction(bs, BandIdx)
      .getOrElse(sys.error("no production media band index"))
      .filter(col("batch_id") =!= batchId)
    // earlier-seen side × this batch, BOTH orientations: ingest order
    // does not imply id order here (a planted twin's 1e6-offset id
    // lands before smaller later arrivals), so the pair's (d1, d2)
    // normalizes by least/greatest while the emit batch stays the
    // later ARRIVAL's — each unordered pair emitted exactly once.
    // No broadcast hint: the band index grows with the corpus.
    val vsIndex = seen.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"),
        when(col("a.doc_id") < col("b.doc_id"), col("a.dh")).otherwise(col("b.dh")).as("dh1"),
        when(col("a.doc_id") < col("b.doc_id"), col("b.dh")).otherwise(col("a.dh")).as("dh2"))
    val inBatch = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.dh").as("dh1"), col("b.dh").as("dh2"))
    Multimodal.hammingPairs(vsIndex.unionByName(inBatch).distinct())
      .write.mode("overwrite").parquet(s"${env.outDir}/batch=$batchId")
    env.store.appendBatch(bs, BandIdx,
      bands.withColumn("batch_id", lit(batchId)),
      batchId = Some(batchId), streamId = Some(env.ckpt))
    bands.unpersist()
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

  def runDedupStream(spark: SparkSession, dir: String,
                     hashBands: DataFrame => DataFrame, slices: Int): DataFrame = {
    val env = prepare(spark, dir, hashBands)
    StreamingCuration.landOrderedSlices(spark, env.inDir, dir, slices)
    runPass(spark, env)
    env.store.compact(spark, BandIdx)
    env.store.gc(BandIdx, keep = 1)
    spark.read.parquet(env.outDir).drop("batch")
      .orderBy(col("d1"), col("d2"))
  }

  // gate default 2 slices: slicing robustness is pinned separately in
  // MultimodalSpec (2/5 slices), so the per-round bench entry pays
  // index-vs-batch semantics once, not a third full fingerprint pass
  def runImageDedupStream(spark: SparkSession, dir: String, slices: Int = 2): DataFrame =
    runDedupStream(spark, dir,
      docs => Multimodal.imageBands(Multimodal.imageHashes(docs)), slices)

  def runAudioDedupStream(spark: SparkSession, dir: String, slices: Int = 2): DataFrame =
    runDedupStream(spark, dir,
      docs => Multimodal.audioBands(Multimodal.audioHashes(docs)), slices)

  def runVideoDedupStream(spark: SparkSession, dir: String, slices: Int = 2): DataFrame =
    runDedupStream(spark, dir,
      docs => Multimodal.imageBands(Multimodal.videoHashes(docs)), slices)

  /** Streaming twin of `mm_image_dedup` — same oracle. */
  val streamImageDedup: Q = Q("stream_image_dedup",
    Multimodal.imageDedup.oracle.get) { (s, dir) =>
    runImageDedupStream(s, dir)
  }

  /** Streaming twin of `mm_audio_dedup` — same oracle and the same
    * shared incremental band-index machinery: only the fingerprint
    * function differs, which is the point of the banded contract. */
  val streamAudioDedup: Q = Q("stream_audio_dedup",
    Multimodal.audioDedup.oracle.get) { (s, dir) =>
    runAudioDedupStream(s, dir)
  }

  /** Streaming twin of `mm_video_dedup` — same oracle and the same
    * shared incremental band-index machinery: the third modality's
    * temporal signature rides the banded contract unchanged. */
  val streamVideoDedup: Q = Q("stream_video_dedup",
    Multimodal.videoDedup.oracle.get) { (s, dir) =>
    runVideoDedupStream(s, dir)
  }

  /** Streaming twin of `mm_caption_align` — same oracle: the
    * alignment filter operated continuously. Stateless per doc (each
    * pair's score depends on that doc + the STATIC embedding store),
    * so it rides the checkpoint+commit-log exactly-once story; the
    * per-batch plan is the batch query's stream-static equi-joins. */
  val streamCaptionAlign: Q = Q("stream_caption_align",
    Multimodal.captionAlign.oracle.get) { (s, dir) =>
    StreamingCuration.runStatelessTwin(s, dir,
      docs => Multimodal.alignScores(docs, Tables.embeddings(s, dir)))
      .orderBy(col("doc_id"))
  }

  /** Streaming twin of `mm_audio_decode` — same oracle; stateless
    * per-clip decode (the `stream_pii_redact` shape). */
  val streamAudioDecode: Q = Q("stream_audio_decode",
    Multimodal.audioDecode.oracle.get) { (s, dir) =>
    // a micro-batch is one arrival file = ONE input split; the
    // per-sample decode is the expensive part, so spread the batch
    // across the session's shuffle width first (the
    // StreamingCuration.processBatch discipline — without this the
    // whole decode ran single-threaded: 28 s vs ~1 s at sf0.1)
    StreamingCuration.runStatelessTwin(s, dir,
      docs => Multimodal.decodeWav(Multimodal.wavFrames(
        docs.repartition(docs.sparkSession.sessionState.conf.numShufflePartitions))))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(streamImageDedup, streamAudioDedup, streamVideoDedup,
    streamCaptionAlign, streamAudioDecode)
}
