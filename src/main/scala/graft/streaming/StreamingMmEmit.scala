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
  /** Offset state of the GATED record stream (PRODUCTION-model
    * caption decisions drive placement) — same shape, independent
    * totals. */
  val GatedOffsetsName = "mm_emit_offsets_gated"

  final case class Env(inDir: String, outDir: String, ckpt: String,
                       store: FrameStore, dir: String,
                       schema: org.apache.spark.sql.types.StructType,
                       quality: Option[FrameStore] = None)
      extends graft.Reapable {
    /** Where the GATED (learned-decision-driven) entries land. */
    def gatedOutDir: String = outDir + "-gated"
    /** The whole stream world lives under the one scratch dir
      * [[prepare]] created — a MEMOIZED env must reap it on eviction
      * per the [[graft.Reapable]] ownership contract (the store is a
      * field, so recursion alone would skip it). */
    def reapRoots: Seq[String] =
      Seq(java.nio.file.Paths.get(outDir).getParent.toString)
  }

  def prepare(spark: SparkSession, dir: String,
              quality: Option[FrameStore] = None): Env = {
    val scratch = Scratch.dir("graft-mm-emit-").toString
    val docs = Tables.documents(spark, dir)
    val store = new FrameStore(s"$scratch/store")
    def emptyOffsets() =
      docs.filter(lit(false)).select((col("doc_id") % 4).as("shard"))
        .withColumn("batch_tokens", lit(0L))
        .withColumn("batch_id", lit(-1L))
    store.promote(OffsetsName, store.register(spark, OffsetsName, emptyOffsets()))
    if (quality.isDefined)
      store.promote(GatedOffsetsName,
        store.register(spark, GatedOffsetsName, emptyOffsets()))
    Env(s"$scratch/in", s"$scratch/entries", s"$scratch/ckpt", store, dir,
      docs.schema, quality)
  }

  /** One micro-batch: gate, price, place at base + in-batch offsets,
    * land the positioned entries batchId-deterministically, extend
    * the per-shard totals. With a quality store configured, a SECOND
    * live record stream places only the records the PRODUCTION
    * model's per-batch re-resolved caption decision keeps (the
    * [[StreamingEmit]] gated-face discipline one modality up — a
    * mid-stream promotion takes effect at the next batch). IDEMPOTENT
    * under at-least-once replay — own rows filtered by provenance,
    * appends skipped by the identity-checked watermark. */
  def processBatch(batch: DataFrame, batchId: Long, env: Env): Unit = {
    val bs = batch.sparkSession
    val aligned = Multimodal.mmEmitDocsOf(batch, Tables.embeddings(bs, env.dir))
      .persist() // both faces read it: alignment scores run once per batch
    // caption lens paid ONCE per batch — the gated face's records are
    // a subset of the aligned ids, so both positionings share it
    val lens = Multimodal.mmCapLensOf(bs, env.dir, aligned).persist()
    placeFace(bs, env, batchId, aligned, lens, OffsetsName, env.outDir)
    env.quality.foreach { qstore =>
      val model = qstore.loadProduction(bs, graft.ml.QualityModel.ModelName)
        .getOrElse(sys.error("no production quality model"))
      val keep = graft.ml.QualityModel.scoreClosedForm(
        aligned.select(col("doc_id"), split(col("text"), " ").as("toks")), model)
        .filter(col("proba") >= 0.5).select(col("doc_id"))
      placeFace(bs, env, batchId, aligned.join(keep, Seq("doc_id")), lens,
        GatedOffsetsName, env.gatedOutDir)
    }
    lens.unpersist()
    aligned.unpersist()
    ()
  }

  /** Position + land one gate face's records for one micro-batch
    * against its own offset state. */
  private def placeFace(bs: SparkSession, env: Env, batchId: Long,
      docs: DataFrame, lens: DataFrame, offsetsName: String, outDir: String): Unit = {
    val placedRaw = Multimodal.mmPositionWithLens(docs, lens).persist()
    val base = env.store.loadProduction(bs, offsetsName)
      .getOrElse(sys.error(s"no production $offsetsName"))
      .filter(col("batch_id") =!= batchId)
      .groupBy(col("shard")).agg(sum(col("batch_tokens")).as("base_off"))
    placedRaw
      // per-SHARD state is 4 rows by construction — broadcast-bounded
      .join(broadcast(base), Seq("shard"), "left_outer")
      .select(col("shard"), col("doc_id"),
        (col("start_off") + coalesce(col("base_off"), lit(0L))).as("start_off"),
        col("media_tokens"), col("text"))
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    env.store.appendBatch(bs, offsetsName,
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
  def runMmEmitStream(spark: SparkSession, dir: String, slices: Int = 3): DataFrame = {
    val world = runMmEmitStreamWorld(spark, dir, slices, quality = None)
    trackAdhoc(spark, world.env)
    world.entries
  }

  /** Ad-hoc (non-memoized) stream envs: the spec-facing slicing entry
    * points ([[runMmEmitStream]], [[runTrimodalStream]]) build a
    * fresh scratch world per call — MultimodalSpec alone runs 2- and
    * 5-slice passes — so without tracking, each call leaks a full
    * corpus copy (arrivals + landed batches + checkpoint + store) on
    * disk for the JVM lifetime. Registering each env here puts the
    * tree under the SessionCaches eviction lifecycle like the
    * memoized worlds. Keyed by checkpoint path (unique per call) so
    * repeated runs accumulate entries rather than silently orphaning
    * the previous tree on overwrite. */
  private val adhocEnvs = graft.SessionCaches.register(
    scala.collection.concurrent.TrieMap.empty[String, Env])

  private def trackAdhoc(spark: SparkSession, env: Env): Unit = {
    adhocEnvs.put(
      spark.sparkContext.applicationId + "#" + env.dir + "#adhoc#" + env.ckpt, env)
    ()
  }

  /** The drained positioned entries (both gate faces) PLUS the stream
    * world that produced them — the env is Reapable, so a memoized
    * world's on-disk scratch tree (arrivals, landed batches,
    * checkpoint, FrameStore) dies with the memo entry instead of
    * leaking until JVM exit. `gated`/`qmodel` are set when the run
    * carried a quality store (the consolidated per-session pass
    * does): the gated record stream and the model version it
    * resolved, pinned together for the certificate. */
  private[streaming] final case class MmEmitStreamWorld(entries: DataFrame, env: Env,
      gated: Option[DataFrame] = None, qmodel: Option[DataFrame] = None)
      extends graft.Reapable {
    def reapRoots: Seq[String] = env.reapRoots
  }

  private def runMmEmitStreamWorld(spark: SparkSession, dir: String, slices: Int,
      quality: Option[FrameStore]): MmEmitStreamWorld = {
    val vBefore = quality.map(_.productionVersion(graft.ml.QualityModel.ModelName))
    val env = prepare(spark, dir, quality)
    StreamingCuration.landOrderedSlices(spark, env.inDir, dir, slices)
    runPass(spark, env)
    env.store.compact(spark, OffsetsName)
    env.store.gc(OffsetsName, keep = 1)
    quality.foreach { _ =>
      env.store.compact(spark, GatedOffsetsName)
      env.store.gc(GatedOffsetsName, keep = 1)
    }
    // the model THIS run resolved, pinned with the artifacts: a
    // promotion landing between the (memoized) run and the cert must
    // not change the batch twin's gate (the unifiedRun rule) — and
    // the memoized world never spans a promotion, asserted here
    val qmodel = quality.map { qs =>
      require(vBefore.flatten == qs.productionVersion(graft.ml.QualityModel.ModelName),
        "quality model promoted during the memoized mm emission pass")
      qs.loadProduction(spark, graft.ml.QualityModel.ModelName)
        .getOrElse(sys.error("no production quality model")).localCheckpoint(true)
    }
    MmEmitStreamWorld(spark.read.parquet(env.outDir).drop("batch"), env,
      gated = quality.map(_ => spark.read.parquet(env.gatedOutDir).drop("batch")),
      qmodel = qmodel)
  }

  private val entriesMemo = graft.SessionCaches.register(
    scala.collection.concurrent.TrieMap.empty[String, MmEmitStreamWorld])

  /** ONE interleaved-emission stream pass per (application, sf dir),
    * memoized — the streaming twins (windows + boundary manifest) and
    * the gated certificate all read its drained artifacts instead of
    * each draining their own stream (the unifiedRun consolidation
    * rule; attributed by the `cache_warm_mm_emit_stream` bench
    * entry). The pass runs with the PRODUCTION quality store, so it
    * places BOTH faces per micro-batch: the alignment-only stream
    * (the batch emit oracle's semantics) and the model-gated stream. */
  private def streamedWorld(spark: SparkSession, dir: String): MmEmitStreamWorld =
    entriesMemo.getOrElseUpdate(spark.sparkContext.applicationId + "#" + dir, {
      // gate default 2 slices: slicing robustness is pinned separately
      // in MultimodalSpec (2/5 slices), so the per-round warm pays
      // carry-vs-batch semantics once, not a third alignment pass
      val world = runMmEmitStreamWorld(spark, dir, slices = 2,
        quality = Some(graft.ml.QualityModel.productionStore(spark, dir)))
      val df = world.entries.persist()
      df.count()
      val g = world.gated.map(_.persist())
      g.foreach(_.count())
      world.copy(entries = df, gated = g)
    })

  def streamedEntries(spark: SparkSession, dir: String): DataFrame =
    streamedWorld(spark, dir).entries

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

  // --------------------------------------------------------- trimodal stream
  val TrimodalOffsetsName = "mm_trimodal_offsets"
  /** Offset state of the GATED trimodal record stream. */
  val TrimodalGatedOffsetsName = "mm_trimodal_offsets_gated"

  /** Stream world for the CONTINUOUS trimodal emission: same
    * scratch-tree shape as the interleaved mm stream, its own
    * per-shard combined-token-total artifact (plus a gated one when a
    * quality store is configured). */
  def prepareTrimodal(spark: SparkSession, dir: String,
                      quality: Option[FrameStore] = None): Env = {
    val scratch = Scratch.dir("graft-trimodal-emit-").toString
    val docs = Tables.documents(spark, dir)
    val store = new FrameStore(s"$scratch/store")
    def emptyOffsets() =
      docs.filter(lit(false)).select((col("doc_id") % 4).as("shard"))
        .withColumn("batch_tokens", lit(0L))
        .withColumn("batch_id", lit(-1L))
    store.promote(TrimodalOffsetsName,
      store.register(spark, TrimodalOffsetsName, emptyOffsets()))
    if (quality.isDefined)
      store.promote(TrimodalGatedOffsetsName,
        store.register(spark, TrimodalGatedOffsetsName, emptyOffsets()))
    Env(s"$scratch/in", s"$scratch/entries", s"$scratch/ckpt", store, dir,
      docs.schema, quality)
  }

  /** One trimodal micro-batch: ALL THREE alignment gates against the
    * static embedding store, per-modality record pricing, placement
    * at base + in-batch (doc_id, modality-rank) prefix sum — the
    * [[processBatch]] offset-carry discipline over the three-family
    * record union. With a quality store configured, a SECOND live
    * record stream places only the records whose TRANSCRIPT the
    * PRODUCTION model's per-batch re-resolved decision keeps (a
    * dropped caption removes ALL of its doc's modality records — the
    * caption is the shared half of every pair). Because arrivals land
    * in doc_id order and every record of a doc rides its doc's batch,
    * per-batch placements concatenate into the batch query's
    * per-shard record order, so the drained windows are EXACTLY the
    * batch trimodal emission for any slicing — the twin shares
    * `mm_trimodal_emit_ids`'s oracle verbatim. */
  def processTrimodalBatch(batch: DataFrame, batchId: Long, env: Env): Unit = {
    val bs = batch.sparkSession
    val gated = Multimodal.trimodalGatedOf(batch, Tables.embeddings(bs, env.dir))
      .persist() // both faces read it: the three gates run once per batch
    val lens = Multimodal.trimodalCapLensOf(bs, env.dir, gated).persist()
    placeTrimodalFace(bs, env, batchId, gated, lens,
      TrimodalOffsetsName, env.outDir)
    env.quality.foreach { qstore =>
      val model = qstore.loadProduction(bs, graft.ml.QualityModel.ModelName)
        .getOrElse(sys.error("no production quality model"))
      val keep = graft.ml.QualityModel.scoreClosedForm(
        gated.select(col("doc_id"), col("text")).distinct()
          .select(col("doc_id"), split(col("text"), " ").as("toks")), model)
        .filter(col("proba") >= 0.5).select(col("doc_id"))
      placeTrimodalFace(bs, env, batchId, gated.join(keep, Seq("doc_id")), lens,
        TrimodalGatedOffsetsName, env.gatedOutDir)
    }
    lens.unpersist()
    gated.unpersist()
    ()
  }

  /** Position + land one trimodal gate face's records for one
    * micro-batch against its own offset state. */
  private def placeTrimodalFace(bs: SparkSession, env: Env, batchId: Long,
      recs: DataFrame, lens: DataFrame, offsetsName: String, outDir: String): Unit = {
    val placedRaw = Multimodal.trimodalPositionWithLens(recs, lens).persist()
    val base = env.store.loadProduction(bs, offsetsName)
      .getOrElse(sys.error(s"no production $offsetsName"))
      .filter(col("batch_id") =!= batchId)
      .groupBy(col("shard")).agg(sum(col("batch_tokens")).as("base_off"))
    placedRaw
      // per-SHARD state is 4 rows by construction — broadcast-bounded
      .join(broadcast(base), Seq("shard"), "left_outer")
      .select(col("shard"), col("doc_id"), col("mrank"), col("modality"),
        col("mt"), col("text"),
        (col("start_off") + coalesce(col("base_off"), lit(0L))).as("start_off"))
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    env.store.appendBatch(bs, offsetsName,
      placedRaw.groupBy(col("shard")).agg(sum(col("tot")).as("batch_tokens"))
        .withColumn("batch_id", lit(batchId)),
      batchId = Some(batchId), streamId = Some(env.ckpt))
    placedRaw.unpersist()
    ()
  }

  def runTrimodalPass(spark: SparkSession, env: Env): Unit = {
    val q = spark.readStream.schema(env.schema)
      .option("maxFilesPerTrigger", 1).parquet(env.inDir)
      .writeStream
      .option("checkpointLocation", env.ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processTrimodalBatch(Tables.normalizeDocuments(batch), batchId, env)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Full trimodal loop: land the corpus in `slices` ordered
    * arrivals, drain, return the accumulated positioned records. */
  def runTrimodalStream(spark: SparkSession, dir: String, slices: Int = 3): DataFrame = {
    val env = prepareTrimodal(spark, dir)
    trackAdhoc(spark, env)
    StreamingCuration.landOrderedSlices(spark, env.inDir, dir, slices)
    runTrimodalPass(spark, env)
    env.store.compact(spark, TrimodalOffsetsName)
    env.store.gc(TrimodalOffsetsName, keep = 1)
    spark.read.parquet(env.outDir).drop("batch")
  }

  private val trimodalEntriesMemo = graft.SessionCaches.register(
    scala.collection.concurrent.TrieMap.empty[String, MmEmitStreamWorld])

  /** ONE trimodal stream pass per (application, sf dir), memoized —
    * attributed by the `cache_warm_trimodal_stream` bench entry. Runs
    * with the PRODUCTION quality store, so it places BOTH faces per
    * micro-batch (the consolidated-pass rule). */
  private def streamedTrimodalWorld(spark: SparkSession, dir: String): MmEmitStreamWorld =
    trimodalEntriesMemo.getOrElseUpdate(spark.sparkContext.applicationId + "#" + dir, {
      val qstore = graft.ml.QualityModel.productionStore(spark, dir)
      val vBefore = qstore.productionVersion(graft.ml.QualityModel.ModelName)
      val env = prepareTrimodal(spark, dir, quality = Some(qstore))
      StreamingCuration.landOrderedSlices(spark, env.inDir, dir, 2)
      runTrimodalPass(spark, env)
      env.store.compact(spark, TrimodalOffsetsName)
      env.store.gc(TrimodalOffsetsName, keep = 1)
      env.store.compact(spark, TrimodalGatedOffsetsName)
      env.store.gc(TrimodalGatedOffsetsName, keep = 1)
      require(vBefore == qstore.productionVersion(graft.ml.QualityModel.ModelName),
        "quality model promoted during the memoized trimodal emission pass")
      val df = spark.read.parquet(env.outDir).drop("batch").persist()
      df.count()
      val g = spark.read.parquet(env.gatedOutDir).drop("batch").persist()
      g.count()
      MmEmitStreamWorld(df, env, gated = Some(g),
        qmodel = Some(qstore.loadProduction(spark, graft.ml.QualityModel.ModelName)
          .getOrElse(sys.error("no production quality model")).localCheckpoint(true)))
    })

  def streamedTrimodalEntries(spark: SparkSession, dir: String): DataFrame =
    streamedTrimodalWorld(spark, dir).entries

  /** Bench warm hook: the stream pass AND the lineage-cut drained
    * window artifact, attributed together. */
  private[graft] def warmTrimodalStream(spark: SparkSession, dir: String): Unit = {
    streamedTrimodalWindows(spark, dir); ()
  }

  /** The drained trimodal windows, memoized + LINEAGE-CUT — consumed
    * by the emission twin, the shuffle twin, and the gated
    * certificate; without the cut each rep re-pays the window cut
    * over the drained entries. */
  private val triWinMemo = graft.SessionCaches.register(
    scala.collection.concurrent.TrieMap.empty[String, DataFrame])

  private def streamedTrimodalWindows(spark: SparkSession, dir: String): DataFrame =
    triWinMemo.getOrElseUpdate(spark.sparkContext.applicationId + "#" + dir, {
      Multimodal.trimodalEmitWindowsOf(spark, dir,
        streamedTrimodalEntries(spark, dir)).localCheckpoint(true)
    })

  /** Streaming twin of `mm_trimodal_emit_ids` — same oracle: the
    * continuously-assembled THREE-MODALITY training stream must cut
    * byte-identical windows to the batch emission for any
    * ingest-ordered slicing (the speech-text mix operated the way the
    * reference's scoring loop runs: records flow, the release
    * artifact accretes). */
  val streamTrimodalEmitIds: Q = Q("stream_trimodal_emit_ids",
    Multimodal.trimodalEmitIds.oracle.get) { (s, dir) =>
    streamedTrimodalWindows(s, dir).orderBy(col("shard"), col("seq_id"))
  }

  /** The trimodal gated certificate's pinned artifacts
    * ([[gatedCertArtifacts]]'s shape one level up):
    * `(streamedGatedWindows, streamedWindows, batchGated, expected,
    * flipSeq)`. */
  private val trimodalGatedCertMemo = graft.SessionCaches.register(
    scala.collection.concurrent.TrieMap
      .empty[String, (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame)])

  private def trimodalGatedCertArtifacts(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) =
    trimodalGatedCertMemo.getOrElseUpdate(s.sparkContext.applicationId + "#" + dir, {
      val world = streamedTrimodalWorld(s, dir)
      def pin(df: DataFrame): DataFrame = df.localCheckpoint(true)
      val sg = pin(Multimodal.trimodalEmitWindowsOf(s, dir,
        world.gated.getOrElse(sys.error("trimodal pass ran without a quality store"))))
      val sa = streamedTrimodalWindows(s, dir) // already lineage-cut
      val qmodel = world.qmodel.get
      val gated = Multimodal.trimodalGated(s, dir)
      val docsWithRecords = gated.select(col("doc_id"), col("text")).distinct()
      val keepIds = graft.ml.QualityModel.scoreClosedForm(
        docsWithRecords.select(col("doc_id"), split(col("text"), " ").as("toks")), qmodel)
        .filter(col("proba") >= 0.5).select(col("doc_id"))
      val batchGated = pin(Multimodal.trimodalEmitWindowsOf(s, dir,
        Multimodal.trimodalPositionOf(s, dir, gated.join(keepIds, Seq("doc_id")))))
      // expected per-DOC decision under the pinned model (a doc's
      // records all keep or all drop — the caption is shared)
      val expected = pin(docsWithRecords.select(col("doc_id"))
        .join(keepIds.withColumn("k", lit(true)), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(col("k"), lit(false)).as("expected_keep")))
      // per-shard FIRST flip window: the dropped doc's FIRST record
      // offset in the STREAM that retains it — derived from the
      // streamed ungated entries (not the batch-positioned frame) so
      // the first-divergence leg is self-contained on the stream
      // side: a stream/batch parity regression fails
      // stream_equals_batch directly instead of misattributing a
      // secondary diverges_at_first_flip signal
      val flipSeq = pin(world.entries
        .join(expected.filter(!col("expected_keep")).select(col("doc_id")), Seq("doc_id"))
        .groupBy(col("shard")).agg(min(floor(col("start_off") / 2048)).as("flip_seq")))
      (sg, sa, batchGated, expected, flipSeq)
    })

  /** THE LEARNED GATE DRIVING THE THREE-MODALITY RELEASE — the
    * [[streamMmEmitGated]] certificate one level up: the PRODUCTION
    * model's per-batch re-resolved TRANSCRIPT decisions drive a
    * second live trimodal record stream (a dropped caption removes
    * all of its doc's modality records), and the certificate pins
    * gated stream ≡ batch recut under the pinned model version,
    * flips-only-quality on the per-doc record set, and per-shard
    * first-divergence at the first dropped doc's record window. The
    * oracle recomputes the gate-invariant aligned record and window
    * counts through the full three-gate + BPE emission replay. The
    * mid-stream-promotion mechanics are the [[processBatch]] gated
    * face's, pinned at spec scale in QualityGateSpec. */
  val streamTrimodalGated: Q = Q("stream_trimodal_gated",
    Multimodal.trimodalEmitOracleCtes("1 = 1") + """
      |SELECT
      |  CAST((SELECT COUNT(*) FROM o) AS BIGINT) AS n_records,
      |  (SELECT CAST(SUM((t + 2047) // 2048) AS BIGINT)
      |     FROM (SELECT shard, SUM(tot) AS t FROM o GROUP BY 1))
      |    AS n_windows,
      |  TRUE AS stream_equals_batch,
      |  TRUE AS flips_only_quality,
      |  TRUE AS diverges_at_first_flip""".stripMargin) { (s, dir) =>
    val world = streamedTrimodalWorld(s, dir)
    val (sg, sa, batchGated, expected, flipSeq) = trimodalGatedCertArtifacts(s, dir)
    val sameWindow = col("a.n_tokens") <=> col("b.n_tokens") &&
      col("a.n_patch") <=> col("b.n_patch") && col("a.window_fp") <=> col("b.window_fp")
    val parityDiff = sg.as("a")
      .join(batchGated.as("b"), Seq("shard", "seq_id"), "full_outer")
      .filter(!sameWindow).agg(count(lit(1)).as("n_parity_diff"))
    val streamedIds = world.gated.get.select(col("doc_id")).distinct()
      .withColumn("in_stream", lit(true))
    val flipBad = expected.join(streamedIds, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("expected_keep"), lit(false))
        =!= coalesce(col("in_stream"), lit(false)))
      .agg(count(lit(1)).as("n_flip_bad"))
    val divSeq = sa.as("a").join(sg.as("b"), Seq("shard", "seq_id"), "full_outer")
      .filter(!sameWindow)
      .groupBy(col("shard")).agg(min(col("seq_id")).as("div_seq"))
    val srcMismatch = divSeq.join(flipSeq, Seq("shard"), "full_outer")
      .filter(!(col("div_seq") <=> col("flip_seq")))
      .agg(count(lit(1)).as("n_src_mismatch"))
    world.entries.agg(count(lit(1)).as("n_records"))
      .crossJoin(broadcast(sa.agg(count(lit(1)).as("n_windows"))))
      .crossJoin(broadcast(parityDiff))
      .crossJoin(broadcast(flipBad))
      .crossJoin(broadcast(srcMismatch))
      .select(col("n_records"), col("n_windows"),
        (col("n_parity_diff") === 0).as("stream_equals_batch"),
        (col("n_flip_bad") === 0).as("flips_only_quality"),
        (col("n_src_mismatch") === 0).as("diverges_at_first_flip"))
  }

  /** Streaming twin of `mm_trimodal_doc_bounds` — same oracle: the
    * record-boundary/modality-mask manifest is a content-determined
    * rollup of the positioned records, so the continuously-landed
    * entries must publish the byte-identical manifest beside the
    * drained shards. */
  val streamTrimodalBounds: Q = Q("stream_trimodal_doc_bounds",
    Multimodal.trimodalBounds.oracle.get) { (s, dir) =>
    Multimodal.trimodalBoundsOf(streamedTrimodalEntries(s, dir))
  }

  /** Streaming twin of `mm_trimodal_id_freq` — same oracle: the
    * unigram distribution a continuously-publishing trimodal release
    * monitors, weighed from the drained entries against the same
    * gate-independent symbol table. */
  val streamTrimodalIdFreq: Q = Q("stream_trimodal_id_freq",
    Multimodal.trimodalIdFreq.oracle.get) { (s, dir) =>
    Multimodal.trimodalIdFreqOf(s, dir, streamedTrimodalEntries(s, dir))
  }

  /** Streaming twin of `mm_trimodal_shuffle` — same oracle: the
    * training order assigned at DRAIN over the continuously-landed
    * trimodal record stream (order is a whole-release fact, so a
    * continuous job assigns it when the shard closes) must equal the
    * batch composition's. */
  val streamTrimodalShuffle: Q = Q("stream_trimodal_shuffle",
    Multimodal.trimodalShuffle.oracle.get) { (s, dir) =>
    graft.queries.TextOps.shuffleRankTrimodal(streamedTrimodalWindows(s, dir))
  }

  /** Streaming twin of `mm_trimodal_card` — same oracle: the
    * per-modality release card is a content-determined rollup of the
    * gated record stream, so the continuously-landed records must
    * publish the byte-identical card. */
  val streamTrimodalCard: Q = Q("stream_trimodal_card",
    Multimodal.trimodalCard.oracle.get) { (s, dir) =>
    Multimodal.trimodalCardOf(s, dir, streamedTrimodalEntries(s, dir))
  }

  /** The gated certificate's pinned artifacts — streamed-side window
    * cuts and batch-side recut/flip frames are content-determined
    * release artifacts, memoized + lineage-cut once per session (the
    * text gate's gatedCertArtifacts rule): per bench rep the
    * certificate pays only the comparison joins. */
  private val gatedCertMemo = graft.SessionCaches.register(
    scala.collection.concurrent.TrieMap
      .empty[String, (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame)])

  /** `(streamedGatedWindows, streamedAlignedWindows, batchGated,
    * expected, flipSeq)`. */
  private def gatedCertArtifacts(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) =
    gatedCertMemo.getOrElseUpdate(s.sparkContext.applicationId + "#" + dir, {
      val world = streamedWorld(s, dir)
      def pin(df: DataFrame): DataFrame = df.localCheckpoint(true)
      val sg = pin(Multimodal.mmEmitWindows(s, dir,
        world.gated.getOrElse(sys.error("mm emission pass ran without a quality store"))))
      val sa = pin(Multimodal.mmEmitWindows(s, dir, world.entries))
      // batch twin gates with the MODEL THE STREAM USED (pinned in
      // the world) — the stream_curation_learned rule
      val qmodel = world.qmodel.get
      val aligned = Multimodal.mmEmitDocs(s, dir)
      val keepIds = graft.ml.QualityModel.scoreClosedForm(
        aligned.select(col("doc_id"), split(col("text"), " ").as("toks")), qmodel)
        .filter(col("proba") >= 0.5).select(col("doc_id"))
      val batchGated = pin(Multimodal.mmEmitWindows(s, dir,
        Multimodal.mmPositionOf(s, dir, aligned.join(keepIds, Seq("doc_id")))))
      // expected per-record decision under the pinned model
      val expected = pin(aligned.select(col("doc_id"))
        .join(keepIds.withColumn("k", lit(true)), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(col("k"), lit(false)).as("expected_keep")))
      // per-shard FIRST flip window: each dropped record's window
      // index in the stream that RETAINS it (the aligned STREAMED
      // entries, not the batch-positioned frame — prefixes before the
      // first drop are identical in both streams, and sourcing the
      // flip offsets stream-side keeps the first-divergence leg
      // self-contained: a stream/batch parity regression fails
      // stream_equals_batch, not this leg)
      val flipSeq = pin(world.entries
        .join(expected.filter(!col("expected_keep")).select(col("doc_id")), Seq("doc_id"))
        .groupBy(col("shard")).agg(min(floor(col("start_off") / 2048)).as("flip_seq")))
      (sg, sa, batchGated, expected, flipSeq)
    })

  /** THE LEARNED GATE DRIVING THE MULTIMODAL EMISSION — the text
    * gate's active-deployment certificate one modality up
    * (`stream_curation_gated`'s device): the PRODUCTION quality
    * model's per-batch re-resolved CAPTION decisions drive a second
    * live interleaved record stream beside the alignment-only face,
    * and the certificate pins:
    *
    *  - `stream_equals_batch`: the continuously-placed gated windows
    *    ≡ a batch recut from (aligned ∧ model-keep) under the SAME
    *    model version the stream resolved — cut against the
    *    gate-independent full-vocabulary symbol table
    *    ([[Multimodal.mmCaptionSymsStats]]), so no promotion can
    *    shift the id space;
    *  - `flips_only_quality`: the gated stream's record set differs
    *    from the aligned set exactly on model-dropped captions —
    *    never adds a record, never drops a model-kept one;
    *  - `diverges_at_first_flip`: per shard, the first window where
    *    the gated emission differs from the aligned emission is the
    *    window holding that shard's first dropped record (windows
    *    before it are byte-identical), and shards diverge iff they
    *    have drops.
    *
    * The oracle recomputes the gate-invariant facts exactly (aligned
    * record count and window count through the full emission replay
    * — alignment gate, BPE train, segmentation, offsets) and pins
    * the Spark-only parity facts as booleans. Probed non-vacuous at
    * every SF: 213 / 240 / 2346 model-dropped aligned captions
    * across all 4 shards. */
  val streamMmEmitGated: Q = Q("stream_mm_emit_gated",
    Multimodal.mmEmitOracleCtes("1 = 1") + """
      |SELECT
      |  CAST((SELECT COUNT(*) FROM o) AS BIGINT) AS n_aligned_records,
      |  (SELECT CAST(SUM((t + 2047) // 2048) AS BIGINT)
      |     FROM (SELECT shard, SUM(tot) AS t FROM o GROUP BY 1))
      |    AS n_windows_aligned,
      |  TRUE AS stream_equals_batch,
      |  TRUE AS flips_only_quality,
      |  TRUE AS diverges_at_first_flip""".stripMargin) { (s, dir) =>
    val world = streamedWorld(s, dir)
    val (sg, sa, batchGated, expected, flipSeq) = gatedCertArtifacts(s, dir)
    val sameWindow = col("a.n_tokens") <=> col("b.n_tokens") &&
      col("a.n_patch") <=> col("b.n_patch") && col("a.window_fp") <=> col("b.window_fp")
    val parityDiff = sg.as("a")
      .join(batchGated.as("b"), Seq("shard", "seq_id"), "full_outer")
      .filter(!sameWindow).agg(count(lit(1)).as("n_parity_diff"))
    // record-set parity: gated stream ≡ aligned ∧ model-keep (fresh
    // each run — the operating side)
    val streamedIds = world.gated.get.select(col("doc_id")).distinct()
      .withColumn("in_stream", lit(true))
    val flipBad = expected.join(streamedIds, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("expected_keep"), lit(false))
        =!= coalesce(col("in_stream"), lit(false)))
      .agg(count(lit(1)).as("n_flip_bad"))
    val divSeq = sa.as("a").join(sg.as("b"), Seq("shard", "seq_id"), "full_outer")
      .filter(!sameWindow)
      .groupBy(col("shard")).agg(min(col("seq_id")).as("div_seq"))
    val srcMismatch = divSeq.join(flipSeq, Seq("shard"), "full_outer")
      .filter(!(col("div_seq") <=> col("flip_seq")))
      .agg(count(lit(1)).as("n_src_mismatch"))
    expected.agg(count(lit(1)).as("n_aligned_records"))
      .crossJoin(broadcast(sa.agg(count(lit(1)).as("n_windows_aligned"))))
      .crossJoin(broadcast(parityDiff))
      .crossJoin(broadcast(flipBad))
      .crossJoin(broadcast(srcMismatch))
      .select(col("n_aligned_records"), col("n_windows_aligned"),
        (col("n_parity_diff") === 0).as("stream_equals_batch"),
        (col("n_flip_bad") === 0).as("flips_only_quality"),
        (col("n_src_mismatch") === 0).as("diverges_at_first_flip"))
  }

  val all: Seq[Q] = Seq(streamMmEmitIds, streamMmEmitBounds, streamMmEmitIdFreq,
    streamMmEmitGated, streamTrimodalEmitIds, streamTrimodalBounds,
    streamTrimodalIdFreq, streamTrimodalGated,
    streamTrimodalShuffle, streamTrimodalCard)
}
