package graft.streaming

import graft.Q
import graft.queries.TextOps
import graft.sources.FrameStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The curation pipeline EMITTING CONTINUOUSLY — training windows
  * leave the pipeline the moment they fill, instead of waiting for a
  * drain-time pack: every micro-batch runs the full composed stack
  * ([[StreamingCuration.processBatch]] — its decision record now
  * carries the retained docs' final redacted text), then cuts
  * 512-token windows from the per-source token stream against a
  * CARRY state: `(source, done_off, carry_text)` — tokens already
  * shipped in completed windows, plus the ≤ 511-token tail still
  * waiting for its window to fill. Completed windows write
  * immediately with their content hash; the tail carries forward;
  * the drain flushes each source's final partial window.
  *
  * Because window boundaries are token-position facts of the
  * retained stream (and arrivals land in ingest order), the emitted
  * windows are IDENTICAL to the batch `text_curation_emit` for any
  * slicing — the twin shares that oracle verbatim. Carry state rides
  * the same provenance-stamped [[FrameStore]] lifecycle as every
  * other cross-batch artifact (a replayed batch filters its own
  * stamp and recuts the identical windows). */
object StreamingEmit {

  val CarryName = "emit_carry"

  final case class Env(cur: StreamingCuration.Env, windowsDir: String, dir: String)

  def prepare(spark: SparkSession, dir: String,
              quality: Option[graft.sources.FrameStore] = None,
              shadow: Boolean = false): Env = {
    val cur = StreamingCuration.prepare(spark, dir, quality, shadow)
    import spark.implicits._
    cur.store.promote(CarryName,
      cur.store.register(spark, CarryName,
        Seq.empty[(String, Long, String)].toDF("source", "done_off", "carry_text")
          .withColumn("batch_id", lit(-1L))))
    Env(cur, cur.outDir + "-windows", dir)
  }

  /** One micro-batch: full stack → retained texts → window cut
    * against the carry. Idempotent like every twin: the decision
    * write is overwrite-deterministic, the carry read filters this
    * batch's own stamp, and both appends ride the batch watermark. */
  def processBatch(batch: DataFrame, batchId: Long, env: Env): Unit = {
    val bs = batch.sparkSession
    StreamingCuration.processBatch(batch, batchId, env.cur)
    val retained = bs.read.parquet(s"${env.cur.outDir}/batch=$batchId")
      .filter(col("drop_reason").isNull)
      .select(col("source"), col("doc_id"), col("red"), col("final_tokens"))
    // LATEST state per source (appends accumulate one row per source
    // per touching batch); this batch's own stamp filters out first
    // so a replay recovers the exact pre-batch carry
    val carry = latestCarry(env.cur.store.loadProduction(bs, CarryName)
      .getOrElse(sys.error("no production emit carry"))
      .filter(col("batch_id") =!= batchId))
    // per-source positioned stream: the carry tail sits at done_off,
    // batch docs follow at done_off + |carry| + in-batch prefix sum
    // (sub-sharded like the batch family — a micro-batch dominated by
    // one source must not serialize its window either)
    val inBatch = TextOps.sourcePrefixSum(retained, col("final_tokens"))
      .withColumnRenamed("start_off", "batch_off")
      .join(carry, Seq("source"), "left_outer")
      .select(col("source"),
        (coalesce(col("done_off"), lit(0L))
          + when(col("carry_text").isNull || col("carry_text") === "", 0)
            .otherwise(size(split(col("carry_text"), " ")))
          + col("batch_off")).as("start_off"),
        col("red"))
    val carryRows = carry.filter(col("carry_text") =!= "")
      .select(col("source"), col("done_off").as("start_off"),
        col("carry_text").as("red"))
    val positioned = carryRows.unionByName(inBatch).persist()
    val totals = positioned
      .groupBy(col("source"))
      .agg(max(col("start_off") + size(split(col("red"), " "))).as("total_off"))
    // both window faces cut together — text fingerprint and the
    // tokenized-ID sequence hash (the symbol table is the fixed
    // tokenizer artifact, memoized per session — one broadcast join)
    val windows = TextOps.emitWindowsIds(bs, env.dir, positioned).persist()
    // a window is COMPLETE when the stream has moved past its end
    val complete = windows.join(totals, Seq("source"))
      .filter((col("seq_id") + 1) * 512 <= col("total_off"))
      .select(col("source"), col("seq_id"), col("n_tokens"), col("n_ids"),
        col("window_fp"), col("ids_fp"))
    complete.write.mode("overwrite").parquet(s"${env.windowsDir}/batch=$batchId")
    // new carry: every token past the last complete boundary. The
    // explode is restricted to BOUNDARY-STRADDLING docs first (doc
    // extent end past new_done) — only they can contribute carry
    // tokens, so the recompute pays per-tail, not per-batch
    val newCarry = positioned
      .join(totals.select(col("source"),
        (floor(col("total_off") / 512) * 512).as("new_done")), Seq("source"))
      .filter(col("start_off") + size(split(col("red"), " ")) > col("new_done"))
      .select(col("source"), col("new_done"), col("start_off"),
        posexplode(split(col("red"), " ")).as(Seq("i", "word")))
      .select(col("source"), col("new_done"),
        (col("start_off") + col("i")).as("pos"), col("word"))
      .filter(col("pos") >= col("new_done"))
      .groupBy(col("source"), col("new_done"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("word")))),
          x => x.getField("word")), " ").as("carry_text"))
      .select(col("source"), col("new_done").as("done_off"), col("carry_text"))
    // sources whose stream ended exactly on a boundary carry nothing —
    // still record done_off so the next batch resumes at the boundary
    val boundary = totals
      .join(newCarry.select(col("source")), Seq("source"), "left_anti")
      .select(col("source"),
        (floor(col("total_off") / 512) * 512).as("done_off"),
        lit("").as("carry_text"))
    env.cur.store.appendBatch(bs, CarryName,
      newCarry.unionByName(boundary).withColumn("batch_id", lit(batchId)),
      batchId = Some(batchId), streamId = Some(env.cur.ckpt))
    windows.unpersist()
    positioned.unpersist()
    ()
  }

  /** Newest carry row per source — the appends accumulate history
    * (one row per source per touching batch, batch-stamped). */
  private def latestCarry(rows: DataFrame): DataFrame =
    rows.withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("batch_id").desc)))
      .filter(col("rk") === 1)
      .select(col("source"), col("done_off"), col("carry_text"))

  def runPass(spark: SparkSession, env: Env): Unit = {
    val q = spark.readStream.schema(env.cur.schema)
      .option("maxFilesPerTrigger", 1).parquet(env.cur.inDir)
      .writeStream
      .option("checkpointLocation", env.cur.ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) processBatch(batch, batchId, env)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain: flush every source's final partial window from the carry
    * and read the accumulated windows back — BOTH window faces
    * (text fingerprint + tokenized-ID hash). */
  def allWindows(spark: SparkSession, env: Env): DataFrame = {
    val latest = latestCarry(env.cur.store.loadProduction(spark, CarryName)
      .getOrElse(sys.error("no production emit carry")))
      .filter(col("carry_text") =!= "")
      .select(col("source"), col("done_off").as("start_off"),
        col("carry_text").as("red"))
    val flushed = TextOps.emitWindowsIds(spark, env.dir, latest)
    spark.read.parquet(env.windowsDir).drop("batch")
      .unionByName(flushed)
  }

  /** [[allWindows]] in the batch `text_curation_emit` oracle shape. */
  def emittedWindows(spark: SparkSession, env: Env): DataFrame =
    allWindows(spark, env)
      .select(col("source"), col("seq_id"), col("n_tokens"), col("window_fp"))
      .orderBy(col("source"), col("seq_id"))

  // ------------------------------------------------------------ unified pass
  /** The artifacts of ONE consolidated curation stream run: emitted
    * windows (heuristic gate — the batch emit oracle's semantics),
    * the landed heuristic decision records (what the pack certificate
    * packs), the SHADOW learned decision records (per-batch
    * PRODUCTION re-resolve), and whether the promoted quality model
    * stayed at one version across the run. */
  final case class Unified(env: Env, windows: DataFrame, decisions: DataFrame,
                           learned: DataFrame, qmodel: DataFrame,
                           sameModelVersion: Boolean)

  private val unifiedMemo = graft.SessionCaches.register(
    scala.collection.concurrent.TrieMap.empty[String, Unified])

  /** ONE full-stack curation stream pass per (application, sf dir),
    * memoized — the three operating-mode certificates
    * (`stream_curation_pack` / `stream_curation_emit` /
    * `stream_curation_learned`) all read ITS artifacts instead of
    * each draining their own stream, so the bench executes the
    * nine-stage stack once, not three times (~61 s → one run at
    * sf0.1). The run is the emit stream configured with the learned
    * gate in SHADOW mode: heuristic decisions drive emission and
    * packing (their oracles replay the heuristic stack), while the
    * shadow record certifies the learned gate with the identical
    * per-batch re-resolve discipline (shadow ≡ gated decisions is
    * pinned in QualityGateSpec; slicing robustness, restart, and
    * hot-reload stay pinned on the standalone runners in
    * StreamingSpec/QualityGateSpec at spec scale).
    *
    * Drain-time maintenance matches the old standalone pack runner:
    * both index artifacts compact + gc, both count states snapshot —
    * the consolidated pass certifies store lifecycle too. */
  def unifiedRun(s: SparkSession, dir: String): Unified =
    unifiedMemo.getOrElseUpdate(s.sparkContext.applicationId + "#" + dir, {
      val qstore = graft.ml.QualityModel.productionStore(s, dir)
      val vBefore = qstore.productionVersion(graft.ml.QualityModel.ModelName)
      val env = prepare(s, dir, quality = Some(qstore), shadow = true)
      StreamingCuration.addArrivalsOrdered(s, env.cur, dir, slices = 2)
      runPass(s, env)
      env.cur.store.compact(s, StreamingCuration.ShingleIdx)
      env.cur.store.compact(s, StreamingCuration.FpIdx)
      env.cur.store.gc(StreamingCuration.ShingleIdx, keep = 1)
      env.cur.store.gc(StreamingCuration.FpIdx, keep = 1)
      StreamingCuration.snapshotCounts(s, env.cur.store,
        StreamingCuration.LineCounts, env.cur.ckpt)
      StreamingCuration.snapshotCounts(s, env.cur.store,
        StreamingCuration.SpanCounts, env.cur.ckpt)
      env.cur.store.gc(StreamingCuration.LineCounts, keep = 1)
      env.cur.store.gc(StreamingCuration.SpanCounts, keep = 1)
      val vAfter = qstore.productionVersion(graft.ml.QualityModel.ModelName)
      def pin(df: DataFrame): DataFrame = { val p = df.persist(); p.count(); p }
      Unified(env,
        windows = pin(allWindows(s, env)),
        decisions = pin(StreamingCuration.streamedDecisions(s, env.cur)),
        learned = pin(s.read.parquet(env.cur.learnedOutDir).drop("batch")),
        // the model THIS run resolved, pinned with the artifacts: the
        // learned certificate's batch twin must score with the same
        // model the stream used, even if a promotion lands between
        // the (possibly much earlier, memoized) run and the cert
        qmodel = pin(qstore.loadProduction(s, graft.ml.QualityModel.ModelName)
          .getOrElse(sys.error("no production quality model"))),
        sameModelVersion = vBefore.isDefined && vBefore == vAfter)
    })

  /** Streaming twin of `text_curation_emit` — same oracle: the
    * continuously-emitted window set must be byte-identical to the
    * batch emission for any ingest-ordered slicing. Reads the
    * [[unifiedRun]] artifacts (one stream pass per session). */
  val streamCurationEmit: Q = Q("stream_curation_emit",
    TextOps.curationEmit.oracle.get) { (s, dir) =>
    unifiedRun(s, dir).windows
      .select(col("source"), col("seq_id"), col("n_tokens"), col("window_fp"))
      .orderBy(col("source"), col("seq_id"))
  }

  /** Streaming twin of `text_curation_emit_ids` — same oracle: every
    * continuously-shipped window's BPE token-ID hash must equal the
    * batch emission's (windows carry both faces the moment they
    * complete — the dataloader consumes ids, the audit trail keeps
    * the text fingerprint). */
  val streamCurationEmitIds: Q = Q("stream_curation_emit_ids",
    TextOps.curationEmitIds.oracle.get) { (s, dir) =>
    unifiedRun(s, dir).windows
      .select(col("source"), col("seq_id"), col("n_tokens"), col("n_ids"), col("ids_fp"))
      .orderBy(col("source"), col("seq_id"))
  }

  /** Streaming twin of `text_curation_shuffle` — same oracle: the
    * training order assigned at DRAIN over the continuously-landed
    * window artifact (order is a whole-corpus fact, so a streaming
    * job assigns it when the shard closes — the natural place in a
    * continuous pipeline) must equal the batch composition's. */
  val streamCurationShuffle: Q = Q("stream_curation_shuffle",
    TextOps.curationShuffle.oracle.get) { (s, dir) =>
    TextOps.shuffleRankWindows(unifiedRun(s, dir).windows
      .select(col("source"), col("seq_id"), col("n_tokens"), col("window_fp")))
  }

  val all: Seq[Q] = Seq(streamCurationEmit, streamCurationEmitIds, streamCurationShuffle)
}
