package graft

import graft.ml.QualityModel
import graft.queries.TextOps
import graft.streaming.StreamingCuration
import org.apache.spark.sql.functions._

/** The learned quality gate: closed-form export fidelity and the
  * per-batch PRODUCTION re-resolve (hot reload) discipline. */
class QualityGateSpec extends SparkSpec {
  import spark.implicits._

  test("closed-form scoring equals the MLlib transform") {
    // the exported (idx, coef) frame + SQL hash featurization must
    // reproduce LogisticRegressionModel.transform's probability —
    // same murmur3 seed-42 term indexing, same sigmoid; the only
    // divergence allowed is the decimal-accumulated margin's
    // last-ulp rounding
    import org.apache.spark.ml.{Pipeline => MlPipeline}
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.HashingTF
    import org.apache.spark.ml.functions.vector_to_array
    val data = QualityModel.labeledDocs(spark, sf)
    val tr = data.filter(col("bucket") < 75)
    val pipe = new MlPipeline().setStages(Array(
      new HashingTF().setInputCol("w").setOutputCol("features")
        .setNumFeatures(QualityModel.NumFeatures),
      new LogisticRegression().setMaxIter(100).setLabelCol("label")))
    val mllib = pipe.fit(tr.coalesce(1)).transform(data)
      .select(col("doc_id"), vector_to_array(col("probability")).getItem(1).as("p"))
      .as[(Long, Double)].collect().toMap
    val closed = QualityModel.scoreClosedForm(
        data.select(col("doc_id"), col("w").as("toks")),
        QualityModel.closedForm(spark, sf))
      .as[(Long, Double)].collect().toMap
    assert(closed.keySet == mllib.keySet)
    val maxErr = closed.map { case (d, p) => math.abs(p - mllib(d)) }.max
    assert(maxErr < 1e-9, s"closed-form drift $maxErr")
  }

  test("media quality closed form equals the MLlib transform; the trimodal gate composes both filters") {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.functions.vector_to_array
    import graft.ml.MediaQualityModel
    val data = MediaQualityModel.labeledMedia(spark, sf)
    val tr = data.filter(col("bucket") < 75)
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(MediaQualityModel.FeatureNames.toArray)
        .setOutputCol("features"),
      new LogisticRegression().setMaxIter(100).setLabelCol("label")))
    val mllib = pipe.fit(tr.coalesce(1)).transform(data)
      .select(col("doc_id"), vector_to_array(col("probability")).getItem(1).as("p"))
      .as[(Long, Double)].collect().toMap
    val closed = MediaQualityModel.scoreClosedForm(
        MediaQualityModel.mediaStats(spark, sf),
        MediaQualityModel.closedForm(spark, sf))
      .as[(Long, Double)].collect().toMap
    assert(closed.keySet == mllib.keySet)
    val maxErr = closed.map { case (d, p) => math.abs(p - mllib(d)) }.max
    assert(maxErr < 1e-9, s"media closed-form drift $maxErr")
    // the two-filter composition is live: the media gate drops docs
    // the transcript gate kept (the cert's media_gate_active leg at
    // spec scale), and the production registry ships BOTH models
    val qstore = QualityModel.productionStore(spark, sf)
    val tModel = qstore.loadProduction(spark, QualityModel.ModelName).get
    val mModel = qstore.loadProduction(spark, MediaQualityModel.ModelName).get
    val docs = graft.sources.Tables.documents(spark, sf)
    val tKeep = QualityModel.scoreClosedForm(
        docs.select(col("doc_id"), split(col("text"), " ").as("toks")), tModel)
      .filter(col("proba") >= 0.5).select(col("doc_id"))
      .as[Long].collect().toSet
    val mKeep = MediaQualityModel.mediaKeepIds(
        spark, sf, docs.select(col("doc_id")), mModel)
      .as[Long].collect().toSet
    val mediaOnlyDrops = tKeep -- mKeep
    assert(mediaOnlyDrops.nonEmpty,
      "media gate drops nothing the transcript gate kept — composition vacuous")
  }

  test("learned gate streams equal the batch learned pipeline across slicings") {
    val qstore = QualityModel.productionStore(spark, sf)
    val model = qstore.loadProduction(spark, QualityModel.ModelName).get
    val batch = TextOps.curationLearnedDecisions(spark, sf, model)
      .select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    for (slices <- Seq(2, 4)) {
      val env = StreamingCuration.prepare(spark, sf, quality = Some(qstore))
      StreamingCuration.addArrivalsOrdered(spark, env, sf, slices)
      StreamingCuration.runPass(spark, env)
      val streamed = StreamingCuration.streamedDecisions(spark, env)
        .select("doc_id", "drop_reason").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(streamed == batch, s"slices=$slices learned decision drift: " +
        streamed.filter { case (k, v) => batch.get(k) != Some(v) }.take(5))
    }
  }

  test("shadow learned record equals the gated stream's decisions; main stays heuristic") {
    // the consolidation contract: because low_quality is the LAST
    // cascade stage and decisions never feed back into the
    // fp/shingle/count state, a shadow run's learned record must be
    // row-identical to a learned-GATED stream, while its MAIN
    // decisions stay identical to the plain heuristic stream — the
    // two facts that let ONE stream pass certify all three modes
    val qstore = QualityModel.productionStore(spark, sf)
    def decMap(df: org.apache.spark.sql.DataFrame): Map[Long, Option[String]] =
      df.select("doc_id", "drop_reason").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // gated run (learned is the main gate)
    val gated = StreamingCuration.prepare(spark, sf, quality = Some(qstore))
    StreamingCuration.addArrivalsOrdered(spark, gated, sf, 2)
    StreamingCuration.runPass(spark, gated)
    val gatedDec = decMap(StreamingCuration.streamedDecisions(spark, gated))
    // shadow run (heuristic main + learned shadow record)
    val shadow = StreamingCuration.prepare(spark, sf, quality = Some(qstore), shadow = true)
    StreamingCuration.addArrivalsOrdered(spark, shadow, sf, 2)
    StreamingCuration.runPass(spark, shadow)
    val shadowLearned = decMap(spark.read.parquet(shadow.learnedOutDir))
    assert(shadowLearned == gatedDec, "shadow learned record must equal gated decisions: " +
      shadowLearned.filter { case (k, v) => gatedDec.get(k) != Some(v) }.take(5))
    // main decisions equal the plain heuristic stream's
    val heur = StreamingCuration.prepare(spark, sf)
    StreamingCuration.addArrivalsOrdered(spark, heur, sf, 2)
    StreamingCuration.runPass(spark, heur)
    assert(decMap(StreamingCuration.streamedDecisions(spark, shadow)) ==
      decMap(StreamingCuration.streamedDecisions(spark, heur)),
      "shadow main decisions must stay heuristic")
  }

  test("shadow emit stream resumes from checkpoint: all artifacts complete across two passes") {
    // the consolidated pass's restart story: kill after the first
    // half, resume on the same checkpoint + promoted state — the
    // learned shadow record, the heuristic decisions, AND the emitted
    // windows must all complete exactly
    import graft.streaming.{StreamingCuration, StreamingEmit}
    val qstore = QualityModel.productionStore(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    val mid = docs.agg(avg(col("doc_id"))).head().getDouble(0).toLong
    val env = StreamingEmit.prepare(spark, sf, quality = Some(qstore), shadow = true)
    StreamingCuration.landOrderedSlicesOf(
      docs.filter(col("doc_id") < mid), "doc_id", env.cur.inDir, 2)
    StreamingEmit.runPass(spark, env) // stream dies here
    StreamingCuration.landOrderedSlicesOf(
      docs.filter(col("doc_id") >= mid), "doc_id", env.cur.inDir, 2, tag = "b")
    StreamingEmit.runPass(spark, env) // fresh query, same checkpoint + carry
    val model = qstore.loadProduction(spark, QualityModel.ModelName).get
    val batchLearned = TextOps.curationLearnedDecisions(spark, sf, model)
      .select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val streamedLearned = spark.read.parquet(env.cur.learnedOutDir)
      .select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(streamedLearned == batchLearned, "learned shadow record drift after restart: " +
      streamedLearned.filter { case (k, v) => batchLearned.get(k) != Some(v) }.take(5))
    val batchWindows = TextOps.curationEmit.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val streamedWindows = StreamingEmit.emittedWindows(spark, env).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(streamedWindows == batchWindows, "window drift after restart")
  }

  test("gated emission: a mid-stream promotion changes subsequent batches' windows only") {
    // the ACTIVE learned gate drives a live window cut
    // (stream_curation_gated's machinery): promote the trained model,
    // emit the first half; promote an accept-all sentinel; emit the
    // second half. Pass-1's completed gated windows are immutable
    // history; the drained gated stream must equal a batch recut from
    // the landed (mixed-model) learned decisions — the gate flip
    // takes effect at the next batch and ONLY there.
    import graft.streaming.{StreamingCuration, StreamingEmit}
    val trained = QualityModel.closedForm(spark, sf)
    val qstore = new graft.sources.FrameStore(
      java.nio.file.Files.createTempDirectory("graft-qgate-emit-hot-").toString)
    qstore.promote(QualityModel.ModelName,
      qstore.register(spark, QualityModel.ModelName, trained))
    val env = StreamingEmit.prepare(spark, sf, quality = Some(qstore), shadow = true)
    val docs = graft.sources.Tables.documents(spark, sf)
    val mid = docs.agg(avg(col("doc_id"))).head().getDouble(0).toLong
    StreamingCuration.landOrderedSlicesOf(
      docs.filter(col("doc_id") < mid), "doc_id", env.cur.inDir, 2)
    StreamingEmit.runPass(spark, env)
    def winSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, String)] =
      df.select("source", "seq_id", "n_tokens", "window_fp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val gatedHalf1 = winSet(spark.read.parquet(env.gatedWindowsDir))
    val drops1 = spark.read.parquet(env.cur.learnedOutDir)
      .filter(col("drop_reason") === "low_quality").count()
    assert(drops1 > 0, "trained model should gate some docs in pass 1")
    qstore.promote(QualityModel.ModelName,
      qstore.register(spark, QualityModel.ModelName,
        Seq((-1, 10.0)).toDF("idx", "coef")))
    StreamingCuration.landOrderedSlicesOf(
      docs.filter(col("doc_id") >= mid), "doc_id", env.cur.inDir, 2, tag = "b")
    StreamingEmit.runPass(spark, env)
    // pass-1 windows are immutable history under the promotion
    val afterPass1Windows = winSet(spark.read.parquet(env.gatedWindowsDir)
      .filter(col("batch") <= 1))
    assert(afterPass1Windows == gatedHalf1,
      "a promotion must not rewrite already-emitted gated windows")
    // accept-all sentinel gates nothing in pass 2
    assert(spark.read.parquet(env.cur.learnedOutDir)
      .filter(col("doc_id") >= mid && col("drop_reason") === "low_quality")
      .count() == 0)
    // the drained gated stream ≡ batch recut from the landed
    // (mixed-model) learned decision record
    val recut = winSet(TextOps.emitWindowsOfRetained(
      spark.read.parquet(env.cur.learnedOutDir)
        .filter(col("drop_reason").isNull)
        .select(col("source"), col("doc_id"), col("red"), col("final_tokens"))))
    assert(winSet(StreamingEmit.allGatedWindows(spark, env)) == recut,
      "gated windows must equal the recut of the landed learned decisions")
  }

  test("a mid-stream promotion hot-reloads at the next batch") {
    // pass 1 scores with the trained model; a SENTINEL v2 (intercept
    // +10, no coefficients → proba ≈ 1 for every doc) promotes
    // between passes; pass 2 (same checkpoint, new arrivals) must
    // never drop low_quality again, without restarting the world
    val trained = QualityModel.closedForm(spark, sf)
    val qstore = new graft.sources.FrameStore(
      java.nio.file.Files.createTempDirectory("graft-qgate-hot-").toString)
    qstore.promote(QualityModel.ModelName,
      qstore.register(spark, QualityModel.ModelName, trained))
    val env = StreamingCuration.prepare(spark, sf, quality = Some(qstore))
    val docs = graft.sources.Tables.documents(spark, sf)
    val mid = docs.agg(avg(col("doc_id"))).head().getDouble(0).toLong
    StreamingCuration.landOrderedSlicesOf(
      docs.filter(col("doc_id") < mid), "doc_id", env.inDir, 2)
    StreamingCuration.runPass(spark, env)
    val pass1 = StreamingCuration.streamedDecisions(spark, env)
      .filter(col("drop_reason") === "low_quality").count()
    assert(pass1 > 0, "trained model should drop some docs in pass 1")
    qstore.promote(QualityModel.ModelName,
      qstore.register(spark, QualityModel.ModelName,
        Seq((-1, 10.0)).toDF("idx", "coef")))
    StreamingCuration.landOrderedSlicesOf(
      docs.filter(col("doc_id") >= mid), "doc_id", env.inDir, 2, tag = "b")
    StreamingCuration.runPass(spark, env)
    val pass2 = StreamingCuration.streamedDecisions(spark, env)
      .filter(col("doc_id") >= mid && col("drop_reason") === "low_quality").count()
    assert(pass2 == 0, s"$pass2 low_quality drops after the accept-all promotion")
    // and pass-1 decisions are immutable history — still present
    assert(StreamingCuration.streamedDecisions(spark, env)
      .filter(col("doc_id") < mid && col("drop_reason") === "low_quality")
      .count() == pass1)
  }

  test("gated mm emission: a mid-stream promotion changes subsequent batches' records only") {
    // the learned gate driving the INTERLEAVED multimodal emission
    // (stream_mm_emit_gated's machinery): promote the trained model,
    // stream the first half; promote an accept-all sentinel; stream
    // the second half. Pass-1's landed gated records are immutable
    // history; the drained gated record stream must cut the same
    // windows as a batch recut from the landed (mixed-model) gated
    // record set — the gate flip takes effect at the next batch and
    // ONLY there.
    import graft.streaming.StreamingMmEmit
    import graft.multimodal.Multimodal
    val trained = QualityModel.closedForm(spark, sf)
    val qstore = new graft.sources.FrameStore(
      java.nio.file.Files.createTempDirectory("graft-qgate-mm-hot-").toString)
    qstore.promote(QualityModel.ModelName,
      qstore.register(spark, QualityModel.ModelName, trained))
    val env = StreamingMmEmit.prepare(spark, sf, quality = Some(qstore))
    val docs = graft.sources.Tables.documents(spark, sf)
    val mid = docs.agg(avg(col("doc_id"))).head().getDouble(0).toLong
    StreamingCuration.landOrderedSlicesOf(
      docs.filter(col("doc_id") < mid), "doc_id", env.inDir, 2)
    StreamingMmEmit.runPass(spark, env)
    def entrySet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("shard", "doc_id", "start_off").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gatedHalf1 = entrySet(spark.read.parquet(env.gatedOutDir))
    val alignedHalf1 = entrySet(spark.read.parquet(env.outDir))
    assert(gatedHalf1.size < alignedHalf1.size,
      "trained model should gate some aligned records in pass 1")
    qstore.promote(QualityModel.ModelName,
      qstore.register(spark, QualityModel.ModelName,
        Seq((-1, 10.0)).toDF("idx", "coef")))
    StreamingCuration.landOrderedSlicesOf(
      docs.filter(col("doc_id") >= mid), "doc_id", env.inDir, 2, tag = "b")
    StreamingMmEmit.runPass(spark, env)
    // pass-1 gated records are immutable history under the promotion
    val maxPass1Batch = 1L
    assert(entrySet(spark.read.parquet(env.gatedOutDir)
      .filter(col("batch") <= maxPass1Batch)) == gatedHalf1,
      "a promotion must not rewrite already-landed gated records")
    // accept-all sentinel gates nothing in pass 2: every aligned
    // second-half record lands on the gated stream too
    val aligned2 = spark.read.parquet(env.outDir)
      .filter(col("doc_id") >= mid).select("doc_id").distinct().count()
    val gated2 = spark.read.parquet(env.gatedOutDir)
      .filter(col("doc_id") >= mid).select("doc_id").distinct().count()
    assert(gated2 == aligned2, s"sentinel pass gated $gated2 of $aligned2 aligned records")
    // drained gated windows ≡ batch recut from the landed
    // (mixed-model) gated record set: per-shard arrivals are doc_id-
    // ordered, so continuous placement ≡ the batch prefix sum over
    // the union record set
    val gatedEntries = spark.read.parquet(env.gatedOutDir).drop("batch")
    val recut = Multimodal.mmEmitWindows(spark, sf, Multimodal.mmPositionOf(spark, sf,
      Multimodal.mmEmitDocs(spark, sf)
        .join(gatedEntries.select(col("doc_id")).distinct(), Seq("doc_id"))))
    def winSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, String)] =
      df.select("shard", "seq_id", "n_tokens", "n_patch", "window_fp").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
    assert(winSet(Multimodal.mmEmitWindows(spark, sf, gatedEntries)) == winSet(recut),
      "gated windows must equal the recut of the landed gated record set")
  }

  test("gated trimodal emission: a mid-stream promotion changes subsequent batches' records only") {
    // the learned gate driving the THREE-MODALITY record stream
    // (stream_trimodal_gated's machinery): same promotion contract as
    // the mm pin — pass-1 landed gated records are immutable, the
    // accept-all sentinel gates nothing afterward, and the drained
    // gated stream cuts the same windows as a batch recut from the
    // landed (mixed-model) gated record set.
    import graft.streaming.StreamingMmEmit
    import graft.multimodal.Multimodal
    val trained = QualityModel.closedForm(spark, sf)
    val qstore = new graft.sources.FrameStore(
      java.nio.file.Files.createTempDirectory("graft-qgate-tri-hot-").toString)
    qstore.promote(QualityModel.ModelName,
      qstore.register(spark, QualityModel.ModelName, trained))
    val env = StreamingMmEmit.prepareTrimodal(spark, sf, quality = Some(qstore))
    val docs = graft.sources.Tables.documents(spark, sf)
    val mid = docs.agg(avg(col("doc_id"))).head().getDouble(0).toLong
    StreamingCuration.landOrderedSlicesOf(
      docs.filter(col("doc_id") < mid), "doc_id", env.inDir, 2)
    StreamingMmEmit.runTrimodalPass(spark, env)
    def recSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Long)] =
      df.select("shard", "doc_id", "mrank", "start_off").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    val gatedHalf1 = recSet(spark.read.parquet(env.gatedOutDir))
    val allHalf1 = recSet(spark.read.parquet(env.outDir))
    assert(gatedHalf1.size < allHalf1.size,
      "trained model should gate some records in pass 1")
    qstore.promote(QualityModel.ModelName,
      qstore.register(spark, QualityModel.ModelName,
        Seq((-1, 10.0)).toDF("idx", "coef")))
    StreamingCuration.landOrderedSlicesOf(
      docs.filter(col("doc_id") >= mid), "doc_id", env.inDir, 2, tag = "b")
    StreamingMmEmit.runTrimodalPass(spark, env)
    assert(recSet(spark.read.parquet(env.gatedOutDir).filter(col("batch") <= 1))
      == gatedHalf1, "a promotion must not rewrite already-landed gated records")
    // accept-all sentinel gates nothing in pass 2
    val all2 = spark.read.parquet(env.outDir)
      .filter(col("doc_id") >= mid).select("doc_id", "mrank").distinct().count()
    val gated2 = spark.read.parquet(env.gatedOutDir)
      .filter(col("doc_id") >= mid).select("doc_id", "mrank").distinct().count()
    assert(gated2 == all2, s"sentinel pass gated $gated2 of $all2 records")
    // drained gated windows ≡ batch recut from the landed gated docs
    val gatedEntries = spark.read.parquet(env.gatedOutDir).drop("batch")
    val recut = Multimodal.trimodalEmitWindowsOf(spark, sf,
      Multimodal.trimodalPositionOf(spark, sf,
        Multimodal.trimodalGated(spark, sf)
          .join(gatedEntries.select(col("doc_id")).distinct(), Seq("doc_id"))))
    def winSet2(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, String)] =
      df.select("shard", "seq_id", "n_tokens", "n_patch", "window_fp").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
    assert(winSet2(Multimodal.trimodalEmitWindowsOf(spark, sf, gatedEntries))
      == winSet2(recut),
      "gated trimodal windows must equal the recut of the landed record set")
  }
}
