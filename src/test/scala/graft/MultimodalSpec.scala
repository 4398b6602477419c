package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload schema, deterministic stubbed
  * decode via mapPartitions, metadata consistency. */
class MultimodalSpec extends SparkSpec {

  test("media table exposes binary payload + typed metadata") {
    val media = Multimodal.mediaTable(spark, sf)
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("format") == "string")
    assert(schema("width") == "int" && schema("height") == "int")
  }

  test("feature extraction is deterministic and consistent with payload") {
    val media = Multimodal.mediaTable(spark, sf)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    // n_bytes equals document n_chars (ascii corpus)
    val chars = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f1.forall(f => f.n_bytes.toLong == chars(f.doc_id)))
    assert(f1.forall(f => f.mean_intensity > 0 && f.n_frames >= 1))
  }

  test("partition count survives mapPartitions (no implicit shuffle)") {
    val media = Multimodal.mediaTable(spark, sf).repartition(3)
    val out = Multimodal.extractFeatures(media)
    assert(out.rdd.getNumPartitions == 3)
  }

  test("PPM decoder recovers header fields and validates byte accounting") {
    val rows = Multimodal.imageDecode.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // every synthesized image decodes cleanly
    assert(rows.forall(_.getAs[Boolean]("magic_ok")))
    assert(rows.forall(_.getAs[Boolean]("payload_complete")))
    assert(rows.forall(_.getAs[Int]("maxval") == 255))
    // decoded dims came from the HEADER; they must match the encoder's
    val chars = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val n = chars(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("w") == n % 8 + 4 && r.getAs[Int]("h") == n % 6 + 3)
      assert(r.getAs[Int]("n_pixels") == r.getAs[Int]("w") * r.getAs[Int]("h"))
      // pixels are cycled printable text bytes
      assert(r.getAs[Int]("min_px") >= 9 && r.getAs[Int]("max_px") <= 126)
      val Seq(mr, mg, mb) = Seq("mean_r", "mean_g", "mean_b").map(r.getAs[Double])
      assert(mr >= r.getAs[Int]("min_px") && mr <= r.getAs[Int]("max_px"))
      assert(mg > 0 && mb > 0)
    }
  }

  test("PPM decoder flags truncated payloads instead of decoding garbage") {
    import spark.implicits._
    // header claims 4x3 = 36 pixel bytes but only 10 arrive
    val bad = Seq((1L, ("P6\n4 3\n255\n" + "x" * 10).getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val r = Multimodal.decodePpm(bad).select("magic_ok", "w", "h", "payload_complete").head()
    assert(r.getBoolean(0) && r.getInt(1) == 4 && r.getInt(2) == 3)
    assert(!r.getBoolean(3), "truncation not detected")
  }

  test("image dedup finds every planted near-identical twin within Hamming 3") {
    val pairs = Multimodal.imageDedup.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming")))
    val twinPairs = pairs.filter { case (d1, d2, _) => d2 == d1 + 1000000L }
    val expectedTwins = graft.sources.Tables.documents(spark, sf)
      .filter(col("n_chars") > 0 && col("doc_id") % 10 === 0).count()
    assert(twinPairs.length == expectedTwins,
      s"${twinPairs.length} of $expectedTwins planted twins detected")
    assert(twinPairs.forall(_._3 <= 3))
    // perturbation must also be visible: some twin or corpus pair is
    // near (0 < hamming <= 3), not just exact-hash collisions
    assert(pairs.exists(p => p._3 > 0 && p._3 <= 3))
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 0 && p._3 <= 3))
  }

  test("WAV decoder recovers fields from an independently built binary") {
    import spark.implicits._
    // hand-assembled with java.nio (no engine encoder involved):
    // 8-bit PCM, stereo, 8 kHz, 3 frames L=[10,20,30] R=[40,50,60]
    val data = Array[Byte](10, 40, 20, 50, 30, 60)
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(2).putInt(8000).putInt(16000)
      .putShort(2).putShort(8).put("data".getBytes("US-ASCII"))
      .putInt(data.length).put(data)
    val wav = Seq((7L, bb.array())).toDF("doc_id", "payload")
    val r = Multimodal.decodeWav(wav).head()
    assert(r.getAs[Boolean]("riff_ok") && r.getAs[Boolean]("wave_ok")
      && r.getAs[Boolean]("fmt_pcm_ok") && r.getAs[Boolean]("payload_complete"))
    assert(r.getAs[Int]("n_channels") == 2 && r.getAs[Int]("sample_rate") == 8000
      && r.getAs[Int]("bits") == 8)
    assert(r.getAs[Long]("data_size") == 6L && r.getAs[Long]("n_frames") == 3L)
    assert(r.getAs[Int]("peak_l") == 30 && r.getAs[Int]("peak_r") == 60)
    assert(math.abs(r.getAs[Double]("rms_l")
      - BigDecimal(math.sqrt((100.0 + 400 + 900) / 3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    assert(math.abs(r.getAs[Double]("duration_ms") - 0.375) < 1e-12)
    // a truncated clip must be flagged, not silently mis-decoded
    val cut = Seq((8L, bb.array().dropRight(2))).toDF("doc_id", "payload")
    assert(!Multimodal.decodeWav(cut).head().getAs[Boolean]("payload_complete"))
  }

  test("streamed image dedup equals the batch pair list across slicings") {
    val batch = Multimodal.imageDedup.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming"))).toSet
    for (slices <- Seq(2, 5)) {
      val streamed = graft.streaming.StreamingMedia
        .runImageDedupStream(spark, sf, slices).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming"))).toSet
      assert(streamed == batch, s"slices=$slices: extra=${(streamed -- batch).take(3)} " +
        s"missing=${(batch -- streamed).take(3)}")
    }
  }

  test("audio dedup finds every planted near-identical twin within Hamming 3") {
    val pairs = Multimodal.audioDedup.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming")))
    val twinPairs = pairs.filter { case (d1, d2, _) => d2 == d1 + 1000000L }
    val expectedTwins = graft.sources.Tables.documents(spark, sf)
      .filter(col("n_chars") > 0 && col("doc_id") % 10 === 0).count()
    assert(twinPairs.length == expectedTwins,
      s"${twinPairs.length} of $expectedTwins planted twins detected")
    assert(twinPairs.forall(_._3 <= 3))
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 0 && p._3 <= 3))
  }

  test("video dedup finds every planted frame-perturbed twin within Hamming 3") {
    val pairs = Multimodal.videoDedup.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming")))
    val twinPairs = pairs.filter { case (d1, d2, _) => d2 == d1 + 1000000L }
    val expectedTwins = graft.sources.Tables.documents(spark, sf)
      .filter(col("n_chars") > 0 && col("doc_id") % 10 === 0).count()
    assert(twinPairs.length == expectedTwins,
      s"${twinPairs.length} of $expectedTwins planted twins detected")
    assert(twinPairs.forall(_._3 <= 3))
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 0 && p._3 <= 3))
  }

  test("video temporal signature depends on frame ORDER, not just frame content") {
    import spark.implicits._
    // two 3-frame clips built from raw frame pixels directly: same
    // frame multiset, different order, must hash differently — the
    // rotate-XOR chain makes order part of the identity (a plain XOR
    // of frame hashes would collapse them)
    def clip(frames: Seq[String], w: Int, h: Int): Array[Byte] =
      frames.map(px => s"P6\n$w $h\n255\n$px").mkString("").getBytes("US-ASCII")
    val w = 4; val h = 3
    val fa = "a" * (3 * w * h)
    val fb = ("ab" * (3 * w * h)).take(3 * w * h)
    val fc = ("xyz" * (3 * w * h)).take(3 * w * h)
    val docs = Seq(
      (1L, clip(Seq(fa, fb, fc), w, h)),
      (2L, clip(Seq(fb, fa, fc), w, h)))
      .toDF("doc_id", "payload")
    val sigs = Multimodal.videoSignaturesOfPayloads(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) != sigs(2L),
      s"frame order must change the temporal signature: ${sigs(1L)}")
  }

  test("streamed video dedup equals the batch pair list across slicings") {
    val batch = Multimodal.videoDedup.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming"))).toSet
    for (slices <- Seq(2, 5)) {
      val streamed = graft.streaming.StreamingMedia
        .runVideoDedupStream(spark, sf, slices).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming"))).toSet
      assert(streamed == batch, s"slices=$slices: extra=${(streamed -- batch).take(3)} " +
        s"missing=${(batch -- streamed).take(3)}")
    }
  }

  test("streamed interleaved emission equals the batch windows across slicings") {
    import graft.streaming.StreamingMmEmit
    import graft.multimodal.Multimodal
    val batch = Multimodal.mmEmitIds.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
    for (slices <- Seq(2, 5)) {
      val streamed = Multimodal.mmEmitWindows(spark, sf,
          StreamingMmEmit.runMmEmitStream(spark, sf, slices))
        .orderBy(col("shard"), col("seq_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
      assert(streamed == batch, s"slices=$slices interleaved window drift")
    }
  }

  test("continuous trimodal emission equals the batch three-gate window cut across slicings") {
    import graft.streaming.StreamingMmEmit
    import graft.multimodal.Multimodal
    val batch = Multimodal.trimodalEmitIds.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
    for (slices <- Seq(2, 5)) {
      val streamed = Multimodal.trimodalEmitWindowsOf(spark, sf,
          StreamingMmEmit.runTrimodalStream(spark, sf, slices))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
      assert(streamed == batch, s"slices=$slices trimodal window drift")
    }
  }

  test("trimodal dataloader contract is consistent with the emission (bounds + id-freq conservation)") {
    // the boundary manifest and the unigram table are rollups of the
    // SAME positioned record frame the windows cut from — pin the
    // conservation laws a weighting or offset bug would break:
    //  - every manifest window exists in the emission, and record
    //    starts sum to the gated record count;
    //  - Σ id mass (id ≥ 0) = Σ window tokens − Σ window patches, and
    //    the patch row (id −1) = Σ window patches exactly.
    val windows = Multimodal.trimodalEmitIds.fn(spark, sf).collect()
    val winSet = windows.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_id"))).toSet
    val bounds = Multimodal.trimodalBounds.fn(spark, sf).collect()
    bounds.foreach { r =>
      val k = (r.getAs[Long]("shard"), r.getAs[Long]("seq_id"))
      assert(winSet.contains(k), s"manifest window $k not emitted")
    }
    val nStarts = bounds.map(_.getAs[Long]("n_records_started")).sum
    val nRecords = Multimodal.trimodalCard.fn(spark, sf).collect()
      .map(_.getAs[Long]("n_records")).sum
    assert(nStarts == nRecords, s"record starts $nStarts != gated records $nRecords")
    val freq = Multimodal.trimodalIdFreq.fn(spark, sf).collect()
    val patchMass = freq.filter(_.getAs[Long]("id") == -1L)
      .map(_.getAs[Long]("n_occurrences")).sum
    val idMass = freq.filter(_.getAs[Long]("id") >= 0L)
      .map(_.getAs[Long]("n_occurrences")).sum
    val winTokens = windows.map(_.getAs[Long]("n_tokens")).sum
    val winPatch = windows.map(_.getAs[Long]("n_patch")).sum
    assert(patchMass == winPatch, s"patch row $patchMass != window patch mass $winPatch")
    assert(idMass == winTokens - winPatch,
      s"id mass $idMass != shipped ids ${winTokens - winPatch}")
  }

  test("live takedown: the stream forgets mid-flight across a kill/resume boundary") {
    // the world IS the kill/resume composition: the phase-1 query
    // dies after draining half the corpus, the takedown lands against
    // the quiesced artifacts, and a FRESH query resumes on the same
    // checkpoint. Assert the non-vacuity legs the certificate's
    // booleans rest on, then an idle wake-up: a third pass with no
    // new arrivals must change nothing.
    import graft.streaming.StreamingMmEmit
    import graft.multimodal.Multimodal.{TakedownMod, TakedownResidue}
    val world = StreamingMmEmit.trimodalStreamForgetWorld(spark, sf)
    def forgot(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("doc_id") % TakedownMod === TakedownResidue).count()
    // phase 1 genuinely ingested withdrawn docs (the recut leg is live)
    assert(forgot(world.preEntries) > 0, "no withdrawn doc shipped before the forget")
    // the registry leg is live too: withdrawn docs arrived AFTER the
    // forget and were kept out (they exist in the upper id half)
    assert(graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") >= world.mid &&
        col("doc_id") % TakedownMod === TakedownResidue).count() > 0,
      "no withdrawn doc in the post-forget arrivals — registry leg vacuous")
    // the drained release holds NO withdrawn record, from either phase
    assert(forgot(world.entries) == 0, "withdrawn records survived the takedown")
    // the mid-stream rewrite is ONE dynamic-partition-overwrite write
    // action — a CONSTANT two jobs (the AQE shuffle-materialization of
    // repartition(batch) + the final write), never a per-batch-dir
    // loop, which runs one job per landed micro-batch (>= the batch
    // count asserted strictly above the pin here; 10^4-10^5 serialized
    // jobs on a 100 TB stream)
    val landedBatches = world.preEntries.select(col("batch")).distinct().count()
    assert(landedBatches >= 4,
      s"phase 1 landed $landedBatches batches — the one-job pin would be vacuous")
    assert(StreamingMmEmit.lastTakedownRewriteJobs >= 1 &&
      StreamingMmEmit.lastTakedownRewriteJobs <= 2 &&
      StreamingMmEmit.lastTakedownRewriteJobs < landedBatches,
      s"takedown rewrite ran ${StreamingMmEmit.lastTakedownRewriteJobs} write jobs " +
        s"over $landedBatches landed batches, want a batch-count-independent <= 2")
    // drained union == the batch forget world's recut-from-reduced-corpus
    val fin = world.finalWindows.collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_patch"),
        r.getAs[String]("window_fp"))).toSet
    val rebuilt = graft.multimodal.Multimodal.trimodalForgetRebuilt(spark, sf).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_patch"),
        r.getAs[String]("window_fp"))).toSet
    assert(fin == rebuilt, s"drain != batch rebuild: extra=${(fin -- rebuilt).take(3)} " +
      s"missing=${(rebuilt -- fin).take(3)}")
    // idle wake-up: a third pass on the same checkpoint with no new
    // arrivals is a no-op (the resumed stream stays idempotent)
    val before = world.entries.count()
    StreamingMmEmit.runTrimodalPass(spark, world.env)
    val after = spark.read.parquet(world.env.outDir).drop("batch").count()
    assert(after == before, s"idle wake-up changed the release: $before -> $after")
  }

  test("release bundle lifecycle: promote, forget through the pointer, gc reclaims the recut versions") {
    import graft.multimodal.ReleaseBundle
    val w = ReleaseBundle.bundleWorld(spark, sf)
    def m(rows: Seq[(String, Int, Long)]) = rows.map(r => r._1 -> (r._2, r._3)).toMap
    val before = m(w.manifestBefore)
    val after = m(w.manifestAfter)
    assert(before.keySet == ReleaseBundle.Components.toSet)
    assert(after.keySet == ReleaseBundle.Components.toSet)
    // the production manifest IS manifestAfter (the one-pointer publication)
    val prod = w.store.loadProduction(spark, ReleaseBundle.BundleName).get
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(prod == after, "production manifest must be the post-forget one")
    // build-time immutability/consistency facts held
    assert(w.oldReadableAtFlip, "old versions must stay readable until the flip")
    assert(w.componentsMatchManifest, "manifest row counts must match the artifacts")
    // the forget genuinely recut: windows shrank, every corpus-derived
    // component moved to a NEW version, the tokenizer version did NOT
    assert(after("windows")._2 < before("windows")._2, "forget must shrink the window set")
    for (c <- Seq("windows", "shuffle", "card", "leakage"))
      assert(after(c)._1 != before(c)._1, s"$c must re-version on forget")
    assert(after("tokenizer") == before("tokenizer"),
      "the release tokenizer must survive the forget untouched (id space never shifts)")
    // gc physically reclaimed the pre-forget versions of the recut
    // components — the withdrawn content is unreachable through any
    // pointer — while the shared tokenizer version still loads
    for (c <- Seq("windows", "shuffle", "card", "leakage"))
      assert(!w.store.versions(c).contains(before(c)._1),
        s"pre-forget $c v${before(c)._1} must be gc'd")
    assert(w.store.load(spark, "tokenizer", after("tokenizer")._1).count()
      == after("tokenizer")._2)
    // resolving THROUGH the manifest yields intact components
    prod.foreach { case (c, (v, n)) =>
      assert(w.store.load(spark, c, v).count() == n, s"$c v$v inconsistent")
    }
  }

  test("trimodal resume manifest: watermark arithmetic + seek fingerprint agree with the order") {
    val order = graft.queries.TextOps.shuffleRankTrimodal(
      Multimodal.trimodalEmitWindows(spark, sf)).cache()
    val total = order.count()
    val k = math.floor(total * 0.6).toLong
    val m = Multimodal.trimodalResume.fn(spark, sf).collect()
    // the per-shard consumed counts partition the global watermark,
    // and consumed + remaining covers every window exactly once
    assert(m.map(_.getAs[Long]("n_consumed")).sum == k)
    assert(m.map(r => r.getAs[Long]("n_consumed") + r.getAs[Long]("n_remaining")).sum
      == total)
    // the seek facts: next position continues the in-shard order, and
    // the fingerprint pinned there is the one the order actually holds
    for (r <- m if r.getAs[Long]("n_remaining") > 0) {
      assert(r.getAs[Long]("next_pos") == r.getAs[Long]("n_consumed") + 1)
      val fp = order.filter(col("shard") === r.getAs[Long]("shard") &&
        col("pos") === r.getAs[Long]("next_pos")).head.getAs[String]("window_fp")
      assert(fp == r.getAs[String]("next_window_fp"))
    }
    // a fully-consumed shard must yield NULL seek facts, never a
    // phantom position
    for (r <- m if r.getAs[Long]("n_remaining") == 0) {
      assert(r.isNullAt(r.fieldIndex("next_pos")))
      assert(r.isNullAt(r.fieldIndex("next_window_fp")))
    }
    order.unpersist()
    ()
  }

  test("trimodal epochs: each epoch reorders the identical window set") {
    val df = Multimodal.trimodalEpochs.fn(spark, sf).cache()
    val e0 = df.filter(col("epoch") === 0)
    val e1 = df.filter(col("epoch") === 1)
    assert(e0.count() == e1.count())
    // identical window MULTISET per epoch (fingerprint histogram equality)
    assert(e0.groupBy(col("window_fp")).count()
      .except(e1.groupBy(col("window_fp")).count()).count() == 0)
    // but a genuinely different order — same ord, different window
    val byOrd = e0.select(col("ord"), col("window_fp").as("f0"))
      .join(e1.select(col("ord"), col("window_fp").as("f1")), Seq("ord"))
    assert(byOrd.filter(col("f0") =!= col("f1")).count() > 0,
      "epoch 1 must not replay epoch 0's order")
    df.unpersist()
    ()
  }

  test("stream-published bundle matches the batch publication component-for-component") {
    import graft.multimodal.ReleaseBundle
    val sw = ReleaseBundle.streamBundleWorld(spark, sf)
    val bw = ReleaseBundle.bundleWorld(spark, sf)
    def m(rows: Seq[(String, Int, Long)]) = rows.map(r => r._1 -> r._3).toMap
    assert(m(sw.manifestBefore) == m(bw.manifestBefore),
      "pre-forget stream manifest must claim the batch row counts")
    assert(m(sw.manifestAfter) == m(bw.manifestAfter),
      "post-forget stream manifest must claim the batch row counts")
    assert(sw.componentsMatchManifest && sw.oldReadableAtFlip)
  }

  test("release series: v2 extends v1 without rewriting shipped windows") {
    import graft.streaming.StreamingMmEmit
    val w = StreamingMmEmit.trimodalSeriesWorld(spark, sf)
    assert(w.v2Version > w.v1Version, "republication must advance the release version")
    assert(w.v1ReadableAfterV2, "v1 must stay resolvable after the v2 flip")
    assert(w.v2Windows.count() >= w.v1Windows.count())
    // every complete v1 window survives byte-identical in v2 — the
    // accretion may only extend each shard's partial tail window
    val diff = w.v1Windows.filter(col("n_tokens") === 2048).as("a")
      .join(w.v2Windows.as("b"), Seq("shard", "seq_id"), "left_outer")
      .filter(!(col("a.window_fp") <=> col("b.window_fp"))).count()
    assert(diff == 0, s"$diff shipped windows rewritten by the republication")
    // the store resolves BOTH versions of the series until gc
    assert(w.env.store.versions(StreamingMmEmit.SeriesWindowsName)
      .contains(w.v1Version))
  }

  test("trimodal curriculum ramps patch density and anneals on the most media-dense quartile") {
    val cur = Multimodal.trimodalCurriculum.fn(spark, sf)
      .select("ord", "phase", "data_shard", "seq_id", "quartile", "patch_share").cache()
    try {
      val total = cur.count()
      val mm = cur.agg(min(col("ord")), max(col("ord"))).head()
      assert(mm.getLong(0) == 1L && mm.getLong(1) == total)
      val ranges = cur.groupBy(col("phase"))
        .agg(min(col("ord")).as("lo"), max(col("ord")).as("hi"))
        .orderBy(col("phase")).collect()
      assert(ranges.map(_.getLong(0)).toSeq == (0L to 4L).toSeq)
      ranges.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) < b.getLong(1),
          s"phase ${a.getLong(0)} must complete before ${b.getLong(0)}")
        case _ => ()
      }
      // the ramp is real: later quartiles carry denser media
      val m = cur.filter(col("phase") < 4).groupBy(col("quartile"))
        .agg(avg(col("patch_share"))).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(m(0L) < m(3L), s"patch density must ramp across quartiles: $m")
      // anneal = the quartile-3 window set under a fresh order
      val q3 = cur.filter(col("phase") === 3).orderBy(col("ord"))
        .select("data_shard", "seq_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val ann = cur.filter(col("phase") === 4).orderBy(col("ord"))
        .select("data_shard", "seq_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(q3.toSet == ann.toSet, "anneal must replay exactly the quartile-3 windows")
      assert(!q3.sameElements(ann), "anneal salt must genuinely reshuffle the replay")
    } finally { cur.unpersist(); () }
  }

  test("release diff: per-shard classification certifies append-only accretion") {
    import graft.streaming.StreamingMmEmit
    val rows = StreamingMmEmit.streamTrimodalDiff.fn(spark, sf).collect()
    assert(rows.nonEmpty, "the diff must cover every shard with v2 windows")
    rows.foreach { r =>
      val (v1, v2) = (r.getLong(1), r.getLong(2))
      val (added, recut, preserved, removed) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(removed == 0, s"accretion may never remove a window: $r")
      assert(recut <= 1, s"only the one partial tail window may be recut: $r")
      assert(v2 == v1 + added, s"window count must grow exactly by n_added: $r")
      assert(preserved == v1 - recut,
        s"every non-tail v1 window must survive byte-identical: $r")
      assert(r.getLong(7) >= 0, s"token mass can only grow under accretion: $r")
    }
    // the doc delta must account for the whole accreted half-corpus
    val world = StreamingMmEmit.trimodalSeriesWorld(spark, sf)
    val expected = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") >= world.mid).count()
    assert(rows.map(_.getLong(8)).sum == expected)
  }

  test("media drift: every later slice scores both loudness features against the reference") {
    val rows = Multimodal.mediaDrift.fn(spark, sf).collect()
    assert(rows.length == 6, "3 later slices x {rms, peak}")
    assert(rows.map(_.getString(1)).toSet == Set("rms", "peak"))
    assert(rows.forall(_.getDouble(3) >= 0.0), "PSI is non-negative by construction")
    // the monitor must SEE the loudness distribution: at this SF the
    // rms bands genuinely differ across slices (pinned ground truth),
    // so a degenerate all-zero report means the bucketing collapsed
    assert(rows.filter(_.getString(1) == "rms").exists(_.getDouble(3) > 0.0),
      "rms distribution differences must surface in the PSI")
  }

  test("streamed media drift equals the batch report") {
    // the slicing-invariance mechanism (additive per-batch counts) is
    // proven on the text face across 2/5 slicings; this pins the
    // media bucketer through the same pass
    val batch = Multimodal.mediaDrift.fn(spark, sf).collect().toSeq
    val streamed = graft.streaming.StreamingDrift.mediaDriftWorld(spark, sf)
      .report.orderBy(col("slice"), col("feature")).collect().toSeq
    assert(streamed == batch, "drained media counts must reproduce the batch PSI report")
  }

  test("media forget: a forgotten clip is indistinguishable from never-ingested (audio, shared contract)") {
    // mm_dedup_forget certifies the image modality end-to-end at the
    // gate; the takedown path is modality-blind (the banded-index
    // contract), pinned here on AUDIO: ingest the stream, snapshot
    // the pair list, forget, and both promoted artifacts must equal
    // rebuilds on the reduced media set — with no trace of the
    // forgotten ids anywhere.
    import graft.streaming.{StreamingCuration, StreamingMedia}
    import graft.multimodal.Multimodal
    def takedown(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (id % 20 === 7) || ((id - 1000000L) % 20 === 7)
    val env = StreamingMedia.prepare(spark, sf,
      docs => Multimodal.audioBands(Multimodal.audioHashes(docs)))
    StreamingCuration.landOrderedSlices(spark, env.inDir, sf, 2)
    StreamingMedia.runPass(spark, env)
    env.store.promote(StreamingMedia.PairsName,
      env.store.register(spark, StreamingMedia.PairsName,
        spark.read.parquet(env.outDir).drop("batch")))
    StreamingMedia.forgetMedia(spark, env, StreamingMedia.PairsName, takedown)
    val postings = env.store.loadProduction(spark, StreamingMedia.BandIdx).get
    val pairs = env.store.loadProduction(spark, StreamingMedia.PairsName).get
    assert(postings.filter(takedown(col("doc_id"))).count() == 0)
    assert(pairs.filter(takedown(col("d1")) || takedown(col("d2"))).count() == 0)
    val reduced = graft.sources.Tables.documents(spark, sf)
      .filter(!takedown(col("doc_id")))
    val rebuiltBands = Multimodal.audioBands(Multimodal.audioHashes(reduced))
    def bandSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Long)] =
      df.select(col("doc_id"), col("dh"), col("band").cast("int"), col("bv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(bandSet(postings) == bandSet(rebuiltBands),
      "post-forget postings must equal a rebuild on the reduced set")
    val rebuiltPairs = Multimodal.hammingPairs(Multimodal.bandCandidates(rebuiltBands))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == rebuiltPairs,
      "post-forget pair list must equal a rebuild on the reduced set")
  }

  test("caption-align planted misalignments never collapse onto the image ref") {
    import spark.implicits._
    // degenerate congruence: with n = 37 embeddings, doc_id 297 has
    // (297*31 + 7) % 37 == 297 % 37 — the UNGUARDED swap would pair
    // the "misaligned" plant with its own image embedding and score
    // ~0.999; the guard must step one vector over
    assert((297L * 31 + 7) % 37 == 297 % 37 && 297 % 10 == 7)
    val emb37 = graft.sources.Tables.embeddings(spark, sf).filter(col("vec_id") < 37)
    val docs = Seq(297L, 7L, 17L).toDF("doc_id")
    val rows = Multimodal.alignScores(docs, emb37).collect()
    rows.filter(_.getAs[Long]("doc_id") % 10 == 7).foreach { r =>
      assert(r.getAs[Long]("cap_ref") != r.getAs[Long]("img_ref"),
        s"plant collapsed: $r")
    }
    // and on the real corpus every plant lands below the 0.9 gate
    val corpus = Multimodal.alignScores(
      graft.sources.Tables.documents(spark, sf),
      graft.sources.Tables.embeddings(spark, sf))
      .filter(col("doc_id") % 10 === 7).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getAs[Long]("cap_ref") != r.getAs[Long]("img_ref"))
      assert(!r.getAs[Boolean]("keep"), s"plant kept: $r")
    }
  }

  test("composite trimodal curriculum: media quality moves quartile membership") {
    import spark.implicits._
    // 8 planted windows, patch_share strictly ascending; only the
    // hardest window carries high media quality, so the composite
    // cscore (patch_share − 0.25·quality = 0.55) must pull exactly
    // that window from quartile 3 to quartile 2 while the untouched
    // extremes keep their patch-only quartiles
    val wq = Seq(
      (0L, 0L, 0.1), (0L, 1L, 0.2), (1L, 0L, 0.3), (1L, 1L, 0.4),
      (2L, 0L, 0.5), (2L, 1L, 0.6), (3L, 0L, 0.7), (3L, 1L, 0.8))
      .toDF("data_shard", "seq_id", "patch_share")
      .withColumn("win_quality",
        when(col("data_shard") === 3 && col("seq_id") === 1, 1.0).otherwise(0.0))
      .withColumn("cscore",
        round(col("patch_share") - lit(0.25) * col("win_quality"), 6))
    def quartiles(score: org.apache.spark.sql.Column) =
      Multimodal.compositeTrimodalRank(wq, score)
        .select(col("data_shard"), col("seq_id"), col("quartile")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val comp = quartiles(col("cscore"))
    val patch = quartiles(col("patch_share"))
    assert(patch((3L, 1L)) == 3L, s"patch-only: $patch")
    assert(comp((3L, 1L)) == 2L,
      s"quality must pull the high-quality window a quartile earlier: $comp")
    assert(comp((0L, 0L)) == 0L && patch((0L, 0L)) == 0L)
    assert(comp((3L, 0L)) == 3L, s"displaced hardest-quartile tail: $comp")
    // zero quality everywhere ≡ patch-only (the weight is the lever)
    val flat = wq.withColumn("cscore", round(col("patch_share"), 6))
    val comp0 = Multimodal.compositeTrimodalRank(flat, col("cscore"))
      .select(col("data_shard"), col("seq_id"), col("quartile")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(comp0 == patch, s"zero quality must recover the patch-only schedule: $comp0")
  }

  test("quartileMembershipAsc ≡ the full two-level rank's quartile column") {
    import spark.implicits._
    def membership(wq: org.apache.spark.sql.DataFrame) =
      graft.queries.Curation.quartileMembershipAsc(wq,
          scaled = (col("patch_share") + 1) * 8,
          tieKey = Multimodal.trimodalTieKey)
        .select(col("data_shard"), col("seq_id"), col("quartile")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def fullRank(wq: org.apache.spark.sql.DataFrame) =
      Multimodal.compositeTrimodalRank(wq, col("patch_share"))
        .select(col("data_shard"), col("seq_id"), col("quartile")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // distinct-score frame with a duplicated score pair (tie broken
    // by the structural key) + a non-multiple-of-4 population
    val mixed = (0 until 23).map(i =>
        (i.toLong / 4, i.toLong % 4, (i % 7) / 10.0))
      .toDF("data_shard", "seq_id", "patch_share")
    assert(membership(mixed) == fullRank(mixed))
    // score ATOM: every row identical — the pure-band tie sub-split
    // must locate boundaries inside the atom without a global sort
    val atom = (0 until 40).map(i => (i.toLong / 8, i.toLong % 8, 0.5))
      .toDF("data_shard", "seq_id", "patch_share")
    assert(membership(atom) == fullRank(atom))
    // tiny frames: boundary ranks past N must degrade to quartile 0
    val tiny = Seq((0L, 0L, 0.3)).toDF("data_shard", "seq_id", "patch_share")
    assert(membership(tiny) == fullRank(tiny))
    // the planted 8-window frame of the movement test above
    val planted = Seq(
      (0L, 0L, 0.1), (0L, 1L, 0.2), (1L, 0L, 0.3), (1L, 1L, 0.4),
      (2L, 0L, 0.5), (2L, 1L, 0.6), (3L, 0L, 0.7), (3L, 1L, 0.8))
      .toDF("data_shard", "seq_id", "patch_share")
    assert(membership(planted) == fullRank(planted))
  }
}
