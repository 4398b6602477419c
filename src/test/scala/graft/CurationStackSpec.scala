package graft

import graft.queries.{Privacy, TextOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Stage-consistency pins for the COMPOSED curation pipeline: each
  * stage folded into `text_curation` must agree exactly with the
  * standalone query that defines it (`text_dedup_lines_prefix`,
  * `text_dedup_spans_prefix`, `text_pii_redact`), and the drop
  * cascade must honor the published priority order. */
class CurationStackSpec extends SparkSpec {
  import spark.implicits._

  private lazy val decisions = TextOps.curation.fn(spark, sf).collect()
    .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("pipeline line mask equals text_dedup_lines_prefix per doc") {
    // the pipeline's n_line_rm (tokens cut by the line stage) must be
    // exactly the tokens the standalone prefix line-dedup removes
    val standaloneKept = TextOps.dedupLinesPrefix.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens_kept")).toMap
    val rawTokens = Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(decisions.nonEmpty)
    decisions.foreach { case (d, row) =>
      val expected = rawTokens(d) - standaloneKept(d)
      assert(row.getAs[Long]("n_line_rm") == expected,
        s"doc $d line mask ${row.getAs[Long]("n_line_rm")} != standalone $expected")
    }
  }

  test("pipeline span mask equals text_dedup_spans_prefix per doc") {
    val standalone = TextOps.dedupSpansPrefix.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_removed")).toMap
    assert(decisions.values.map(_.getAs[Long]("n_span_rm")).sum > 0,
      "span stage should fire somewhere in the corpus")
    decisions.foreach { case (d, row) =>
      assert(row.getAs[Long]("n_span_rm") == standalone(d),
        s"doc $d span mask ${row.getAs[Long]("n_span_rm")} != standalone ${standalone(d)}")
    }
  }

  test("pipeline PII tail equals text_pii_redact on scrub-untouched retained docs") {
    // for a retained doc the scrub didn't touch, the pipeline plants
    // and redacts the RAW text — so its final fingerprint and count
    // must equal the standalone privacy query's row exactly
    val standalone = Privacy.piiRedact.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[String]("redacted_md5"),
          r.getAs[Long]("n_emails") + r.getAs[Long]("n_ips")
            + r.getAs[Long]("n_phones")))).toMap
    val untouchedRetained = decisions.values.filter(r =>
      r.getAs[String]("drop_reason") == null && r.getAs[Long]("n_removed") == 0L)
    assert(untouchedRetained.nonEmpty, "corpus should retain scrub-untouched docs")
    untouchedRetained.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val (md5Exp, piiExp) = standalone(d)
      assert(r.getAs[String]("final_fp") == md5Exp, s"doc $d final_fp drift")
      assert(r.getAs[Long]("n_pii") == piiExp, s"doc $d n_pii drift")
    }
  }

  test("drop cascade honors the published priority order") {
    // reasons must only come from the fixed vocabulary, and a doc
    // dropped for reason k must NOT satisfy any higher-priority
    // predicate (spot-checked via the mask/quality columns the
    // decision record itself carries)
    val allowed = Set("exact_dup", "near_dup", "heavy_dup", "contaminated",
      "lang", "low_quality")
    decisions.values.foreach { r =>
      val reason = Option(r.getAs[String]("drop_reason"))
      reason.foreach(x => assert(allowed.contains(x), s"unknown reason $x"))
      val heavy = 2L * r.getAs[Long]("n_tokens_kept") < r.getAs[Long]("n_tokens")
      if (reason.exists(x => x == "contaminated" || x == "lang" || x == "low_quality")
          || reason.isEmpty)
        assert(!heavy, s"doc ${r.getAs[Long]("doc_id")} heavy but reason $reason")
      if (reason.contains("lang"))
        assert(r.getAs[String]("pred_lang") != "en")
      if (reason.contains("low_quality"))
        assert(r.getAs[String]("pred_lang") == "en"
          && r.getAs[Double]("quality_score") < 0.7)
      if (reason.isEmpty)
        assert(r.getAs[String]("pred_lang") == "en"
          && r.getAs[Double]("quality_score") >= 0.7)
    }
  }

  test("planted heavy_dup: a doc losing over half its tokens to the union mask drops") {
    // the gate SF's corpus drops its heavy docs earlier (near_dup
    // shadows), so plant the path directly: doc 2 repeats doc 1's
    // 12-token opening (span mask kills it at prefix threshold 2)
    // but differs enough to dodge the J >= 0.5 shingle rule
    val shared = (0 until 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12", "en", "s", 0L),
      (2L, shared + " v1 v2 v3", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val per = TextOps.scrubbedQuality(docs,
      TextOps.prefixBoilerSegs(docs), TextOps.prefixDupStarts(docs))
    val dec = TextOps.curationDecide(per
      .withColumn("is_exact_dup", lit(false))
      .withColumn("is_near_dup", lit(false))
      .withColumn("is_contam", lit(false)))
      .select($"doc_id", $"drop_reason", $"n_span_rm", $"n_tokens_kept")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getLong(2), r.getLong(3))).toMap
    // doc 1 keeps everything (first carrier); doc 2 loses the 12
    // shared tokens of its 15 → heavy_dup
    assert(dec(1L)._2 == 0L && dec(1L)._1 != Some("heavy_dup"), s"doc1 ${dec(1L)}")
    assert(dec(2L) == ((Some("heavy_dup"), 12L, 3L)), s"doc2 ${dec(2L)}")
  }

  test("retained docs pack at their final (scrubbed + redacted) token counts") {
    val packed = TextOps.curationPack.fn(spark, sf)
      .agg(sum($"seq_tokens")).as[Long].head()
    val finalSum = decisions.values
      .filter(_.getAs[String]("drop_reason") == null)
      .map(_.getAs[Long]("final_tokens")).sum
    assert(packed == finalSum, s"pack total $packed != decision total $finalSum")
  }

  test("emitted windows are exactly 512 tokens except each shard's last") {
    val rows = TextOps.curationEmit.fn(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("n_tokens")))
    val bySource = rows.groupBy(_._1)
    bySource.foreach { case (src, ws) =>
      val lastSeq = ws.map(_._2).max
      ws.foreach { case (_, seq, n) =>
        if (seq != lastSeq) assert(n == 512L, s"$src window $seq has $n tokens")
        else assert(n >= 1L && n <= 512L)
      }
      // windows are contiguous from 0
      assert(ws.map(_._2).sorted.toSeq == (0L to lastSeq))
    }
    // total emitted tokens = the decision record's retained final mass
    val total = rows.map(_._3).sum
    val expected = decisions.values
      .filter(_.getAs[String]("drop_reason") == null)
      .map(_.getAs[Long]("final_tokens")).sum
    assert(total == expected, s"emitted $total != retained $expected")
  }

  test("boundary manifest is consistent with the emission: windows subset, doc mass, offset range") {
    val bounds = TextOps.curationEmitBounds.fn(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("n_docs_started")))
    val emitted = TextOps.curationEmit.fn(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id"))).toSet
    // every manifest window exists in the emission
    bounds.foreach { case (src, seq, _) =>
      assert(emitted.contains((src, seq)), s"manifest window ($src, $seq) not emitted")
    }
    // every retained doc starts in exactly one window
    val started = bounds.map(_._3).sum
    val retained = decisions.values.count(_.getAs[String]("drop_reason") == null)
    assert(started == retained.toLong, s"doc starts $started != retained $retained")
    // a window fits at most 512 doc starts (1 token minimum per doc)
    bounds.foreach { case (src, seq, n) =>
      assert(n >= 1L && n <= 512L, s"($src, $seq) claims $n starts")
    }
  }

  test("id-frequency table conserves the emitted token-ID mass") {
    // the frequency report is computed word-count-weighted (never a
    // per-token explode); its total must equal the id mass the
    // windows actually ship — a weighting bug would break exactly
    // this conservation
    val freqTotal = TextOps.emitIdFreq.fn(spark, sf)
      .agg(sum($"n_occurrences")).as[Long].head()
    val emittedIds = TextOps.curationEmitIds.fn(spark, sf)
      .agg(sum($"n_ids")).as[Long].head()
    assert(freqTotal == emittedIds, s"freq mass $freqTotal != emitted ids $emittedIds")
  }

  test("emission tokenizer is lossless and its id space is dense") {
    import graft.queries.TextOps
    // every emitted word (incl. OOV plant words and redaction
    // markers) must reassemble exactly from its BPE symbols — a
    // dropped or mangled symbol would silently corrupt the id stream
    val emitted = TextOps.emitWordSyms(spark, sf) // (word, j, id)
    val distinctWords = emitted.select("word").distinct()
    val bad = distinctWords
      .withColumn("re", concat_ws("", TextOps.bpeSegments(spark, sf, col("word"))))
      .filter(col("re") =!= col("word")).count()
    assert(bad == 0, s"$bad words fail to reassemble from their symbols")
    // ids are the dense 0..N-1 lexicographic ranks of the symbol set
    val stats = emitted.agg(min(col("id")), max(col("id")),
      countDistinct(col("id"))).head()
    assert(stats.getLong(0) == 0L)
    assert(stats.getLong(1) == stats.getLong(2) - 1)
  }

  // reference fold of the whole-doc policy — the spec-side oracle for
  // the over-window branch the test corpora never reach (max doc ~100
  // tokens at every sf)
  private def wholePackReference(rows: Seq[(String, Long, Long)], budget: Long = 512L)
      : Seq[(String, Long, Long, Long, Long, Boolean)] = {
    val byBlk = rows.groupBy { case (s, d, _) => (s, d / TextOps.PackBlockDocs) }
    // keyed by (source, doc_id): doc ids repeat across sources
    val local = scala.collection.mutable.Map.empty[(String, Long), (String, Long, Long, Long)]
    val nwin = scala.collection.mutable.Map.empty[(String, Long), Long]
    for (((src, blk), ds) <- byBlk.toSeq.sortBy(_._1)) {
      var poff = 0L
      var lastOff = 0L; var lastN = 0L
      for ((_, did, n) <- ds.sortBy(_._2)) {
        val fill = poff % budget
        if (fill != 0 && fill + n > budget) poff += budget - fill
        local((src, did)) = (src, n, poff, blk)
        lastOff = poff; lastN = n
        poff += n
        if (n > budget && poff % budget != 0) poff += budget - poff % budget
      }
      // block windows = last doc's last occupied window + 1; the
      // max(n, 1) mirrors the engine guard — a trailing zero-token
      // doc on a window boundary still occupies that window
      nwin((src, blk)) = (lastOff + math.max(lastN, 1L) + budget - 1) / budget
    }
    val wOff = scala.collection.mutable.Map.empty[(String, Long), Long]
    for (src <- nwin.keys.map(_._1).toSeq.distinct.sorted) {
      var acc = 0L
      for (k <- nwin.keys.filter(_._1 == src).toSeq.sortBy(_._2)) {
        wOff(k) = acc; acc += nwin(k)
      }
    }
    local.toSeq.map { case ((_, did), (src, n, poff, blk)) =>
      (src, did, n, wOff((src, blk)) + poff / budget, poff % budget, n > budget)
    }.sorted
  }

  test("whole-doc pack: planted over-window docs split alone, sub-window docs never split") {
    graft.functions.GraftFunctions.register(spark)
    // spans both sides of a 4096 id-block boundary; sizes hit every
    // branch: fits, pads-then-starts-fresh, exactly-512, over-window
    // (1024 = exact multiple, 1500/600/513 = padded tails)
    val rows = Seq(
      ("a", 10L, 100L), ("a", 20L, 480L), ("a", 30L, 512L), ("a", 40L, 600L),
      ("a", 41L, 5L), ("a", 4095L, 5L), ("a", 4096L, 100L),
      ("a", 4100L, 1024L), ("a", 4101L, 1L),
      ("b", 15L, 1500L), ("b", 16L, 513L), ("b", 17L, 5L), ("b", 5000L, 512L),
      // the zero-token edge: block 0 ends with a zero-token doc
      // sitting EXACTLY on a window boundary (512-token doc fills
      // window 0; the zero doc's offset is 512 = window 1) — block
      // 1's first window must NOT collide with it
      ("z", 0L, 512L), ("z", 1L, 0L), ("z", 4096L, 10L),
      // and a zero-token doc mid-window (no extra window claimed)
      ("z", 8192L, 10L), ("z", 8193L, 0L), ("z", 8194L, 20L))
    val got = TextOps.packWholeDocs(rows.toDF("source", "doc_id", "n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq.sorted
    assert(got == wholePackReference(rows),
      s"engine pack diverges from the reference fold:\n$got\nvs\n${wholePackReference(rows)}")
    // policy pins: only over-window docs split; every split doc
    // starts at a window boundary; no sub-window doc crosses one
    for ((src, did, n, seq, off, split) <- got) {
      assert(split == (n > 512L), s"doc $did")
      if (split) assert(off == 0L, s"split doc $did must start at a boundary")
      else assert(off + math.max(n, 1L) <= 512L, s"doc $did crosses a boundary")
    }
    // append-stability under the zero-token edge: the boundary zero
    // doc claims window 1, so block 1 starts at window 2 — no
    // (source, seq_id) collision across blocks; the mid-window zero
    // claims nothing extra
    val z = got.filter(_._1 == "z").map(t => t._2 -> t._4).toMap
    assert(z(0L) == 0L && z(1L) == 1L, s"boundary zero doc placement: $z")
    assert(z(4096L) == 2L, s"next block must start past the zero doc's window: $z")
    assert(z(8193L) == z(8192L) && z(8194L) == z(8192L),
      s"mid-window zero doc must not open a window: $z")
    // the report conserves mass: windows * 512 = tokens + pad, and
    // split accounting matches the planted over-window population
    val rep = TextOps.packWholeReportOf(
      TextOps.packWholeDocs(rows.toDF("source", "doc_id", "n_tokens"))).collect()
    for (r <- rep) {
      assert(r.getAs[Long]("n_windows") * 512L ==
        r.getAs[Long]("n_tokens") + r.getAs[Long]("pad_tokens"))
      val planted = rows.count(x => x._1 == r.getAs[String]("source") && x._3 > 512L)
      assert(r.getAs[Long]("n_split_docs") == planted.toLong)
    }
  }

  test("whole-doc pack at sf: split_rate 0 and the pad delta vs concat-pack is the measured price") {
    graft.functions.GraftFunctions.register(spark)
    val retained = TextOps.curationDecisions(spark, sf)
      .filter(col("drop_reason").isNull)
      .select(col("source"), col("doc_id"), col("final_tokens").as("n_tokens"))
    val whole = TextOps.packWholeReportOf(TextOps.packWholeDocs(retained))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val concat = TextOps.packEfficiencyOfDecisions(TextOps.curationDecisions(spark, sf))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(whole.keySet == concat.keySet)
    for ((src, w) <- whole) {
      val c = concat(src)
      // no retained doc exceeds a window at test scale → zero splits,
      // where the concat policy splits every boundary-crossing doc
      assert(w.getAs[Long]("n_split_docs") == 0L, src)
      assert(w.getAs[Double]("windows_per_doc") == 1.0, src)
      // same tokens, never fewer windows: the pad delta IS the price
      assert(w.getAs[Long]("n_tokens") == c.getAs[Long]("n_tokens"), src)
      assert(w.getAs[Long]("pad_tokens") >= c.getAs[Long]("pad_tokens"), src)
    }
    // the lever is non-vacuous at this corpus: concat splits docs
    assert(concat.values.map(_.getAs[Long]("n_split_docs")).sum > 0L)
  }

  test("pack policy: all-long source chooses concat, all-short chooses whole-doc") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // L: every doc over-window (2000 tokens) — the whole-doc policy
    // splits them ANYWAY and pads each doc's own tail, so concat
    // must win; S: short docs (60 tokens) — whole-doc avoids the
    // ~12% boundary-split rate for a ~6% tail pad, so it must win
    val docs = ((0 until 40).map(i => ("L", i.toLong, 2000L)) ++
        (0 until 100).map(i => ("S", i.toLong, 60L)))
      .toDF("source", "doc_id", "n_tokens")
    val decisions = docs
      .select(col("source"), col("doc_id"), col("n_tokens").as("final_tokens"),
        lit(null).cast("string").as("drop_reason"))
    val pol = TextOps.packPolicyOf(
        TextOps.packEfficiencyOfDecisions(decisions),
        TextOps.packWholeReportOf(TextOps.packWholeDocs(docs)))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(pol("L").getAs[String]("chosen_policy") == "concat",
      s"long-doc source must choose concat: ${pol("L")}")
    assert(pol("S").getAs[String]("chosen_policy") == "whole_doc",
      s"short-doc source must choose whole-doc: ${pol("S")}")
    // the decision is the stated arithmetic, not a hidden rule
    for ((_, r) <- pol) {
      val cc = r.getAs[Double]("cost_concat"); val cw = r.getAs[Double]("cost_whole")
      assert(r.getAs[String]("chosen_policy") ==
        (if (cw <= cc) "whole_doc" else "concat"))
    }
  }

  test("curriculum-ordered pack: quartile-contiguous windows, mass conserved") {
    graft.functions.GraftFunctions.register(spark)
    val packed = graft.queries.Curation.packCurriculum.fn(spark, sf)
      .select(col("ord"), col("doc_id"), col("quartile"), col("n_tokens"),
        col("seq_id")).collect()
    // every doc packed exactly once, mass conserved vs the corpus
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(packed.length == nDocs)
    assert(packed.map(_.getAs[Long]("doc_id")).distinct.length == nDocs)
    // quartile-contiguity: a window mixes quartiles only where a
    // quartile boundary falls mid-window — at most one interior
    // boundary per adjacent pair, ≤ 3 mixed windows total
    val byWin = packed.groupBy(_.getAs[Long]("seq_id"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("quartile")).distinct.sorted }
    val mixed = byWin.filter(_.length > 1)
    assert(mixed.size <= 3, s"too many mixed windows: ${mixed.size}")
    for (qs <- mixed)
      assert(qs.length == 2 && qs(1) == qs(0) + 1,
        s"a mixed window must straddle ONE adjacent boundary: $qs")
    // schedule order respected: within a quartile, window ids are
    // monotone in schedule position
    val byQ = packed.groupBy(_.getAs[Long]("quartile"))
    for ((q, rs) <- byQ) {
      val inOrder = rs.sortBy(_.getAs[Long]("ord")).map(_.getAs[Long]("seq_id"))
      assert(inOrder.zip(inOrder.drop(1)).forall { case (a, b) => a <= b },
        s"quartile $q windows must be monotone in schedule order")
    }
  }
}
