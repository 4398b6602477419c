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
}
