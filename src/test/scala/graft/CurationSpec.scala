package graft

import graft.queries.{Curation, DedupGraph}
import org.apache.spark.sql.functions._

/** Connected-components clustering + curation operators. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("connected components label a chain graph in O(log d) rounds") {
    // 0-1-2-...-9 chain (diameter 9: plain propagation would need 9
    // rounds; the hash-to-min star handoff must close it in far
    // fewer) plus a separate triangle and an isolated pair.
    val pairs = ((0L until 9L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L))).toDF("d1", "d2")
    val got = DedupGraph.connectedComponents(pairs, maxIters = 6)
      .as[(Long, Long)].collect().toMap
    val expected = (0L to 9L).map(_ -> 0L).toMap ++
      Map(20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L)
    assert(got == expected)
  }

  test("connected components refuse to return partial labels at the round bound") {
    // diameter-9 chain, 1 round — must fail loudly, not mislabel
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("d1", "d2")
    assertThrows[IllegalStateException] {
      DedupGraph.connectedComponents(pairs, maxIters = 1).collect()
    }
  }

  test("connected components on an empty pair list returns an empty frame") {
    // a clean corpus (no near-dup pairs) is a legal input at some SF
    // or after upstream filtering — must converge empty, not NPE on
    // the null decimal the convergence sum yields over zero rows
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(DedupGraph.connectedComponents(empty, maxIters = 3).count() == 0)
  }

  test("cluster assignment is transitively consistent with the pair list") {
    val clusters = DedupGraph.dedupClusters.fn(spark, sf)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    val pairs = graft.queries.TextOps.nearDupPairs05(spark, sf)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (d1, d2) =>
      assert(clusters(d1) == clusters(d2), s"pair ($d1,$d2) split across clusters")
    }
    // every cluster id is the min doc_id of its members
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
    }
  }

  test("temperature mix upweights small sources and hits the target size") {
    // 900 docs from a dominant source, 100 from a small one
    val docs = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val report = Curation.mixReport(docs, alpha = 0.5, targetFrac = 0.5)
      .select($"source", $"n_docs", $"keep_rate", $"n_kept")
      .as[(String, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    val (_, _, rBig, kBig) = report("big")
    val (_, _, rSmall, kSmall) = report("small")
    // alpha=0.5: weights prop sqrt(n); small source's raw rate
    // 500*(10/40)/100 = 1.25 clamps to keep-everything
    assert(rSmall == 1.0 && kSmall == 100L, s"small rate $rSmall kept $kSmall")
    assert(math.abs(rBig - 500.0 * (30.0 / 40.0) / 900.0) < 1e-6, s"big rate $rBig")
    // realized big-source sample ~ 375 expected (hash-uniform within ~20%)
    assert(math.abs(kBig - 375L) < 75, s"kept big $kBig")
  }

  test("alpha=1 mix is proportional (uniform keep rate across sources)") {
    val docs = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val rates = Curation.mixReport(docs, alpha = 1.0, targetFrac = 0.5)
      .select($"keep_rate").as[Double].collect().toSet
    assert(rates == Set(0.5))
  }

  test("split assignment is stable under corpus growth") {
    val full = Curation.splitAssign.fn(spark, sf)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    // recompute on a half corpus: surviving docs keep their split
    val half = graft.sources.Tables.documents(spark, sf).filter($"doc_id" % 2 === 0)
    val bucket = conv(substring(md5(concat(lit(""), $"doc_id".cast("string"))), 1, 4), 16, 10)
      .cast("int") % 100
    val halfSplits = half.select($"doc_id",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
      .as[(Long, String)].collect()
    halfSplits.foreach { case (id, s) => assert(full(id) == s) }
    // and the realized shares are near 80/10/10
    val n = full.size.toDouble
    val train = full.values.count(_ == "train") / n
    assert(train > 0.7 && train < 0.9, s"train share $train")
  }

  test("repetition score separates a looping doc from a diverse one") {
    val docs = Seq(
      (1L, Seq.fill(30)("spam ham eggs").mkString(" ")), // 3-word loop: few distinct shingles
      (2L, (1 to 90).map("w" + _).mkString(" "))         // all-distinct tokens
    ).toDF("doc_id", "text")
    val distinct = graft.queries.TextOps.hashedShingleArrays(docs)
      .select($"doc_id", $"n".as("n_distinct"))
    val got = Curation.repetitionReport(docs, distinct)
      .select($"doc_id", $"n_shingles", $"n_distinct", $"dup_ratio")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val (_, n1, d1, r1) = got(1L)
    val (_, n2, d2, r2) = got(2L)
    assert(n1 == 88L && d1 == 3L && r1 > 0.95, s"looping doc: $n1 $d1 $r1")
    assert(n2 == 88L && d2 == 88L && r2 == 0.0, s"diverse doc: $n2 $d2 $r2")
  }

  test("epoch mix emits floor(w) or floor(w)+1 replicas with expected mass per source") {
    val reps = Curation.epochMix.fn(spark, sf)
      .groupBy($"doc_id", $"source", $"weight")
      .agg(count(lit(1)).as("k"), max($"rep").as("max_rep"))
      .select($"source", $"weight".cast("double"), $"k", $"max_rep")
      .as[(String, Double, Long, Long)].collect()
    assert(reps.nonEmpty)
    reps.foreach { case (src, w, k, maxRep) =>
      assert(k == math.floor(w).toLong || k == math.floor(w).toLong + 1,
        s"$src w=$w emitted $k replicas")
      assert(maxRep == k - 1, "rep indices must be dense 0..k-1")
    }
    // integral weights replicate EXACTLY (no coin involved)
    reps.filter(r => r._2 == math.floor(r._2)).foreach { case (src, w, k, _) =>
      assert(k == w.toLong, s"$src integral w=$w must emit exactly $w")
    }
    // weight-0.5 sources lose docs entirely (k would be 0 → absent):
    // emitted doc count per such source must be strictly below the
    // source's corpus count
    val emitted = reps.groupBy(_._1).view.mapValues(_.size).toMap
    val corpus = graft.sources.Tables.documents(spark, sf)
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val halfSources = corpus.keys.filter(s =>
      "\\d+".r.findFirstIn(s).exists(_.toInt % 4 == 0))
    halfSources.foreach { s =>
      assert(emitted.getOrElse(s, 0) < corpus(s), s"$s at w=0.5 kept everything")
    }
  }

  test("chunk windows tile every document with stride 24 and cover the tail") {
    val chunks = graft.queries.TextOps.chunkWindows.fn(spark, sf)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"), max($"start_tok" + $"chunk_tokens").as("covered"),
        min($"start_tok").as("first"), max($"chunk_tokens").as("max_len"),
        min($"chunk_tokens").as("min_len"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val nTokens = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long")).as[(Long, Long)]
      .collect().toMap
    assert(chunks.length == nTokens.size, "every doc must yield at least one chunk")
    chunks.foreach { case (id, k, covered, first, maxLen, minLen) =>
      val n = nTokens(id)
      assert(first == 0L && covered == n, s"doc $id: tail not covered")
      assert(k == (n - 1) / 24 + 1, s"doc $id: wrong chunk count")
      assert(maxLen <= 32 && minLen >= 1, s"doc $id: window size out of bounds")
    }
  }

  test("lm score ranks a gibberish doc below average") {
    // uses the corpus unigram LM via the query itself: the lowest-
    // scoring docs must score strictly below the corpus mean, and
    // token counts must match the whitespace tokenization
    val scored = Curation.lmScore.fn(spark, sf)
      .select($"doc_id", $"n_tokens", $"avg_logp")
      .as[(Long, Long, Double)].collect()
    assert(scored.length > 0)
    val mean = scored.map(_._3).sum / scored.length
    assert(scored.map(_._3).min < mean)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    scored.foreach { case (id, n, _) => assert(docs(id) == n) }
  }

  test("bigram LM sees word order and counts bigrams per doc") {
    val scored = graft.queries.TextOps.bigramLm.fn(spark, sf)
      .select($"doc_id", $"n_bigrams", $"avg_logp")
      .as[(Long, Long, Double)].collect()
    assert(scored.nonEmpty)
    // every doc has exactly len-1 bigrams
    val lens = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    scored.foreach { case (id, nb, _) => assert(nb == lens(id) - 1, s"doc $id") }
    // conditional log-probs spread below their mean (order signal
    // exists: some docs chain high-probability bigrams, some don't)
    val mean = scored.map(_._3).sum / scored.length
    assert(scored.map(_._3).min < mean && scored.map(_._3).max > mean)
  }

  test("BPE trainer learns the textbook merge sequence on the Sennrich vocab") {
    // low:5 lower:2 newest:6 widest:3 — the worked example from
    // Sennrich et al. 2016: (e,s) then (es,t) then (l,o), with the
    // round-1 tie between (e,s) and (s,t) at count 9 broken
    // lexicographically
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val merges = graft.queries.TextOps.learnBpeMerges(spark, vocab, rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)),
      s"got $merges")
  }

  test("BPE encode: per-doc symbol counts sit between words and chars, and merges compress") {
    val enc = SparkEntry.queries("text_bpe_encode")(spark, sf)
      .select($"doc_id", $"n_tokens", $"n_bpe_tokens").as[(Long, Long, Long)]
      .collect().toSeq
    val chars = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", length(regexp_replace($"text", " ", "")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(enc.nonEmpty)
    enc.foreach { case (id, nTok, nBpe) =>
      // every word is ≥ 1 symbol; no merge crosses a word boundary
      assert(nBpe >= nTok, s"doc $id")
      assert(nBpe <= chars(id), s"doc $id")
    }
    // 16 learned merges actually compress the corpus below char level
    assert(enc.map(_._3).sum < enc.map(e => chars(e._1)).sum)
  }

  test("mix weight defaults a digitless source to 0.5 instead of dropping it") {
    // regexp_extract on a source with no digits yields '' → null int
    // in Spark (silent row loss) but a Conversion Error in DuckDB;
    // the coalesce pins both engines to suffix 0 ⇒ weight 0.5, so a
    // testdata naming change degrades loudly (hash mismatch) rather
    // than silently thinning the mix
    // weight 0.5 is a coin per doc, so a single doc may legitimately
    // emit nothing — assert over a population: without the coalesce
    // EVERY digitless doc has null weight and is dropped (emitted=0)
    val docs = ((1L to 50L).map(i => (i, s"tok$i a b", "en", "web", 8L)) :+
        (99L, "d e f", "en", "crawl7", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val emitted = Curation.mixFrame(docs)
      .select($"doc_id", $"source", $"weight".cast("double")).distinct()
      .as[(Long, String, Double)].collect()
    val web = emitted.filter(_._2 == "web")
    assert(web.nonEmpty && web.length < 50,
      s"digitless source must coin-sample at weight 0.5, emitted ${web.length}/50")
    assert(web.forall(_._3 == 0.5), "digitless source must default to weight 0.5")
    assert(emitted.filter(_._2 == "crawl7").forall(_._3 == 0.5 + 0.5 * (7 % 4)),
      "digit-bearing source weights unchanged")
  }

  test("pack forget propagates offset shifts within the affected shard only") {
    import spark.implicits._
    // two sources; forgetting b's middle doc must shift b's later
    // offsets (sequence membership changes), while a's manifest rows
    // survive byte-identical — the partition-pruned propagation the
    // text_pack_forget certificate rides. Weights: suffix 1 -> 1.0
    // (every doc emitted exactly once), so offsets are plain sums.
    def docs(ids: Seq[Long]) = ids.map { i =>
      (i, Seq.fill(300)("tok").mkString(" "), "en", if (i < 100) "src1" else "osrc1", 300L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val full = docs(Seq(1L, 2L, 3L, 101L, 102L))
    val reduced = full.filter($"doc_id" =!= 2L)
    val before = Curation.mixPackManifest(full).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    val after = Curation.mixPackManifest(reduced).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    // osrc1 (unaffected): identical sequences
    assert(before.filter(_._1._1 == "osrc1") == after.filter(_._1._1 == "osrc1"))
    // src1: doc 3 moved from offset 600 (seq 1) to 300 (seq 0) —
    // its shard's manifest is NOT the before-manifest minus doc 2
    assert(before(("src1", 1L)) == 300L && after(("src1", 0L)) == 600L)
    assert(!after.contains(("src1", 1L)))
  }

  test("curriculum: easy quartiles first, contiguous steps, anneal replays quartile 0 reshuffled") {
    val cur = Curation.curriculumOrder.fn(spark, sf)
      .select("ord", "phase", "doc_id", "quartile", "avg_logp").cache()
    try {
      val total = cur.count()
      val mm = cur.agg(min($"ord"), max($"ord")).head()
      assert(mm.getLong(0) == 1L && mm.getLong(1) == total,
        "ord must be a contiguous 1..N step numbering")
      assert(cur.select($"ord").distinct().count() == total)
      // phases are contiguous ord ranges in schedule order 0..4
      val ranges = cur.groupBy($"phase")
        .agg(min($"ord").as("lo"), max($"ord").as("hi"), count(lit(1)).as("c"))
        .orderBy($"phase").collect()
      assert(ranges.map(_.getLong(0)).toSeq == (0L to 4L).toSeq,
        "all five phases (4 quartiles + anneal) must be present")
      ranges.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) < b.getLong(1),
            s"phase ${a.getLong(0)} must complete before phase ${b.getLong(0)} starts")
        case _ => ()
      }
      // easy-first: the schedule's first quartile carries the most
      // probable text (strictly higher mean score than the last)
      val m = cur.filter($"phase" < 4).groupBy($"quartile")
        .agg(avg($"avg_logp")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(m(0L) > m(3L), s"quartile 0 must be easier than 3: $m")
      // anneal = the quartile-0 doc set under a FRESH order
      val q0 = cur.filter($"phase" === 0).orderBy($"ord")
        .select($"doc_id").as[Long].collect().toSeq
      val ann = cur.filter($"phase" === 4).orderBy($"ord")
        .select($"doc_id").as[Long].collect().toSeq
      assert(q0.toSet == ann.toSet, "anneal must replay exactly the quartile-0 docs")
      assert(q0 != ann, "anneal salt must genuinely reshuffle the replay")
    } finally { cur.unpersist(); () }
  }

  test("drift monitor: identical slices score PSI 0, a shifted slice is flagged") {
    // synthetic count frames: slice 1 matches the reference exactly,
    // slice 2 inverts the 90/10 split — Laplace smoothing keeps the
    // arithmetic total, PSI 0 means literally-identical distributions
    val counts = Seq(
      (0L, "len", "0", 90L), (0L, "len", "1", 10L),
      (1L, "len", "0", 90L), (1L, "len", "1", 10L),
      (2L, "len", "0", 10L), (2L, "len", "1", 90L)).toDF("slice", "feature", "bucket", "c")
    val rep = Curation.psiReport(spark, counts).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(rep(1L) == ((0.0, false)), "identical distribution must score PSI 0")
    assert(rep(2L)._1 > 0.2 && rep(2L)._2, "inverted distribution must flag drift")
  }

  test("streamed drift report equals the batch scan across slicings") {
    import graft.streaming.StreamingDrift
    val docs = graft.sources.Tables.documents(spark, sf)
    val batch = Curation.corpusDrift.fn(spark, sf).collect().toSeq
    assert(batch.nonEmpty)
    def streamed(slices: Int) =
      StreamingDrift.buildWorld(spark, sf, docs, slices)
        .report.orderBy($"slice", $"feature").collect().toSeq
    assert(streamed(2) == batch, "2-slice stream must reproduce the batch PSI report")
    assert(streamed(5) == batch, "5-slice stream must reproduce the batch PSI report")
  }

  test("media quarantine verdicts hold back a slice whose loudness shifted") {
    import graft.streaming.StreamingDrift
    // pure verdict arithmetic over planted frames: slice 2's peak PSI
    // breaches the bound on ONE feature — that alone must quarantine
    val counts = Seq((0L, "rms", "6", 100L), (1L, "rms", "6", 100L),
      (2L, "rms", "6", 100L)).toDF("slice", "feature", "bucket", "c")
    val report = Seq(
      (1L, "rms", 100L, 0.0, false), (1L, "peak", 100L, 0.0, false),
      (2L, "rms", 100L, 0.01, false), (2L, "peak", 100L, 0.35, true))
      .toDF("slice", "feature", "n_docs", "psi", "drifted")
    val v = StreamingDrift.verdicts(counts, report, Seq("rms", "peak"), "rms")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(4), r.getLong(5))).toMap
    assert(v(0L) == ((true, 100L)), "the reference slice promotes vacuously")
    assert(v(1L) == ((true, 100L)), "a stable slice promotes")
    assert(v(2L) == ((false, 0L)),
      "one breached feature must quarantine the whole slice")
  }

  test("drift quarantine holds back a planted drifted slice; clean slices promote") {
    import graft.streaming.StreamingDrift
    // 200 docs, uniform length; slices 0-2 alternate en/de, slice 3
    // is single-language -> its lang PSI blows past the 0.1 bound
    val docs = (0L until 200L).map { i =>
      val lang = if (i >= 150) "xx" else if (i % 2 == 0) "en" else "de"
      (i, Seq.fill(20)("tok").mkString(" "), lang, "src1", 120L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val w = StreamingDrift.buildWorld(spark, sf, docs, slices = 3)
    val v = StreamingDrift.verdicts(w.counts, w.report)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(4), r.getLong(1), r.getLong(5))).toMap
    assert(!v(3L)._1, "the single-language tail slice must be quarantined")
    assert(Seq(0L, 1L, 2L).forall(v(_)._1), "stable slices must promote")
    // the promoted artifact is exactly the clean slices' docs
    assert(w.cleanCount == 150L,
      s"clean corpus must hold slices 0-2 (150 docs), got ${w.cleanCount}")
    val staged = w.staged.count()
    assert(staged == 200L, s"staging must hold every arrival, got $staged")
  }

  test("composite curriculum: the quality signal genuinely moves the schedule") {
    // the composite rank must differ from the difficulty-only rank —
    // otherwise the quality term is decorative and the row is the
    // plain curriculum under a new salt
    val plain = graft.queries.Curation.curriculumSchedule(spark, sf)
      .filter(col("phase") < 4).select(col("doc_id"), col("quartile"))
    val comp = graft.queries.Curation.compositeSchedule(spark, sf)
      .filter(col("phase") < 4)
      .select(col("doc_id"), col("quartile").as("cq"))
    val moved = plain.join(comp, Seq("doc_id"))
      .filter(col("quartile") =!= col("cq")).count()
    assert(moved > 0,
      "no doc changed quartile under the quality-weighted composite — vacuous")
  }

  test("media cross-release baseline resolves through the promoted pointer") {
    // the value/verdict-flip semantics of psiVsBaseline are pinned by
    // the text promote-then-drift spec on the SHARED device; here pin
    // that the MEDIA world reads the pointer, not a captured frame:
    // re-promoting a new loudness baseline must resolve v2 and stamp
    // it on the re-driven report
    import graft.streaming.StreamingDrift
    import graft.queries.Curation
    val w = StreamingDrift.mediaBaselineWorld(spark, sf)
    assert(w.baseVersion == 1, s"first media baseline must be v1, got ${w.baseVersion}")
    assert(w.report.select(col("baseline_version")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    val docs = graft.sources.Tables.documents(spark, sf)
    val mid = Curation.releaseMid(spark, sf)
    w.env.store.promote(Curation.DriftBaselineName,
      w.env.store.register(spark, Curation.DriftBaselineName,
        graft.multimodal.Multimodal.mediaBaselineCounts(
          docs.filter(col("doc_id") >= mid))))
    val bv2 = w.env.store.productionVersion(Curation.DriftBaselineName).get
    assert(bv2 == 2, s"re-promotion must resolve v2, got $bv2")
    val rep2 = Curation.psiVsBaseline(w.newCounts,
      w.env.store.loadProduction(spark, Curation.DriftBaselineName).get,
      bv2, nsFeature = "rms")
    assert(rep2.select(col("baseline_version")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L),
      "the re-driven report must stamp the re-resolved version")
  }

  test("cross-release baseline: promote-then-drift — the monitor follows the PROMOTED pointer") {
    import graft.streaming.StreamingDrift
    def corpus(ids: Range, lang: Long => String) = ids.map { i =>
      (i.toLong, Seq.fill(20)("tok").mkString(" "), lang(i.toLong), "src1", 120L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    // release 1's crawl: alternating en/de; the NEW crawl matches it
    // on slices 0-2 but slice 3 (ids 250+) is single-language
    val base = corpus(0 until 100, i => if (i % 2 == 0) "en" else "de")
    val newc = corpus(100 until 300,
      i => if (i >= 250) "xx" else if (i % 2 == 0) "en" else "de")
    val w = StreamingDrift.buildBaselineWorld(spark, sf, base, newc, slices = 3)
    assert(w.baseVersion == 1, s"first promoted baseline must be v1, got ${w.baseVersion}")
    assert(w.report.select(col("baseline_version")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L), "report rows must carry the resolved version")
    val v1 = StreamingDrift.verdicts(w.newCounts, w.report)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(!v1(3L), "the off-baseline tail slice must be quarantined under v1")
    assert(Seq(0L, 1L, 2L).forall(v1(_)), "baseline-matching slices must promote")
    assert(w.cleanCount == 150L,
      s"clean corpus must hold slices 0-2 (150 docs), got ${w.cleanCount}")
    // release 2 ships the single-language crawl as ITS baseline: the
    // SAME drained counts re-judged through the re-resolved pointer
    // must flip — slice 3 now matches the release, slices 0-2 drift.
    // No monitor code changes; only the promoted artifact moved.
    val base2 = corpus(0 until 100, _ => "xx")
    w.env.store.promote(graft.queries.Curation.DriftBaselineName,
      w.env.store.register(spark, graft.queries.Curation.DriftBaselineName,
        graft.queries.Curation.baselineCounts(base2)))
    val (bv2, rep2) = StreamingDrift.baselineReport(spark, w.env, w.newCounts)
    assert(bv2 == 2, s"re-promotion must resolve v2, got $bv2")
    assert(rep2.select(col("baseline_version")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    val v2 = StreamingDrift.verdicts(w.newCounts, rep2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(v2(3L), "under the v2 baseline the single-language slice must promote")
    assert(Seq(0L, 1L, 2L).forall(!v2(_)),
      "under the v2 baseline the en/de slices must be held back")
  }

  test("rank device: a planted score ATOM splits across tie-range tasks, rank stays exact") {
    import spark.implicits._
    // one score value holds 50% of the corpus (the integer-difficulty
    // hazard); the rest spread over distinct scores. The two-level
    // (bucket, band) cut puts the whole atom in ONE range band — the
    // third-level tie cut must split it across tasks WITHOUT moving a
    // single rank.
    val n = 1000
    val rows = (0 until n).map { i =>
      val score = if (i % 2 == 0) 0.5 else 0.9 + (i % 97) * 0.001
      (i.toLong, score)
    }
    val df = rows.toDF("doc_id", "score")
    val ranked = Curation.difficultyQuartiles(df,
      scaled = col("score") * 8,
      inBucketOrder = Seq(col("score"), col("doc_id")),
      bucketAscending = true, tieKey = col("doc_id"), keepBands = true)
    val got = ranked.select(col("doc_id"), col("quartile"),
      col("bucket"), col("qr_band"), col("qr_tie")).collect()
    // exactness: quartile == the global-rank quartile of (score, doc_id)
    val expected = rows.sortBy { case (d, s) => (s, d) }.zipWithIndex
      .map { case ((d, _), r) => d -> (r.toLong * 4) / n }.toMap
    got.foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0)),
        s"doc ${r.getLong(0)}: quartile ${r.getLong(1)} != ${expected(r.getLong(0))}")
    }
    // task-splitting: the atom's 500 rows must span several qr_tie
    // groups and no single (bucket, band, tie) task may hold them all
    val atomTasks = got.filter(r => expectedScore(r.getLong(0)))
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).distinct
    assert(atomTasks.length >= 8,
      s"atom spans only ${atomTasks.length} tasks: ${atomTasks.mkString(",")}")
    val maxTask = got.groupBy(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
      .values.map(_.length).max
    assert(maxTask <= n / 8,
      s"one rank task holds $maxTask of $n rows — the atom did not split")
  }

  private def expectedScore(docId: Long): Boolean = docId % 2 == 0
}
