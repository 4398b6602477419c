package graft

import graft.queries.{AnnIndexStore, IvfAnn, LshAnn, MinHashDedup, PqAnn, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Dedup + similarity: MinHash-LSH must recover the exact-Jaccard
  * pairs; SimHash pairs must be truly close; LSH ANN must have
  * nontrivial recall vs brute-force kNN on planted near-dups. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val planted = {
    // 20 base docs from a 12-word vocab + near-dup copies of 5 of
    // them (one word changed) + 1 exact dup.
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rng = new scala.util.Random(7)
    val base = (0 until 20).map { i =>
      (i.toLong, Vector.fill(30)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val nearDups = (0 until 5).map { i =>
      val words = base(i)._2.split(" ").toVector.updated(3, "CHANGED")
      (100L + i, words.mkString(" "))
    }
    val exactDup = Seq((200L, base(7)._2))
    (base ++ nearDups ++ exactDup).toDF("doc_id", "text")
  }

  test("exact dedup groups the planted exact duplicate") {
    val groups = planted.groupBy(md5(col("text"))).agg(count(lit(1)).as("n"))
    assert(groups.filter(col("n") === 2).count() == 1)
  }

  test("minhash-LSH finds exactly the exact-Jaccard >= 0.5 pairs (planted)") {
    val got = MinHashDedup.nearDupPairs(planted, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // expected: 5 near-dup pairs + 1 exact-dup pair
    val expectedPairs = (0 until 5).map(i => (i.toLong, 100L + i)).toSet + ((7L, 200L))
    assert(got == expectedPairs)
  }

  test("containment dedup equals brute-force all-pairs containment") {
    graft.functions.GraftFunctions.register(spark)
    val got = TextOps.dedupContainment.fn(spark, sf)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // brute force over the same hashed shingle arrays: every ordered
    // pair, exact intersection, i/n1 >= 0.6 — the prefix-filtered
    // candidate path must lose nothing
    val hs = TextOps.hashedShingleArrays(
      graft.sources.Tables.documents(spark, sf))
    val bf = hs.as("x").crossJoin(hs.as("y"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .withColumn("i", expr("graft_sorted_intersect(x.hs, y.hs)"))
      .filter(col("i").cast("double") / col("x.n") >= 0.6)
      .select(col("x.doc_id"), col("y.doc_id")).as[(Long, Long)].collect().toSet
    assert(got == bf)
    assert(got.nonEmpty) // corpus has planted dups; empty would be vacuous
    // containment dominates Jaccard: every symmetric near-dup pair
    // (tau 0.5 < 0.6 check skipped; J >= 0.6 implies i/n1 >= 0.6)
    val jac = TextOps.dedupNear.fn(spark, sf)
      .filter(col("jaccard") >= 0.6)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(jac.forall(p => got.contains(p) || got.contains(p.swap)))
  }

  test("minhash-LSH matches exact shingle-Jaccard pairs on driver corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val exact = TextOps.dedupNear.fn(spark, sf)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val lsh = MinHashDedup.nearDupPairs(docs, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("simhash separates dups from random pairs; banding finds exact dup") {
    val sigs = MinHashDedup.simhashed(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(7L), sigs(200L)) == 0, "exact dup must have hamming 0")
    val dupDists = (0 until 5).map(i => hamming(sigs(i.toLong), sigs(100L + i)))
    val randomDists = for (i <- 0L until 20L; j <- i + 1 until 20L if j != i) yield hamming(sigs(i), sigs(j))
    assert(dupDists.max < randomDists.sum.toDouble / randomDists.size,
      s"dup dists $dupDists vs random mean ${randomDists.sum.toDouble / randomDists.size}")
    // chunk banding has a pigeonhole guarantee at hamming <= 3
    val banded = MinHashDedup.simhashPairs(planted, maxHamming = 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(banded.contains((7L, 200L)))
  }

  test("repeated direct dedup calls leak no persisted blocks once results are released") {
    // nearDupPairs/simhashPairs are the non-memoized public APIs: each
    // call unpersists its own intermediates (shingles, signatures) and
    // hands the caller ONE persisted result frame. Releasing that frame
    // must return executor storage to its prior state — repeated
    // invocations may not accumulate blocks for the session lifetime.
    MinHashDedup.nearDupPairs(planted, 0.5).unpersist(blocking = true)
    MinHashDedup.simhashPairs(planted).unpersist(blocking = true)
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      MinHashDedup.nearDupPairs(planted, 0.5).unpersist(blocking = true)
      MinHashDedup.simhashPairs(planted).unpersist(blocking = true)
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after == before, s"persisted RDD count grew $before -> $after across 3 repeated calls")
  }

  test("LSH ANN recovers planted near-dup vectors (recall >= 0.9)") {
    // 200 random 64-dim vectors + 20 near-dups (tiny perturbation):
    // the near-dup must appear among the ANN top-3 of its source.
    val rng = new scala.util.Random(11)
    val base = (0 until 200).map(i => (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat)))
    val dups = (0 until 20).map { i =>
      (1000L + i, base(i)._2.map(v => v + 0.01f * rng.nextGaussian().toFloat))
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val ann = LshAnn.annTopK(emb, k = 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val found = (0 until 20).count(i => ann.contains((i.toLong, 1000L + i)))
    assert(found >= 18, s"recall ${found / 20.0}")
  }

  test("IVF ANN recovers planted near-dup vectors (recall >= 0.9)") {
    // Same planted setup as the LSH ANN test: the near-dup must
    // appear among the IVF top-3 of its source. Queries are the
    // first 50 vec_ids, which cover the 20 planted sources.
    val rng = new scala.util.Random(11)
    val base = (0 until 200).map(i => (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat)))
    val dups = (0 until 20).map { i =>
      (1000L + i, base(i)._2.map(v => v + 0.01f * rng.nextGaussian().toFloat))
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val ann = IvfAnn.annTopK(emb, k = 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val found = (0 until 20).count(i => ann.contains((i.toLong, 1000L + i)))
    assert(found >= 18, s"recall ${found / 20.0}")
  }

  test("IVF ANN recall@3 vs brute-force kNN on driver corpus") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val exact = Similarity.knnSample.fn(spark, sf)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val ivf = IvfAnn.annTopK(emb, k = 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
    // structural validity: dense ranks, no self-matches
    val ann = IvfAnn.annTopK(emb, k = 3)
    assert(ann.filter(col("q_id") === col("c_id")).count() == 0)
  }

  test("IVF-PQ ANN recovers planted near-dup vectors (recall >= 0.9)") {
    // Same planted setup as the IVF/LSH tests: code-compressed ADC
    // scoring plus exact refine must still surface each planted
    // near-dup among its source's top-3.
    val rng = new scala.util.Random(11)
    val base = (0 until 200).map(i => (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat)))
    val dups = (0 until 20).map { i =>
      (1000L + i, base(i)._2.map(v => v + 0.01f * rng.nextGaussian().toFloat))
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val ann = PqAnn.annTopK(emb, k = 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val found = (0 until 20).count(i => ann.contains((i.toLong, 1000L + i)))
    assert(found >= 18, s"recall ${found / 20.0}")
  }

  test("IVF-PQ ANN recall@3 vs brute-force kNN on driver corpus") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val exact = Similarity.knnSample.fn(spark, sf)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val pq = PqAnn.annTopK(emb, k = 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(pq.contains).toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
    val ann = PqAnn.annTopK(emb, k = 3)
    assert(ann.filter(col("q_id") === col("c_id")).count() == 0)
    val ranks = ann.groupBy(col("q_id")).agg(max(col("rank")).as("mx"), count(lit(1)).as("n"))
    assert(ranks.filter(col("mx") =!= col("n")).count() == 0) // dense 1..n ranks
  }

  test("IVF ANN plan broadcasts the probe side and never goes cartesian") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val plan = IvfAnn.annTopK(emb).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("LSH ANN candidates on driver corpus are a valid subset with correct ranks") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val ann = LshAnn.annTopK(emb, k = 3)
    val ranks = ann.groupBy(col("q_id")).agg(max(col("rank")).as("mx"), count(lit(1)).as("n"))
    assert(ranks.filter(col("mx") =!= col("n")).count() == 0) // ranks 1..n dense
    assert(ann.filter(col("q_id") === col("c_id")).count() == 0)
  }

  test("incremental dedup equals the full pair list restricted to new docs") {
    // the batch-vs-index query must find EXACTLY the pairs of the full
    // corpus-wide PPJoin that touch a new doc (new ids are the highest,
    // so those are the d2 >= split pairs) — nothing extra, nothing lost
    val full = TextOps.dedupNear.fn(spark, sf)
      .select("d1", "d2", "n_shared", "jaccard").collect().toSet
    val maxId = graft.sources.Tables.documents(spark, sf)
      .agg(max(col("doc_id"))).head().getLong(0)
    val split = maxId * 9 / 10
    val expected = full.filter(_.getLong(1) >= split)
    val got = TextOps.dedupIncremental.fn(spark, sf)
      .select("d1", "d2", "n_shared", "jaccard").collect().toSet
    assert(got == expected,
      s"extra=${got -- expected} missing=${expected -- got}")
    assert(got.nonEmpty, "split produced no new-doc pairs — spec is vacuous")
  }

  test("persisted ANN index cold-reloads to bit-identical constants and answers") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("ann_idx_spec_").toString
    val store = new AnnIndexStore(root)
    val idx = PqAnn.buildIndex(emb)
    val v = store.register(spark, idx, "test_index")
    store.promote("test_index", v)
    // a FRESH store instance: everything comes off disk
    val reloaded = new AnnIndexStore(root).loadProduction(spark, "test_index").get
    assert(reloaded.cents.map(_.toSeq).toSeq == idx.cents.map(_.toSeq).toSeq)
    assert(reloaded.books.map(_.map(_.toSeq).toSeq).toSeq ==
      idx.books.map(_.map(_.toSeq).toSeq).toSeq)
    assert(reloaded.listMeans.map(_.toSeq).toSeq == idx.listMeans.map(_.toSeq).toSeq)
    val fresh = PqAnn.queryIndex(emb, idx).collect().toSeq
    val cold = PqAnn.queryIndex(emb, reloaded).collect().toSeq
    assert(cold == fresh)
    // probing the reloaded index prunes code partitions (inverted-list layout)
    val pruned = reloaded.codes.filter(col("list_id") === 3)
      .queryExecution.executedPlan.toString
    assert(pruned.contains("PartitionFilters: [isnotnull(list_id"), pruned)
    // versioned promotion semantics match the model registry
    val v2 = store.register(spark, idx, "test_index")
    assert(v2 == v + 1)
    assert(store.productionVersion("test_index").contains(v))
    store.promote("test_index", v2)
    assert(store.productionVersion("test_index").contains(v2))
  }

  test("ANN recall certificates emit TRUE booleans and exact-side facts") {
    // the oracle-gated certificate rows: recall boolean must hold and
    // the exact side must agree with the query it mirrors — the kNN
    // certs (sim_ann_ivf_cert / sim_ann_ivfpq_cert) against the
    // brute-force counts, the planted-twin cert (sim_ann_lsh_cert)
    // against its planted-pair facts
    for (q <- Seq(graft.queries.AnnCert.ivfCert, graft.queries.AnnCert.ivfpqCert)) {
      val row = q.fn(spark, sf).head()
      assert(row.getLong(0) == 50, s"${q.name}: n_queries ${row.getLong(0)}")
      assert(row.getLong(1) == 150, s"${q.name}: n_exact ${row.getLong(1)}")
      assert(row.getBoolean(3), s"${q.name}: recall bound failed")
    }
    val lsh = graft.queries.AnnCert.lshCert.fn(spark, sf).head()
    assert(lsh.getLong(0) == graft.queries.AnnCert.NumPlanted,
      s"sim_ann_lsh_cert: n_planted ${lsh.getLong(0)}")
    assert(lsh.getDouble(1) > 0.999, s"sim_ann_lsh_cert: mean cosine ${lsh.getDouble(1)}")
    assert(lsh.getBoolean(2), "sim_ann_lsh_cert: recall bound failed")
  }

  test("incremental index append: extended codes equal a one-shot encode of the union") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("ann_append_spec_").toString
    val store = new AnnIndexStore(root)
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val batch = emb.filter(col("vec_id") % 5 === 4)
    val v = store.register(spark, PqAnn.buildIndex(base), "append_index")
    store.promote("append_index", v)
    val v2 = store.appendBatch(spark, "append_index", batch)
    val ext = store.loadProduction(spark, "append_index").get
    // append published ATOMICALLY as a new promoted version: the base
    // version is still intact (a concurrent reader mid-append would
    // have seen it whole), and the pointer flipped to the extension
    assert(v2 == v + 1)
    assert(store.productionVersion("append_index").contains(v2))
    assert(store.versions("append_index") == Seq(v, v2))
    assert(store.load(spark, "append_index", v).codes.count() == base.count(),
      "base version mutated by the append")
    // bit-identical to encoding the full corpus with the same constants
    val oneshot = PqAnn.encodeWith(emb, ext.cents, ext.books, ext.listMeans)
    assert(ext.codes.exceptAll(oneshot).union(oneshot.exceptAll(ext.codes)).count() == 0)
    assert(ext.codes.count() == emb.count())
    // the appended batch is findable: certificate booleans hold at sf0.001
    val row = graft.queries.AnnIndexStore.appendCert.fn(spark, sf).head()
    assert(row.getBoolean(3), "recall bound failed on the extended index")
    assert(row.getBoolean(5), "append != one-shot encode")
    assert(row.getBoolean(6), "codes not 1:1 with vectors")
  }

  test("curation pipeline: decisions are consistent with their source queries and the pack") {
    val dec = TextOps.curation.fn(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    // exactly one decision per document
    assert(dec.length == docs.count())
    assert(dec.map(_.getAs[Long]("doc_id")).distinct.length == dec.length)
    val byReason = dec.groupBy(r => Option(r.getAs[String]("drop_reason")))
    // near_dup reason ids = exactly the d2 side of the shared pair list
    val nearIds = TextOps.dedupNear.fn(spark, sf)
      .select("d2").collect().map(_.getLong(0)).toSet
    val reasonNear = byReason.getOrElse(Some("near_dup"), Array.empty)
      .map(_.getAs[Long]("doc_id")).toSet
    // (minus docs already dropped as exact dups, which take priority)
    val exactIds = byReason.getOrElse(Some("exact_dup"), Array.empty)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(reasonNear == nearIds -- exactIds,
      s"extra=${reasonNear -- nearIds} missing=${(nearIds -- exactIds) -- reasonNear}")
    // contaminated reason ids = exactly the decontamination flags not
    // already dropped as a dup (dups take priority)
    val contamIds = TextOps.decontaminate.fn(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val reasonContam = byReason.getOrElse(Some("contaminated"), Array.empty)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(reasonContam == contamIds -- exactIds -- nearIds,
      s"extra=${reasonContam -- contamIds} " +
        s"missing=${(contamIds -- exactIds -- nearIds) -- reasonContam}")
    assert(reasonContam.nonEmpty, "no contaminated docs at this SF — spec is vacuous")
    // every kept doc passes every filter
    val kept = byReason.getOrElse(None, Array.empty)
    assert(kept.nonEmpty && kept.length < dec.length)
    assert(kept.forall(r => r.getAs[String]("pred_lang") == "en"
      && r.getAs[Double]("quality_score") >= 0.7
      && !nearIds.contains(r.getAs[Long]("doc_id"))
      && !contamIds.contains(r.getAs[Long]("doc_id"))))
    // the pack conserves the kept corpus: same docs, and the token
    // mass of the FINAL text (scrub + PII plant/redact applied) —
    // raw n_tokens would double-count what the line/span stages cut
    val pack = TextOps.curationPack.fn(spark, sf).collect()
    assert(pack.map(_.getAs[Long]("n_docs")).sum == kept.length)
    assert(pack.map(_.getAs[Long]("seq_tokens")).sum ==
      kept.map(_.getAs[Long]("final_tokens")).sum)
  }

  test("decontamination equals a brute-force string-gram computation") {
    // independent reference: real STRING 8-grams over the collected
    // corpus (no hashing, no Spark) — flags must match exactly
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[Seq[String]] =
      t.split(" ").toSeq.sliding(8).filter(_.size == 8).toSet
    val bench = docs.collect { case (id, t) if id % 4 == 3 => grams(t) }
      .foldLeft(Set.empty[Seq[String]])(_ ++ _)
    val expected = docs.collect { case (id, t) if id % 4 != 3 =>
      val g = grams(t)
      val hit = g.count(bench)
      (id, g.size.toLong, hit.toLong)
    }.filter { case (_, n, h) => n > 0 && h.toDouble / n >= 0.5 }.toSet
    val got = TextOps.decontaminate.fn(spark, sf)
      .select("doc_id", "n_grams", "n_hit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"extra=${got -- expected} missing=${expected -- got}")
    assert(got.nonEmpty, "no contaminated docs at this SF — spec is vacuous")
  }

  test("eval-set constructor screens the md5 test split against an independent gram check") {
    // independent reference: real STRING 8-grams, md5 split replayed
    // via java.security — the manifest's keep/drop decisions must
    // match a from-scratch computation exactly
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bucket(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      (((d(0) & 0xff) << 8 | (d(1) & 0xff)) % 100 + 100) % 100
    }
    def grams(t: String): Set[Seq[String]] =
      t.split(" ").toSeq.sliding(8).filter(_.size == 8).toSet
    val seen = docs.collect { case (id, t) if bucket(id) < 90 => grams(t) }
      .foldLeft(Set.empty[Seq[String]])(_ ++ _)
    val expected = docs.collect { case (id, t) if bucket(id) >= 90 =>
      val g = grams(t)
      val hit = g.count(seen)
      val overlap = if (g.isEmpty) 0.0 else hit.toDouble / g.size
      (id, g.size.toLong, hit.toLong, overlap < 0.2)
    }.toSet
    val got = TextOps.evalBuild.fn(spark, sf)
      .select("doc_id", "n_grams", "n_hit", "kept").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got == expected, s"extra=${got -- expected} missing=${expected -- got}")
    assert(got.exists(!_._4), "no dropped candidate at this SF — screen is vacuous")
    assert(got.exists(_._4), "no kept candidate at this SF")
  }

  test("streamed eval construction equals the batch manifest") {
    // the keep decision is a per-doc fact against the STATIC train
    // side, so the per-batch manifests must concatenate into exactly
    // the batch constructor's output
    val batch = TextOps.evalBuild.fn(spark, sf).collect().toSeq
    val streamed = graft.streaming.StreamingEvalBuild.evalWorld(spark, sf)
      .manifest.orderBy(col("doc_id")).collect().toSeq
    assert(streamed == batch)
  }

  test("retroactive release audit flags at least every shipped new-benchmark doc") {
    // a release doc that IS a val-split (new-benchmark) doc shares its
    // own grams by definition — the audit's hit set must cover every
    // retained val doc that carries an 8-gram, and affected windows
    // are bounded by the shipped total
    def bucket(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((d(0) & 0xff) << 8 | (d(1) & 0xff)) % 100
    }
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val retained = TextOps.curationDecisions(spark, sf)
      .filter(col("drop_reason").isNull).select("doc_id").as[Long].collect().toSet
    val expectedMin = docs.collect {
      case (id, t, src) if retained(id) && bucket(id) >= 80 && bucket(id) < 90 &&
        t.split(" ").length >= 8 => src
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = TextOps.releaseContamAudit.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    got.foreach { case (src, (tot, aff, hits)) =>
      assert(aff >= 0 && aff <= tot, s"$src: affected $aff outside [0, $tot]")
      assert(hits >= expectedMin.getOrElse(src, 0L),
        s"$src: $hits hits < ${expectedMin.getOrElse(src, 0L)} shipped benchmark docs")
    }
    assert(got.values.map(_._3).sum > 0, "audit is vacuous at this SF")
  }

  test("incremental decontamination equals the full pass restricted to new docs") {
    // the persisted-gram-index path over only the top-10% doc_ids must
    // flag exactly what the full corpus screen flags for those docs
    val split = graft.sources.Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.expr("max(doc_id) * 9 div 10"))
      .head().getLong(0)
    val full = TextOps.decontaminate.fn(spark, sf)
      .filter(col("doc_id") >= split)
      .select("doc_id", "n_grams", "n_hit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val incr = TextOps.decontaminateIncremental.fn(spark, sf)
      .select("doc_id", "n_grams", "n_hit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(incr == full, s"extra=${incr -- full} missing=${full -- incr}")
    // the index is a promoted artifact, not a per-run frame
    val store = TextOps.benchGramStore(spark, sf)
    assert(store.productionVersion("bench_grams").nonEmpty)
  }

  test("semantic dedup clusters are valid components with one min-id keeper each") {
    // sf0.01: the smallest SF whose pair graph has a >2 cluster, so
    // the transitivity assertion below is non-vacuous
    val rows = Similarity.semanticDedup.fn(spark, "/root/testdata/sf0.01")
      .select("vec_id", "label", "cluster_id", "cluster_size", "is_keeper").collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(2))
    byCluster.foreach { case (cid, members) =>
      // cluster_id is the min member id, marked as the one keeper
      assert(members.map(_.getLong(0)).min == cid)
      assert(members.count(_.getBoolean(4)) == 1)
      assert(members.find(_.getBoolean(4)).get.getLong(0) == cid)
      // every member entered through >= 1 pair, so no singletons
      assert(members.length >= 2)
      assert(members.forall(_.getLong(3) == members.length))
      // pairs never cross coarse buckets: a cluster has ONE label
      assert(members.map(_.getInt(1)).distinct.length == 1)
    }
    // spot-check transitivity did its job: some cluster exceeds a
    // single pair (a->b, b->c glued) at this SF
    assert(byCluster.values.exists(_.length > 2))
  }

  test("ANN forget becomes durable on disk once gc retires superseded versions") {
    import graft.queries.AnnIndexStore
    import org.apache.spark.sql.functions.col
    val store = new AnnIndexStore(
      java.nio.file.Files.createTempDirectory("graft-forget-gc-").toString)
    val idx = AnnIndexStore.forDir(spark, sf)
      .loadProduction(spark, AnnIndexStore.IndexName).get
    store.promote(AnnIndexStore.IndexName,
      store.register(spark, idx, AnnIndexStore.IndexName))
    store.deleteWhere(spark, AnnIndexStore.IndexName, col("vec_id") % 17 === 3)
    // grace window: the superseded version still holds the rows
    assert(store.versions(AnnIndexStore.IndexName) == Seq(1, 2))
    val dropped = store.gc(AnnIndexStore.IndexName, keep = 0)
    assert(dropped == Seq(1), s"gc dropped $dropped")
    // every surviving version's codes are clean of the cohort
    for (v <- store.versions(AnnIndexStore.IndexName)) {
      val codes = spark.read.parquet(store.codesDir(AnnIndexStore.IndexName, v))
      assert(codes.filter(col("vec_id") % 17 === 3).count() == 0, s"v$v leaks")
    }
  }

  test("line dedup removes a planted boilerplate line from every carrier doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, md5, lit}
    // one 4-token boilerplate line planted at a DIFFERENT aligned
    // offset in 3 docs; a 4th doc shares no line with anyone
    val boiler = "subscribe to our newsletter".split(" ")
    def doc(unique: Seq[String], at: Int): String =
      (unique.take(at * 4) ++ boiler ++ unique.drop(at * 4)).mkString(" ")
    val u = (0 until 16).map(i => s"u$i")
    val docs = Seq(
      (1L, doc(u.map("a" + _), 0), "en", "s1", 0L),
      (2L, doc(u.map("b" + _), 1), "en", "s1", 0L),
      (3L, doc(u.map("c" + _), 2), "en", "s1", 0L),
      (4L, u.map("d" + _).mkString(" "), "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val segs = graft.queries.TextOps.lineSegments(docs)
    val boilerSet = segs.groupBy(xxhash64(col("line")).as("fp"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= graft.queries.TextOps.LineMinDocs)
      .select(col("fp")).withColumn("is_boiler", lit(true))
    val out = graft.queries.TextOps.lineDedupReport(docs, boilerSet, nBoiler = 1L)
      .select($"doc_id", $"n_lines", $"n_boiler", $"n_tokens_kept", $"kept_fp")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // each carrier has 20 tokens = 5 lines, loses exactly the planted one
    for (id <- Seq(1L, 2L, 3L)) {
      val (_, nLines, nBoiler, kept, _) = out(id)
      assert(nLines == 5 && nBoiler == 1 && kept == 16, s"doc $id: $nLines $nBoiler $kept")
    }
    val (_, n4, b4, k4, _) = out(4L)
    assert(n4 == 4 && b4 == 0 && k4 == 16, s"clean doc: $n4 $b4 $k4")
    // retained text of doc 1 is its unique tokens exactly, in order
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(u.map("a" + _).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(1L)._5 == expect, "kept_fp must hash the reassembled retained text")
  }

  test("span dedup merges overlapping dup windows into maximal spans at any offset") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // an 8-token run shared at UNALIGNED offsets (3 vs 6) → its four
    // 5-token windows overlap into ONE maximal span of 8 positions;
    // two disjoint 5-token runs shared by docs 5/6 → two spans each
    val runA = "the quick brown fox jumps over the lazy".split(" ").toSeq
    val runB = "pack my box with liquor".split(" ").toSeq
    val runC = "waltz bad nymph for jugs".split(" ").toSeq
    def ids(p: String, n: Int): Seq[String] = (0 until n).map(i => s"$p$i")
    def mk(id: Long, toks: Seq[String]): (Long, String, String, String, Long) =
      (id, toks.mkString(" "), "en", "s1", 0L)
    val d1 = ids("a", 3) ++ runA ++ ids("a", 11).drop(3)
    val d2 = ids("b", 6) ++ runA ++ ids("b", 10).drop(6)
    val d3 = ids("c", 16)
    val d4 = Seq("x", "y", "z") // below SpanW: no shingles, untouched
    val d5 = ids("d", 2) ++ runB ++ ids("d", 5).drop(2) ++ runC ++ ids("d", 7).drop(5)
    val d6 = ids("e", 1) ++ runB ++ ids("e", 4).drop(1) ++ runC ++ ids("e", 8).drop(4)
    val docs = Seq(mk(1, d1), mk(2, d2), mk(3, d3), mk(4, d4), mk(5, d5), mk(6, d6))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dups = graft.queries.TextOps.spanStarts(docs)
      .groupBy(col("fp"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("fp")).withColumn("dup", lit(true))
    val out = graft.queries.TextOps.spanDedupReport(docs, dups, nDups = 6L)
      .select($"doc_id", $"n_tokens", $"n_removed", $"n_spans", $"kept_fp")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 8 && out(1L)._4 == 1, s"doc1: ${out(1L)}")
    assert(out(2L)._3 == 8 && out(2L)._4 == 1, s"doc2: ${out(2L)}")
    assert(out(3L)._3 == 0 && out(3L)._4 == 0, s"clean doc: ${out(3L)}")
    assert(out(4L)._2 == 3 && out(4L)._3 == 0, s"sub-window doc: ${out(4L)}")
    assert(out(5L)._3 == 10 && out(5L)._4 == 2, s"doc5: ${out(5L)}")
    assert(out(6L)._3 == 10 && out(6L)._4 == 2, s"doc6: ${out(6L)}")
    // retained text of doc 1 is exactly its unique tokens, in order
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(ids("a", 11).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(1L)._5 == expect, "kept_fp must hash the reassembled retained text")
  }

  test("distributed Lloyd recovers planted clusters; ties break to the lowest seed") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // 60 vectors in 3 orthogonal groups (vec_id mod 3), identical
    // within a group — every vector scores cosine 1.0 against every
    // same-group seed, so the assignment must take the LOWEST seed
    // id of its group (seeds are vec_id 0..7): exactly clusters
    // 0/1/2 survive with 20 members each, clusters 3..7 empty out
    // but keep their seed centroid.
    val dim = 64
    def vec(g: Int): Array[Double] = {
      val v = new Array[Double](dim)
      v(g) = 1.0; v(30 + g) = 0.01; v
    }
    val vv = (0 until 60).map(i => (i.toLong, vec(i % 3))).toDF("vec_id", "v")
    val cents = graft.queries.Kmeans.train(vv)
    val rep = graft.queries.Kmeans.report(spark, vv, cents)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(rep.values.map(_._2).sum == 60, "cluster sizes must partition the corpus")
    for (k <- 0L to 2L) {
      val (_, n, mc, cs) = rep(k)
      assert(n == 20 && mc == 20.0, s"cluster $k: n=$n sum_cos=$mc")
      // un-normalized centroid: 20 identical members -> 20*(1 + 0.01)
      assert(math.abs(cs - 20.2) < 1e-9, s"cluster $k centroid_sum=$cs")
    }
    for (k <- 3L to 7L) {
      val (_, n, _, cs) = rep(k)
      assert(n == 0, s"cluster $k should be empty, n=$n")
      assert(math.abs(cs - 1.01) < 1e-9, s"empty cluster keeps its seed, sum=$cs")
    }
  }

  test("SemDeDup keeps the first of each in-cluster dup group; blocking is per cluster") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dim = 64
    def vec(g: Int): Array[Double] = {
      val v = new Array[Double](dim)
      v(g) = 1.0; v(30 + g) = 0.01; v
    }
    // 30 vectors, identical within each of 3 clusters -> only the
    // lowest vec_id of each cluster survives; vec 100 duplicates
    // group 0 EXACTLY but sits in another cluster, so the blocking
    // key must protect it
    val assigned = ((0 until 30).map(i => (i.toLong, vec(i % 3), (i % 3).toLong)) :+
      ((100L, vec(0), 5L))).toDF("vec_id", "v", "cluster")
    val out = graft.queries.Kmeans.semDedupReport(assigned)
      .as[(Long, Long, Boolean)].collect()
    val kept = out.filter(_._3).map(_._1).toSet
    assert(kept == Set(0L, 1L, 2L, 100L), s"kept=$kept")
    assert(out.length == 31)
  }
}
