package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ approximate nearest neighbors — the memory-scale path of
  * the ANN family ([[Similarity]] brute force → [[LshAnn]] /
  * [[IvfAnn]] candidate pruning → this: candidate pruning AND vector
  * compression).
  *
  * Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", §II-III, IVFADC in §IV): split each
  * unit-normalized vector into `M` subvectors, vector-quantize each
  * subspace against its own `K`-entry codebook, and keep only the `M`
  * code bytes per vector. At the 100 TB design point this is THE
  * reason the index fits: 64-dim float vectors are 256 B; PQ codes
  * are `M` = 16 B — a 16× compression — and ADC scoring never
  * touches the original vectors.
  *
  * Pipeline (all driver-trained constants enter plans as `typedLit`):
  *
  *  1. TRAIN per-subspace RESIDUAL codebooks (IVFADC, §IV-B: quantize
  *     `x̂ − ĉ(list)`, which is near-zero-mean and far lower-variance
  *     than raw vectors) with Lloyd iterations on the same bounded
  *     sample contract as [[IvfAnn.trainCentroids]] (KB-sized, never
  *     corpus-scale).
  *  2. ENCODE every corpus vector's residual: per subspace, an argmin
  *     over `K` inline `-2·dot + ‖c‖²` keys (L2 argmin on the
  *     subvector; the row-constant term cancels) — pure codegen map
  *     stage via the native fused [[graft.functions.DotProduct]], no
  *     shuffle.
  *  3. PROBE/ADC: candidates come from the SAME coarse IVF lists as
  *     [[IvfAnn]] (equi-join on `list_id`, never O(n²)); per probed
  *     list the query carries its `M`×`K` asymmetric-distance table
  *     (query subspace dots against every residual-codebook entry —
  *     dot similarity decomposes linearly over the residual, so the
  *     table is query-constant) plus the scalar `dot(q̂, ĉ_list)`
  *     bias, and scores a candidate by summing `M` table lookups over
  *     the code array — the vectors themselves are not needed:
  *     `approx = dot(q̂, ĉ) + Σ_m dot(q̂_m, c_m[code_m]) ≈ dot(q̂, x̂)`.
  *  4. REFINE: exact-cosine re-rank of the top `k`·`RefineFactor` ADC
  *     survivors per query (FAISS's IVFPQ+refine shape) — the only
  *     stage that touches full vectors, on a candidate set ~queries×
  *     `k`·`RefineFactor` rows.
  *
  * Rows-only in the driver harness (two k-means stages are not
  * DuckDB-oracle material); recall vs brute-force kNN is asserted in
  * ScalaTest, alongside a bit-exactness spec for the ADC lookup sum.
  */
object PqAnn {

  val M            = 16  // subspaces (subDim = dim/M = 4 on the 64-d corpus)
  val K            = 16  // codebook entries per subspace
  val LloydIters   = 2
  val RefineFactor = 16
  /** Same deterministic bounded-sample contract as [[IvfAnn]]. */
  val TrainSample  = 4096L

  // ---------------------------------------------------------------- train

  private def l2Local(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** One Lloyd iteration (L2) over an in-memory subvector sample. */
  private def lloydLocal(sample: Array[Array[Double]],
                         cents: Array[Array[Double]]): Array[Array[Double]] = {
    val dim  = cents.head.length
    val sums = Array.fill(cents.length)(new Array[Double](dim))
    val cnts = new Array[Long](cents.length)
    sample.foreach { v =>
      var best = 0; var bestD = Double.PositiveInfinity; var c = 0
      while (c < cents.length) {
        val d = l2Local(v, cents(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      var i = 0
      while (i < dim) { sums(best)(i) += v(i); i += 1 }
      cnts(best) += 1
    }
    cents.indices.map { c =>
      if (cnts(c) == 0) cents(c) else sums(c).map(_ / cnts(c))
    }.toArray
  }

  private def normLocal(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Residual PQ training (IVFADC proper, Jégou et al. §IV-B): each
    * sample vector is unit-normalized and assigned to its coarse
    * list; the residual center of a list is the MEAN of its
    * normalized members (NOT the unit-normalized coarse centroid —
    * on a near-orthogonal corpus that direction vector is ~1 away
    * from every member and residuals would be as large as the
    * vectors themselves). The residuals `x̂ − mean(list)` feed `M`
    * independent per-subspace k-means runs; they are near-zero-mean
    * with the within-list variance only, which is what lets `K`
    * entries quantize them finely.
    *
    * Returns (`codebooks(m)(j)` = centroid j of subspace m,
    * `listMeans(l)` = residual center of coarse list l). */
  def trainCodebooks(emb: DataFrame, cents: Array[Array[Double]])
      : (Array[Array[Array[Double]]], Array[Array[Double]]) = {
    val centsN = cents.map(normLocal)
    val normed = emb.filter(col("vec_id") < TrainSample)
      .select(col("vec_id"), col("embedding")).orderBy(col("vec_id")).collect()
      .map(r => normLocal(r.getSeq[Float](1).toArray.map(_.toDouble)))
    val dim = normed.head.length
    val assigned = normed.map { v =>
      var best = 0; var bestCos = Double.NegativeInfinity; var c = 0
      while (c < centsN.length) {
        var dot = 0.0; var i = 0
        while (i < dim) { dot += v(i) * centsN(c)(i); i += 1 }
        if (dot > bestCos) { bestCos = dot; best = c }
        c += 1
      }
      (best, v)
    }
    val listMeans = Array.tabulate(cents.length) { l =>
      val members = assigned.collect { case (`l`, v) => v }
      if (members.isEmpty) centsN(l)
      else Array.tabulate(dim)(i => members.map(_(i)).sum / members.length)
    }
    val residuals = assigned.map { case (l, v) =>
      Array.tabulate(dim)(i => v(i) - listMeans(l)(i))
    }
    val subDim = dim / M
    val books = Array.tabulate(M) { m =>
      val sub   = residuals.map(_.slice(m * subDim, (m + 1) * subDim))
      val seeds = sub.take(K)
      (1 to LloydIters).foldLeft(seeds)((c, _) => lloydLocal(sub, c))
    }
    (books, listMeans)
  }

  // ---------------------------------------------------------------- plan

  /** Unit-normalize the float embedding into `array<double>` (row
    * map; on unit vectors dot ≡ cosine so ADC sums approximate
    * cosine directly). */
  private def normalized(e: Column): Column =
    transform(e, x => x.cast("double") / sqrt(call_function("graft_dot", e, e)))

  /** PQ code array (`array<int>`, length `M`) for a normalized
    * vector column: per subspace, argmin over the `K` codebook
    * entries of `‖c‖² − 2·dot(x_m, c)` (the L2 key with the row
    * constant dropped). Same `array_sort(array(struct(...)))` argmin
    * idiom as [[IvfAnn.bestLists]]; `col1`/`col2` are the coerced
    * positional struct names. */
  private def encodeCol(ne: Column, books: Array[Array[Array[Double]]]): Column = {
    val subDim = books.head.head.length
    array(books.zipWithIndex.toIndexedSeq.map { case (book, m) =>
      val sub = slice(ne, m * subDim + 1, subDim)
      val keyed = array(book.zipWithIndex.toIndexedSeq.map { case (c, j) =>
        val cNorm2 = c.map(x => x * x).sum
        struct(lit(cNorm2) - lit(2.0) * call_function("graft_dot", sub, typedLit(c)),
          lit(j))
      }: _*)
      element_at(array_sort(keyed), 1).getField("col2")
    }: _*)
  }

  /** The query-side ADC table (`array<array<double>>`, `M`×`K`):
    * subspace dots of the normalized query against every codebook
    * entry. */
  private def adcTable(qe: Column, books: Array[Array[Array[Double]]]): Column = {
    val subDim = books.head.head.length
    array(books.zipWithIndex.toIndexedSeq.map { case (book, m) =>
      val sub = slice(qe, m * subDim + 1, subDim)
      array(book.toIndexedSeq.map(c =>
        call_function("graft_dot", sub, typedLit(c))): _*)
    }: _*)
  }

  /** Approximate dot from codes + table: Σ_m table(m)(code_m). The
    * HOF runs over `M` elements only — the per-candidate work is `M`
    * array lookups, independent of vector dimension. */
  private def adcScore(codes: Column, table: Column): Column =
    aggregate(zip_with(codes, table, (c, t) => element_at(t, c + lit(1))),
      lit(0.0), (acc, x) => acc + x)

  /** The trained + encoded IVF-PQ index: the driver-side constants
    * (coarse centroids, residual codebooks, per-list residual means —
    * KBs) plus the corpus-scale `codes` frame `(vec_id, list_id,
    * codes: array<int>)` — `M` bytes of payload per vector. This is
    * the artifact [[AnnIndexStore]] persists and reloads; scoring
    * never needs the original vectors except in the final refine. */
  final case class PqIndex(
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      listMeans: Array[Array[Double]],
      codes: DataFrame)

  /** ENCODE a vector frame against FIXED index constants — the
    * insert path: arriving vectors get coarse-assigned and
    * residual-PQ-coded with the production codebooks, no retraining.
    * Deterministic in the constants, so
    * `encodeWith(base) ∪ encodeWith(batch) ≡ encodeWith(base ∪ batch)`
    * bit-exactly — the invariant that makes incremental index append
    * sound (pinned by `sim_ann_index_append`). */
  def encodeWith(emb: DataFrame, cents: Array[Array[Double]],
                 books: Array[Array[Array[Double]]],
                 listMeans: Array[Array[Double]]): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val meansLit = typedLit(listMeans) // array<array<double>> literal
    // Corpus side: coarse list + RESIDUAL PQ codes; the full
    // embedding stays behind for the refine join only. The normalized
    // vector and the residual are BOUND AS COLUMNS before the 256
    // inline argmin keys reference them — inlined, each of the M·K
    // key expressions would re-evaluate the interpreted `transform`
    // normalization per row (measured 15 s → 0.5 s at sf0.1).
    // NOTE: deliberately no fanOut/repartition here. The encode runs
    // serially on a 1-split local input, but inserting an Exchange
    // between the scan and these projections undoes the column
    // binding below — measured 1.5 → 62 CPU-s at sf0.1 (the same
    // 30-40× re-evaluation the binding exists to prevent). At scale
    // the input arrives as many splits and the map parallelizes with
    // no exchange at all, which is the shape this method is built for.
    emb
      .select(col("vec_id"), col("embedding"),
        IvfAnn.assignColPublic(col("embedding"), cents).as("list_id"))
      .withColumn("res", zip_with(normalized(col("embedding")),
        element_at(meansLit, col("list_id") + lit(1)),
        (a, b) => a - b))
      .select(col("vec_id"), col("list_id"),
        encodeCol(col("res"), books).as("codes"))
  }

  /** TRAIN + ENCODE: the index-build half of [[annTopK]]. */
  def buildIndex(emb: DataFrame): PqIndex = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val cents = IvfAnn.trainCentroids(emb)
    val (books, listMeans) = trainCodebooks(emb, cents)
    PqIndex(cents, books, listMeans, encodeWith(emb, cents, books, listMeans))
  }

  /** PROBE + ADC + REFINE: answer top-k from an existing index (built
    * in-session or reloaded from [[AnnIndexStore]]); `emb` supplies
    * the query vectors and the exact-refine join. */
  def queryIndex(emb: DataFrame, idx: PqIndex, k: Int = 3, numQueries: Int = 50,
                 nProbe: Int = IvfAnn.NProbe): DataFrame =
    queryIndexFrom(
      emb.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("q_id"), col("embedding")),
      emb, idx, k, nProbe)

  /** [[queryIndex]] for an EXPLICIT query frame `(q_id, embedding)` —
    * the serving shape: queries arrive from anywhere (a stream, an
    * API batch), the corpus supplies the exact-refine vectors. */
  def queryIndexFrom(queryVecs: DataFrame, emb: DataFrame, idx: PqIndex,
                     k: Int = 3, nProbe: Int = IvfAnn.NProbe): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val PqIndex(cents, books, listMeans, indexed) = idx
    val meansLit = typedLit(listMeans)

    // Query side: NProbe coarse lists. Dot similarity decomposes
    // LINEARLY over the residual (unlike the L2 form, where the table
    // is built from q−ĉ):
    //   dot(q̂, x̂) = dot(q̂, ĉ_list) + dot(q̂, r_x)
    // so the ADC table is the UNSHIFTED query against the residual
    // codebooks — one table per query — and only the scalar
    // `dot(q̂, ĉ_list)` bias varies per probed list.
    val probes = queryVecs
      .select(col("q_id"), col("embedding"),
        explode(IvfAnn.probeListsPublic(col("embedding"), cents, nProbe)).as("p_list"))
      .withColumn("qe", normalized(col("embedding"))) // bound once, see build side
      .select(col("q_id"), col("p_list"),
        adcTable(col("qe"), books).as("qtab"),
        call_function("graft_dot", col("qe"),
          element_at(meansLit, col("p_list") + lit(1))).as("bias"))

    // ADC pass: equi-join on the coarse list, score = M table lookups
    // + the list bias per candidate — no full vectors flow through
    // this join.
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("approx").desc, col("c_id"))
    val shortlist = indexed
      .join(broadcast(probes),
        col("list_id") === col("p_list") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        (col("bias") + adcScore(col("codes"), col("qtab"))).as("approx"))
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= k * RefineFactor)
      .select(col("q_id"), col("c_id"))

    // Refine: exact cosine on the shortlist only (~queries·k·Refine
    // rows join back to the vector table on its key).
    val queries = queryVecs.select(col("q_id"), col("embedding").as("qe"))
    val wX = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    shortlist
      .join(emb.select(col("vec_id").as("c_id"), col("embedding")), "c_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("c_id"),
        round(expr("graft_cosine(embedding, qe)"), 6).as("cosine"))
      .withColumn("rank", row_number().over(wX).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF-PQ ANN top-k for the first `numQueries` vectors (self
    * excluded): coarse-list candidates → ADC scoring on codes →
    * exact-cosine refine of the top `k`·`RefineFactor`. Output shape
    * matches [[Similarity.knnSample]] / [[IvfAnn.annTopK]]. */
  def annTopK(emb: DataFrame, k: Int = 3, numQueries: Int = 50,
              nProbe: Int = IvfAnn.NProbe): DataFrame =
    queryIndex(emb, buildIndex(emb), k, numQueries, nProbe)

  /** The session's index over the driver corpus, built once per
    * (application, sf dir) with the codes frame persisted: the query,
    * its recall certificate, and the persistence roundtrip all score
    * against the SAME artifact — and a corpus is encoded once per
    * session, the way a pipeline would land the codes as a table. */
  private val idxCache =
    graft.SessionCaches.register(scala.collection.concurrent.TrieMap.empty[String, PqIndex])

  private[queries] def cachedIndex(s: org.apache.spark.sql.SparkSession,
                                   dir: String): PqIndex =
    idxCache.getOrElseUpdate(s.sparkContext.applicationId + "#" + dir, {
      val i = buildIndex(Tables.embeddings(s, dir))
      i.copy(codes = i.codes.persist())
    })

  /** IVF-PQ ANN over the driver corpus — rows-only in the driver
    * harness; recall certified by `sim_ann_ivfpq_cert` and pinned by
    * ScalaTest. */
  val annQuery: Q = Q.noOracle("sim_ann_ivfpq") { (s, dir) =>
    queryIndex(Tables.embeddings(s, dir), cachedIndex(s, dir))
  }

  val all: Seq[Q] = Seq(annQuery)
}
