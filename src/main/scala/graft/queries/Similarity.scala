package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors) — the ANN surface of a training-data pipeline.
  *
  * Pair-path vector math is the native codegen'd [[graft.functions.CosineSim]]
  * expression (`graft_cosine`); the HOF form ([[dotd]]) survives only
  * on per-row once paths (norms in [[embeddingStats]]) where its
  * boxing cost is off the hot loop. No UDFs, no driver-side collect.
  * Shapes:
  *
  *  - query-vs-corpus top-k: 1-row broadcast against a partitioned
  *    scan; at 100 TB this is the brute-force baseline that scales
  *    linearly with executors.
  *  - batched kNN: broadcast the (small) query set, stream the
  *    corpus, per-query top-k via window — the canonical
  *    brute-force-kNN-on-Spark plan.
  *  - LSH ANN ([[LshAnn]]): random-hyperplane sign buckets → bucket
  *    join → exact re-rank inside buckets. The scale path: candidate
  *    generation is a hash-partitioned equi-join instead of a cross
  *    join.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision (floats upcast element-wise). */
  def dotd(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def normSq(a: Column): Column = dotd(a, a)

  def cosine(dot: Column, nsqA: Column, nsqB: Column): Column =
    dot / (sqrt(nsqA) * sqrt(nsqB))

  private def r6(c: Column): Column = round(c, 6)


  // ---------------------------------------------------------------- top-k
  /** Brute-force cosine top-20 against the vec_id=0 query vector. */
  val topKQuery: Q = Q("sim_topk_query",
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |z AS (SELECT e.vec_id, unnest(e.embedding) AS a, unnest(q.qe) AS b FROM embeddings e, q),
      |d AS (SELECT vec_id, SUM(CAST(a AS DOUBLE)*CAST(b AS DOUBLE)) AS dot,
      |             SUM(CAST(a AS DOUBLE)*CAST(a AS DOUBLE)) AS na,
      |             SUM(CAST(b AS DOUBLE)*CAST(b AS DOUBLE)) AS nb
      |      FROM z GROUP BY 1)
      |SELECT vec_id, ROUND(dot/(sqrt(na)*sqrt(nb)), 6) AS cosine
      |FROM d ORDER BY ROUND(dot/(sqrt(na)*sqrt(nb)), 6) DESC, vec_id LIMIT 20""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    emb.crossJoin(broadcast(q))
      .select(col("vec_id"), r6(expr("graft_cosine(embedding, qe)")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(20)
  }

  // ---------------------------------------------------------------- kNN
  /** Batched brute-force kNN: 50 query vectors × full corpus, top-3
    * neighbors each (self excluded). */
  val knnSample: Q = Q("sim_knn_sample",
    """WITH n AS (SELECT vec_id, SUM(CAST(a AS DOUBLE)*CAST(a AS DOUBLE)) AS nsq
      |           FROM (SELECT vec_id, unnest(embedding) AS a FROM embeddings) GROUP BY 1),
      |z AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
      |             unnest(q.embedding) AS a, unnest(c.embedding) AS b
      |      FROM embeddings q JOIN embeddings c ON q.vec_id < 50 AND q.vec_id <> c.vec_id),
      |dots AS (SELECT q_id, c_id, SUM(CAST(a AS DOUBLE)*CAST(b AS DOUBLE)) AS dot FROM z GROUP BY 1, 2),
      |cos AS (SELECT q_id, c_id,
      |          ROUND(dot/(sqrt(nq.nsq)*sqrt(nc.nsq)), 6) AS cosine
      |        FROM dots JOIN n nq ON q_id = nq.vec_id JOIN n nc ON c_id = nc.vec_id),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank FROM cos)
      |SELECT q_id, c_id, cosine, rank FROM rk WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    emb.join(broadcast(queries), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        r6(expr("graft_cosine(embedding, qe)")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------- pair mining
  /** Most-similar pairs inside each label partition: equi-join on
    * label (hash-partitioned, no cross join), top-3 pairs per label. */
  val labelTopPairs: Q = Q("sim_label_top_pairs",
    """WITH n AS (SELECT vec_id, label, SUM(CAST(a AS DOUBLE)*CAST(a AS DOUBLE)) AS nsq
      |           FROM (SELECT vec_id, label, unnest(embedding) AS a FROM embeddings) GROUP BY 1, 2),
      |z AS (SELECT x.label AS label, x.vec_id AS v1, y.vec_id AS v2,
      |             unnest(x.embedding) AS a, unnest(y.embedding) AS b
      |      FROM embeddings x JOIN embeddings y ON x.label = y.label AND x.vec_id < y.vec_id),
      |dots AS (SELECT label, v1, v2, SUM(CAST(a AS DOUBLE)*CAST(b AS DOUBLE)) AS dot FROM z GROUP BY 1, 2, 3),
      |cos AS (SELECT dots.label, v1, v2,
      |          ROUND(dot/(sqrt(nx.nsq)*sqrt(ny.nsq)), 6) AS cosine
      |        FROM dots JOIN n nx ON v1 = nx.vec_id JOIN n ny ON v2 = ny.vec_id),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY label ORDER BY cosine DESC, v1, v2) AS rank FROM cos)
      |SELECT label, v1, v2, cosine, rank FROM rk WHERE rank <= 3 ORDER BY label, rank""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    val x = emb.select(col("label"), col("vec_id").as("v1"), col("embedding").as("e1"))
    val y = emb.select(col("label").as("label_y"), col("vec_id").as("v2"),
      col("embedding").as("e2"))
    val w = Window.partitionBy(col("label")).orderBy(col("cosine").desc, col("v1"), col("v2"))
    x.join(y, col("label") === col("label_y") && col("v1") < col("v2"))
      .select(col("label"), col("v1"), col("v2"),
        r6(expr("graft_cosine(e1, e2)")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy(col("label"), col("rank"))
  }

  // ---------------------------------------------------------------- stats
  /** Per-label corpus stats: count + mean L2 norm. */
  val embeddingStats: Q = Q("sim_embedding_stats",
    """WITH n AS (SELECT vec_id, label, sqrt(SUM(CAST(a AS DOUBLE)*CAST(a AS DOUBLE))) AS nrm
      |           FROM (SELECT vec_id, label, unnest(embedding) AS a FROM embeddings) GROUP BY 1, 2)
      |SELECT label, COUNT(*) AS n_vectors, ROUND(AVG(nrm), 6) AS avg_norm
      |FROM n GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("label"), sqrt(normSq(col("embedding"))).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"), r6(avg(col("nrm"))).as("avg_norm"))
      .orderBy(col("label"))
  }

  /** Same-label `(v1 < v2, cos_raw)` candidate pairs above
    * `threshold` — the label partition is the coarse-quantizer prune
    * (candidates never cross buckets, so the join is an equi-join on
    * label, not a cross join); shared by the pair listing and the
    * semantic-dedup clustering. */
  private def labelPairsAbove(emb: DataFrame, threshold: Double): DataFrame = {
    val x = emb.select(col("label"), col("vec_id").as("v1"), col("embedding").as("e1"))
    val y = emb.select(col("label").as("label_y"), col("vec_id").as("v2"),
      col("embedding").as("e2"))
    x.join(y, col("label") === col("label_y") && col("v1") < col("v2"))
      .withColumn("cos_raw", expr("graft_cosine(e1, e2)"))
      .filter(col("cos_raw") >= threshold)
  }

  /** Embedding-cosine near-dup pairs above a threshold, domain-pruned
    * to same-label candidates (the label partition is the IVF-style
    * coarse quantizer here; [[LshAnn]] is the unlabeled-data path). */
  val labelNearDups: Q = Q("sim_label_neardup",
    """WITH n AS (SELECT vec_id, label, SUM(CAST(a AS DOUBLE)*CAST(a AS DOUBLE)) AS nsq
      |           FROM (SELECT vec_id, label, unnest(embedding) AS a FROM embeddings) GROUP BY 1, 2),
      |z AS (SELECT x.label AS label, x.vec_id AS v1, y.vec_id AS v2,
      |             unnest(x.embedding) AS a, unnest(y.embedding) AS b
      |      FROM embeddings x JOIN embeddings y ON x.label = y.label AND x.vec_id < y.vec_id),
      |dots AS (SELECT label, v1, v2, SUM(CAST(a AS DOUBLE)*CAST(b AS DOUBLE)) AS dot FROM z GROUP BY 1, 2, 3)
      |SELECT dots.label, v1, v2,
      |  ROUND(dot/(sqrt(nx.nsq)*sqrt(ny.nsq)), 6) AS cosine
      |FROM dots JOIN n nx ON v1 = nx.vec_id JOIN n ny ON v2 = ny.vec_id
      |WHERE dot/(sqrt(nx.nsq)*sqrt(ny.nsq)) >= 0.4
      |ORDER BY dots.label, v1, v2""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    labelPairsAbove(Tables.embeddings(s, dir), 0.4)
      .select(col("label"), col("v1"), col("v2"), r6(col("cos_raw")).as("cosine"))
      .orderBy(col("label"), col("v1"), col("v2"))
  }

  /** SemDeDup-shaped semantic dedup (Abbas et al. 2023, arXiv
    * 2303.09540): embedding-cosine near-dup pairs inside each
    * coarse-quantizer bucket (the label partition), closed
    * transitively with [[DedupGraph.connectedComponents]], each
    * cluster keeping one canonical member (min vec_id — the same
    * keeper rule as `text_dedup_clusters`, so "semantically dedup
    * the corpus" is a single `filter(is_keeper)`). Completes the
    * dedup family's fifth axis: exact, shingle-Jaccard, MinHash-LSH,
    * SimHash, and now embedding-cosine.
    *
    * Scale shape: candidate pairs never leave a label bucket (an
    * equi-join, pruned exactly like the IVF probe), the CC loop
    * shuffles only the two-long label frame per round (O(log d)
    * rounds, pinned in ScaleTechniquesSpec), and the label join back
    * to `embeddings` is hint-free — the cluster frame is
    * corpus-proportional in the worst case, so broadcast is left to
    * stats/AQE. Oracle closes the identical pair graph with a
    * recursive CTE. Threshold 0.35 keeps nontrivial transitive
    * structure at every SF (14/25/262 components, clusters up to 7
    * members) without the long percolation chains a looser cut
    * creates on near-random embeddings (0.3 strings 10% of the
    * corpus into diameter-100+ chains — 16 CC rounds for structure
    * that is threshold noise, not duplication); margin to the
    * nearest pair ≥ 5.4e-5, ~10 orders above double summation
    * noise. */
  val semanticDedup: Q = Q("sim_dedup_semantic",
    """WITH RECURSIVE
      |n AS (SELECT vec_id, label, SUM(CAST(a AS DOUBLE)*CAST(a AS DOUBLE)) AS nsq
      |      FROM (SELECT vec_id, label, unnest(embedding) AS a FROM embeddings) GROUP BY 1, 2),
      |z AS (SELECT x.label AS label, x.vec_id AS v1, y.vec_id AS v2,
      |             unnest(x.embedding) AS a, unnest(y.embedding) AS b
      |      FROM embeddings x JOIN embeddings y ON x.label = y.label AND x.vec_id < y.vec_id),
      |dots AS (SELECT label, v1, v2, SUM(CAST(a AS DOUBLE)*CAST(b AS DOUBLE)) AS dot FROM z GROUP BY 1, 2, 3),
      |pairs AS (SELECT v1, v2 FROM dots JOIN n nx ON v1 = nx.vec_id JOIN n ny ON v2 = ny.vec_id
      |          WHERE dot/(sqrt(nx.nsq)*sqrt(ny.nsq)) >= 0.35),
      |edges AS (SELECT v1 AS src, v2 AS dst FROM pairs UNION ALL SELECT v2, v1 FROM pairs),
      |reach AS (
      |  SELECT src AS v, src AS lbl FROM edges
      |  UNION
      |  SELECT e.dst AS v, r.lbl FROM reach r JOIN edges e ON e.src = r.v),
      |comp AS (SELECT v AS vec_id, MIN(lbl) AS cluster_id FROM reach GROUP BY 1)
      |SELECT c.vec_id, e.label, c.cluster_id, s.sz AS cluster_size,
      |       (c.vec_id = c.cluster_id) AS is_keeper
      |FROM comp c JOIN embeddings e USING (vec_id)
      |JOIN (SELECT cluster_id, COUNT(*) AS sz FROM comp GROUP BY 1) s USING (cluster_id)
      |ORDER BY c.vec_id""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    val pairs = labelPairsAbove(emb, 0.35)
      .select(col("v1").as("d1"), col("v2").as("d2"))
    val cc = DedupGraph.connectedComponents(pairs)
    val sz = Window.partitionBy(col("cluster_id"))
    cc.select(col("v").as("vec_id"), col("lbl").as("cluster_id"))
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .withColumn("cluster_size", count(lit(1)).over(sz))
      .withColumn("is_keeper", col("vec_id") === col("cluster_id"))
      .select(col("vec_id"), col("label"), col("cluster_id"),
        col("cluster_size"), col("is_keeper"))
      .orderBy(col("vec_id"))
  }

  /** SEMANTIC train/val LEAKAGE AUDIT — the embedding axis of the
    * leakage family (`text_split_leakage` = shingle-Jaccard,
    * `mm_split_leakage` = any-modality dedup pairs, this = cosine):
    * under the standard content-hash split (md5 bucket on the vector
    * id, val = top 10%), report every VAL vector whose embedding has
    * a TRAIN near-neighbor at cosine ≥ 0.35 — the contamination
    * n-gram decontamination cannot see (a paraphrase shares no
    * shingles but lands on the same embedding). Output per leaked
    * val vector: train-neighbor count, the strongest similarity, and
    * the smallest offending train partner — the actionable drop/
    * review list.
    *
    * Scale shape: candidates ride [[labelPairsAbove]]'s
    * coarse-quantizer prune (equi-join on label, never all-pairs —
    * the SemDeDup candidate rule), then two id-keyed equi-joins
    * against the corpus-scaled split frame (no broadcast hint) and
    * one group on the val id. Threshold 0.35 reuses
    * [[semanticDedup]]'s documented margin (nearest pair ≥ 5.4e-5
    * from the cut — ~10 orders above double summation noise), so
    * engine and oracle agree on the pair set exactly; the oracle
    * replays split, candidates, and the report in full. */
  val splitLeakage: Q = Q("sim_split_leakage",
    """WITH n AS (SELECT vec_id, label, SUM(CAST(a AS DOUBLE)*CAST(a AS DOUBLE)) AS nsq
      |           FROM (SELECT vec_id, label, unnest(embedding) AS a FROM embeddings) GROUP BY 1, 2),
      |z AS (SELECT x.label AS label, x.vec_id AS v1, y.vec_id AS v2,
      |             unnest(x.embedding) AS a, unnest(y.embedding) AS b
      |      FROM embeddings x JOIN embeddings y ON x.label = y.label AND x.vec_id < y.vec_id),
      |dots AS (SELECT label, v1, v2, SUM(CAST(a AS DOUBLE)*CAST(b AS DOUBLE)) AS dot FROM z GROUP BY 1, 2, 3),
      |pr AS (SELECT v1, v2, ROUND(dot/(sqrt(nx.nsq)*sqrt(ny.nsq)), 6) AS cosine
      |       FROM dots JOIN n nx ON v1 = nx.vec_id JOIN n ny ON v2 = ny.vec_id
      |       WHERE dot/(sqrt(nx.nsq)*sqrt(ny.nsq)) >= 0.35),
      |b AS (SELECT vec_id,
      |        CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
      |          AS bucket
      |      FROM embeddings),
      |e AS (SELECT v1 AS v, v2 AS t, cosine FROM pr UNION ALL SELECT v2, v1, cosine FROM pr)
      |SELECT e.v AS vec_id, COUNT(*) AS n_train_neighbors,
      |  MAX(cosine) AS max_cosine, MIN(e.t) AS min_train_partner
      |FROM e JOIN b bv ON bv.vec_id = e.v JOIN b bt ON bt.vec_id = e.t
      |WHERE bv.bucket >= 90 AND bt.bucket < 90
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val bucket = expr(
      "cast(conv(substring(md5(cast(vec_id as string)), 1, 15), 16, 10) as bigint) % 100")
    val b = Tables.embeddings(s, dir).select(col("vec_id"), bucket.as("bucket"))
    val p = labelPairsAbove(Tables.embeddings(s, dir), 0.35)
      .select(col("v1"), col("v2"), r6(col("cos_raw")).as("cosine"))
    val e = p.select(col("v1").as("v"), col("v2").as("t"), col("cosine"))
      .unionByName(p.select(col("v2").as("v"), col("v1").as("t"), col("cosine")))
    e.join(b.filter(col("bucket") >= 90).select(col("vec_id").as("v")), Seq("v"))
      .join(b.filter(col("bucket") < 90).select(col("vec_id").as("t")), Seq("t"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n_train_neighbors"), max(col("cosine")).as("max_cosine"),
        min(col("t")).as("min_train_partner"))
      .select(col("v").as("vec_id"), col("n_train_neighbors"),
        col("max_cosine"), col("min_train_partner"))
      .orderBy(col("vec_id"))
  }

  val all: Seq[Q] = Seq(topKQuery, knnSample, labelTopPairs, embeddingStats,
    labelNearDups, semanticDedup, splitLeakage)
}
