package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.Column
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
    val emb = Tables.embeddings(s, dir)
    val x = emb.select(col("label"), col("vec_id").as("v1"), col("embedding").as("e1"))
    val y = emb.select(col("label").as("label_y"), col("vec_id").as("v2"),
      col("embedding").as("e2"))
    x.join(y, col("label") === col("label_y") && col("v1") < col("v2"))
      .withColumn("cos_raw", expr("graft_cosine(e1, e2)"))
      .filter(col("cos_raw") >= 0.4)
      .select(col("label"), col("v1"), col("v2"), r6(col("cos_raw")).as("cosine"))
      .orderBy(col("label"), col("v1"), col("v2"))
  }

  val all: Seq[Q] = Seq(topKQuery, knnSample, labelTopPairs, embeddingStats, labelNearDups)
}
