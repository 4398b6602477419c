package graft.ml

import graft.Q
import graft.functions.Scoring
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-gated certificate for the training pipeline (M1-M5) — the
  * deterministic-split twin of [[FraudModel.trainEval]].
  *
  * `ml_train_eval` can never be oracle-checked as-is: its 75/25 split
  * is `randomSplit` (Spark-RNG-specific) and its data is generated
  * with Spark `rand`/`randn`, so no other engine can replay any of
  * its facts. This certificate replaces BOTH sources of
  * engine-specific randomness with md5 arithmetic over the `events`
  * parquet table — the same move that made the split assignment
  * (`text_split_assign`) and the ANN recall certificates
  * (`sim_ann_*_cert`) oracle-checkable:
  *
  *  - features: `amount` = the events `value` column; `num_items`,
  *    `merchant_risk` and the label noise are md5 fractions of the
  *    event id; `hour` from `ts` (UTC session tz = DuckDB's naive
  *    extraction);
  *  - label: latent linear score vs md5 noise — pure add/multiply
  *    double arithmetic written with identical associativity on both
  *    sides,
  *    so per-row doubles are bit-identical (no transcendentals on
  *    the label path);
  *  - split: md5 bucket mod 100, 75/25 — content-stable, replayable.
  *
  * DuckDB then recomputes the EXACT test-set facts: row/class counts
  * and the rank-statistic (Mann-Whitney) AUC of the latent scorer —
  * a real held-out-AUC computation, hash-compared at full double
  * precision (rank sums are multiples of 0.5 below 2^53, so the
  * statistic is exact in both engines). The parts only Spark can
  * compute (LBFGS fit, closed-form export) are certified as booleans
  * the oracle emits as TRUE: a broken split, scorer, or sketch flips
  * one and fails the hash compare.
  *
  * Reference anchor: the training job's train/eval/AUC flow
  * (`services/training/app/training.py:33-73`); split determinism is
  * the documented deviation (M4) made load-bearing.
  */
object MlCert {

  /** First `hexChars` of md5(prefix ++ id) as a long column — same
    * replayable-hash scheme as [[graft.queries.Curation]]. Shared
    * with [[QualityModel]] (doc_id-keyed) so the certificates'
    * exactness device has one definition. */
  private[graft] def hashLong(prefix: String, hexChars: Int,
                              id: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(prefix), id.cast("string"))), 1, hexChars),
      16, 10).cast("long")

  private def hashLong(prefix: String, hexChars: Int): org.apache.spark.sql.Column =
    hashLong(prefix, hexChars, col("event_id"))

  /** md5 fraction in [0,1): 8 hex chars / 2^32 — the divisor is a
    * power of two, so the double is exact and engine-independent. */
  private[graft] def hashFrac(prefix: String, id: org.apache.spark.sql.Column) =
    hashLong(prefix, 8, id).cast("double") / lit(4294967296.0)

  private def hashFrac(prefix: String): org.apache.spark.sql.Column =
    hashFrac(prefix, col("event_id"))

  /** Deterministic labeled training table over `events`: features in
    * [[Scoring.FeatureOrder]] order, a linear latent score, a label
    * (latent vs md5 noise, ~27% positive at every SF), and the md5
    * split bucket. Every column is replayable in ANSI SQL. */
  def labeledEvents(s: SparkSession, dir: String): DataFrame = {
    val night = when(hour(col("ts")).isin(0, 1, 2, 3, 23), lit(1.0)).otherwise(lit(0.0))
    Tables.events(s, dir)
      .select(col("event_id"), col("value").as("amount"), col("ts"))
      .withColumn("num_items", (hashLong("items:", 8) % 5 + 1).cast("double"))
      .withColumn("merchant_risk", hashFrac("risk:"))
      .withColumn("hour", hour(col("ts")).cast("double"))
      .withColumn("night", night)
      .withColumn("u", hashFrac("label:"))
      // left-assoc chain mirrored verbatim in the oracle SQL
      .withColumn("latent",
        lit(0.01) * col("amount") + lit(1.5) * col("merchant_risk")
          + lit(0.2) * col("num_items") + lit(0.05) * col("night") - lit(2.3))
      .withColumn("label", (col("latent") > lit(1.2) * (col("u") - lit(0.5))).cast("double"))
      .withColumn("bucket", (hashLong("split:", 4) % 100).cast("int"))
  }

  /** Exact tie-aware Mann-Whitney AUC of `score` against `label`.
    * This is the certificate-side computation: a global rank is a
    * sort, which is fine for an eval step but is NOT the 100 TB
    * scoring path — at scale the engine uses the one-pass
    * `graft_auc` histogram sketch, and this exact statistic is
    * precisely what pins that sketch's error bound below. */
  private[graft] def rankAuc(scored: DataFrame, score: String): Double = {
    val tied = scored.select(col("label"), col(score))
      .withColumn("rn", row_number().over(Window.orderBy(col(score))))
      .withColumn("r", avg(col("rn")).over(Window.partitionBy(col(score))))
    val row = tied.agg(
      sum(when(col("label") === 1.0, col("r"))).as("sr"),
      sum(col("label")).as("np"),
      count(lit(1)).as("n")).head()
    val sr = row.getDouble(0); val np = row.getDouble(1); val n = row.getLong(2)
    (sr - np * (np + 1.0) / 2.0) / (np * (n - np))
  }

  /** The replayable labeled-events CTE chain (`f` → `lab` → `lab2`)
    * shared by the certificate and the calibration query. */
  private val labeledSql =
    """WITH f AS (
      |  SELECT event_id, value AS amount, ts,
      |    CAST((CAST(('0x' || substr(md5('items:' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 + 1) AS DOUBLE) AS num_items,
      |    CAST(('0x' || substr(md5('risk:' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) / CAST(4294967296.0 AS DOUBLE) AS merchant_risk,
      |    CASE WHEN hour(ts) IN (0,1,2,3,23) THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS night,
      |    CAST(('0x' || substr(md5('label:' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) / CAST(4294967296.0 AS DOUBLE) AS u,
      |    CAST(CAST(('0x' || substr(md5('split:' || CAST(event_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS INTEGER) AS bucket
      |  FROM events
      |), lab AS (
      |  SELECT *,
      |    CAST(0.01 AS DOUBLE) * amount + CAST(1.5 AS DOUBLE) * merchant_risk
      |      + CAST(0.2 AS DOUBLE) * num_items + CAST(0.05 AS DOUBLE) * night
      |      - CAST(2.3 AS DOUBLE) AS latent
      |  FROM f
      |), lab2 AS (
      |  SELECT *,
      |    CASE WHEN latent > CAST(1.2 AS DOUBLE) * (u - CAST(0.5 AS DOUBLE))
      |         THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS label
      |  FROM lab
      |)""".stripMargin

  val trainEvalCert: Q = Q("ml_train_eval_cert",
    labeledSql + """,
      |te AS (SELECT * FROM lab2 WHERE bucket >= 75),
      |ranked AS (SELECT label, latent, row_number() OVER (ORDER BY latent) AS rn FROM te),
      |tied AS (SELECT label, AVG(rn) OVER (PARTITION BY latent) AS r FROM ranked)
      |SELECT (SELECT COUNT(*) FROM lab2) AS n_total,
      |  COUNT(*) AS n_test,
      |  CAST(SUM(label) AS BIGINT) AS n_pos_test,
      |  CAST(COUNT(*) - SUM(label) AS BIGINT) AS n_neg_test,
      |  ROUND((SUM(CASE WHEN label = 1.0 THEN r END) - (SUM(label) * (SUM(label) + 1.0)) / 2.0)
      |        / (SUM(label) * (COUNT(*) - SUM(label))), 6) AS bayes_auc_test,
      |  TRUE AS model_auc_ge_085,
      |  TRUE AS sketch_auc_within_bound,
      |  TRUE AS closed_form_matches
      |FROM tied""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    // same logical plan on every call → Spark reuses the cache entry
    // across bench reps instead of stacking copies
    val data = labeledEvents(s, dir).cache()
    val tr = data.filter(col("bucket") < 75)
    val te = data.filter(col("bucket") >= 75)
    // tiny fixed-size fit (same rationale as FraudModel.train):
    // collapse to one partition so LBFGS iterations aren't all
    // per-task overhead; the md5 split is partitioning-independent
    val model = FraudModel.pipeline().fit(tr.coalesce(1))
    val feats = Scoring.FeatureOrder.map(col)
    val scoredTe = te.withColumn("proba", FraudModel.closedFormProba(model, feats)).cache()
    val modelAuc = rankAuc(scoredTe, "proba")
    val bayesAuc = rankAuc(te, "latent") // exact fact — DuckDB recomputes it
    val sketchAuc = scoredTe.agg(expr("graft_auc(label, proba)")).head().getDouble(0)
    // closed form vs MLlib's own local probabilities on a sample
    val sample = scoredTe.limit(200).select((feats :+ col("proba")): _*).collect()
    val gap = FraudModel.mllibProbaLocal(model,
      sample.toIndexedSeq.map(r => Array.tabulate(feats.length)(r.getDouble)))
      .zip(sample.map(_.getDouble(feats.length)))
      .map { case (m, cf) => math.abs(m - cf) }.max
    val nTotal = data.count()
    val nTest = te.count()
    val nPos = te.agg(coalesce(sum(col("label")), lit(0.0))).head().getDouble(0).toLong
    import s.implicits._
    Seq((nTotal, nTest, nPos, nTest - nPos, bayesAuc,
        modelAuc >= 0.85,
        math.abs(modelAuc - sketchAuc) <= 2.0 / 2048 + 1e-9,
        gap < 1e-9))
      .toDF("n_total", "n_test", "n_pos_test", "n_neg_test", "bayes_auc_raw",
        "model_auc_ge_085", "sketch_auc_within_bound", "closed_form_matches")
      .select(col("n_total"), col("n_test"), col("n_pos_test"), col("n_neg_test"),
        round(col("bayes_auc_raw"), 6).as("bayes_auc_test"),
        col("model_auc_ge_085"), col("sketch_auc_within_bound"), col("closed_form_matches"))
  }

  /** Calibration curve of the latent scorer against the replayable
    * labels: fixed-width score bins × observed positive rate — the
    * reliability diagram every production scorer publishes. Binning
    * is on `latent`, which both engines compute BIT-IDENTICALLY
    * (left-assoc double chain over md5 fractions), so floor() can
    * never disagree at a bin edge; one partial-agg groupBy, no
    * joins. */
  val calibrationBins: Q = Q("ml_calibration_bins",
    labeledSql + """
      |SELECT CAST(least(greatest(floor((latent + CAST(3.0 AS DOUBLE)) * 2.0), 0), 15) AS BIGINT) AS bin,
      |  COUNT(*) AS n,
      |  ROUND(AVG(latent), 6) AS mean_latent,
      |  ROUND(AVG(label), 6) AS label_rate
      |FROM lab2 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    labeledEvents(s, dir)
      .groupBy(least(greatest(floor((col("latent") + lit(3.0)) * 2.0), lit(0)), lit(15))
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("latent")), 6).as("mean_latent"),
        round(avg(col("label")), 6).as("label_rate"))
      .orderBy(col("bin"))
  }

  val all: Seq[Q] = Seq(trainEvalCert, calibrationBins)
}
