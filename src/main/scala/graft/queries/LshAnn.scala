package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for approximate nearest neighbors over the
  * embedding column — the scale path next to the brute-force kNN in
  * [[Similarity]].
  *
  * sign-bit sketch: bucket(v) = Σᵢ [v·hᵢ > 0]·2ⁱ for nBits fixed
  * hyperplanes hᵢ (seeded, generated once on the driver — a few KB of
  * literals embedded in the plan, broadcast for free). Candidate
  * generation is then an equi-join on the bucket id — hash
  * partitioned, never O(n²). Exact cosine re-ranks inside buckets.
  *
  * Collision probability for vectors at angle θ is (1 − θ/π)^nBits,
  * so nBits trades recall for bucket size; recall against the exact
  * kNN is asserted in ScalaTest on planted duplicate vectors.
  */
object LshAnn {

  val NumBits = 12
  val Seed    = 42L

  /** Deterministic unit-free hyperplanes (Box-Muller over a seeded
    * LCG would do; scala.util.Random(seed) is stable across runs). */
  def hyperplanes(dim: Int = 64, nBits: Int = NumBits, seed: Long = Seed): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
  }

  private def planeCol(p: Array[Double]): Column = array(p.map(lit): _*)

  /** Add the LSH bucket id column. */
  def bucketed(emb: DataFrame, planes: Array[Array[Double]]): DataFrame = {
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(Similarity.dotd(col("embedding"), planeCol(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    emb.withColumn("bucket", bucket)
  }

  /** ANN top-k per vector restricted to same-bucket candidates. */
  def annTopK(emb: DataFrame, k: Int = 3,
              planes: Array[Array[Double]] = hyperplanes()): DataFrame = {
    val b = bucketed(emb.withColumn("nsq", Similarity.normSq(col("embedding"))), planes)
      .select(col("vec_id"), col("embedding"), col("nsq"), col("bucket"))
      .cache()
    val cos = Similarity.cosine(
      Similarity.dotd(col("a.embedding"), col("b.embedding")),
      col("a.nsq"), col("b.nsq"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    b.as("a")
      .join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("c_id"),
        round(cos, 6).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** ANN over the driver corpus — rows-only in the driver harness;
    * recall vs brute force pinned by ScalaTest. */
  val annQuery: Q = Q.noOracle("sim_ann_lsh") { (s, dir) =>
    annTopK(Tables.embeddings(s, dir))
  }

  val all: Seq[Q] = Seq(annQuery)
}
