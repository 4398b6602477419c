package graft.dev

import graft.GraftSession
import graft.queries.{IvfAnn, LshAnn, PqAnn}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prints raw recall@3 of each ANN tier vs exact kNN per sf dir —
  * the measurement behind the certificate thresholds in
  * [[graft.queries.AnnCert]]. */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val emb = Tables.embeddings(spark, dir)
      graft.functions.GraftFunctions.register(spark)
      val queries = emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
      val exact = emb.join(broadcast(queries), col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("c_id"),
          round(expr("graft_cosine(embedding, qe)"), 6).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("c_id")).cache()
      val nExact = exact.count()
      def recall(name: String, ann: DataFrame): Unit = {
        val hits = ann.select(col("q_id"), col("c_id")).join(exact, Seq("q_id", "c_id")).count()
        println(f"[recall] $dir $name%-8s ${hits.toDouble / nExact}%.4f ($hits/$nExact)")
      }
      recall("ivf@16/8", IvfAnn.annTopK(emb, nProbe = 8))
      recall("ivfpq@16/8", PqAnn.annTopK(emb, nProbe = 8))
      recall("lsh", LshAnn.annTopK(emb).filter(col("q_id") < 50))
      exact.unpersist()
    }
    spark.stop()
  }
}
