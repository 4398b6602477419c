package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only: count aligned media-caption records whose caption the
  * PRODUCTION quality model drops (proba < 0.5) at each SF — the
  * gated mm-emission certificate is vacuous if the learned gate
  * never cuts an aligned record at a verified scale. */
object MmFlipProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[16]", 16)
    spark.sparkContext.setLogLevel("WARN")
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val model = graft.ml.QualityModel.closedForm(spark, dir)
      val docs = graft.sources.Tables.documents(spark, dir)
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val aligned = graft.multimodal.Multimodal.mmEmitDocsOf(docs, emb)
      val proba = graft.ml.QualityModel.scoreClosedForm(
        docs.select(col("doc_id"), split(col("text"), " ").as("toks")), model)
      val j = aligned.join(proba, Seq("doc_id")).cache()
      val n = j.count()
      val dropped = j.filter(col("proba") < 0.5).count()
      val shards = j.filter(col("proba") < 0.5).select(col("shard")).distinct().count()
      println(s"MMFLIPS $dir aligned=$n model_dropped=$dropped drop_shards=$shards/4")
      j.unpersist()
    }
    spark.stop()
  }
}
