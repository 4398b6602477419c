package graft.dev

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._

/** Dev-only: print the quality-model cert frame + the raw LR AUC. */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    val data = graft.ml.QualityModel.labeledDocs(spark, sfDir).cache()
    val tr = data.filter(col("bucket") < 75)
    val te = data.filter(col("bucket") >= 75)
    val pipe = new Pipeline().setStages(Array(
      new HashingTF().setInputCol("w").setOutputCol("features")
        .setNumFeatures(graft.ml.QualityModel.NumFeatures),
      new LogisticRegression().setMaxIter(100).setLabelCol("label")))
    val model = pipe.fit(tr.coalesce(1))
    val scored = model.transform(te)
      .withColumn("proba", vector_to_array(col("probability")).getItem(1))
    def rankAuc(df: org.apache.spark.sql.DataFrame, score: String): Double =
      graft.ml.MlCert.rankAuc(df, score)
    println(f"LR_AUC ${rankAuc(scored, "proba")}%.4f BAYES_AUC ${rankAuc(te, "latent")}%.4f")
    spark.stop()
  }
}
